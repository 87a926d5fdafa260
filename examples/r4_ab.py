"""Round-4 A/B: frame-level timing of the new cull/sort/compaction paths.

Runs the BENCH config (hall 137k tris, 720p, 4 bounces, HDR sky,
coherent sampling) across pipeline variants in ONE process (one tunnel
session); prints ms/frame with forced readbacks, bench-style warmup.

Usage: python examples/r4_ab.py [n_tris] [--quick] [--set NAME ...]
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import numpy as np

VARIANTS = {
    # round-3 production path (control; also gains the fused row-gather
    # ray-matrix build, so compare against BENCH_r03's absolute 2006ms)
    "r3-xla-full": dict(cull_impl="xla", sort_mode="full"),
    # round-4 defaults: pallas cull, per-ray sb recull, per-round masks
    "r4-default": dict(),
    "r4-stale-anyhit": dict(stale_round_masks=True),
    "r4-recull-kernel": dict(recull="kernel"),
    "r4-group-sort": dict(sort_mode="group"),
    "r4-spp4": dict(spp=4),
    "r4-spp4-stale": dict(spp=4, stale_round_masks=True),
    # pairs-per-step fixed-cost amortization (stale anyhit masks won
    # the earlier frame A/B narrowly; keep them on for these)
    "r4-pps2": dict(stale_round_masks=True, pairs_per_step=2),
    "r4-pps4": dict(stale_round_masks=True, pairs_per_step=4),
    "r4-pps8": dict(stale_round_masks=True, pairs_per_step=8),
    # strategy probe: skip top_k/two_round entirely for closest
    "r4-closest-single": dict(stale_round_masks=True,
                              closest_strategy="single"),
    "r4-pps4-single": dict(stale_round_masks=True, pairs_per_step=4,
                           closest_strategy="single"),
    "r4-pps16": dict(stale_round_masks=True, pairs_per_step=16),
    "r4-pps8-refresh": dict(pairs_per_step=8),
    # frame decomposition at the pps8 config
    "decomp-noshadow": dict(stale_round_masks=True, pairs_per_step=8,
                            direct_light=False),
    "decomp-b1": dict(stale_round_masks=True, pairs_per_step=8,
                      max_bounces=1),
    "decomp-b2": dict(stale_round_masks=True, pairs_per_step=8,
                      max_bounces=2),
    # strategy/block sweeps at the pps8 config
    "r4-pps8-rounds16": dict(stale_round_masks=True, pairs_per_step=8,
                             closest_strategy="rounds", closest_k=16),
    "r4-pps8-rounds8": dict(stale_round_masks=True, pairs_per_step=8,
                            closest_strategy="rounds", closest_k=8),
    "r4-pps8-block32": dict(stale_round_masks=True, pairs_per_step=8,
                            _block=(32, 32)),
    "r4-pps8-block64": dict(stale_round_masks=True, pairs_per_step=8,
                            _block=(64, 64)),
    # round-1 threshold selection + kernel-window sweep on the b64 base
    "b64-near25": dict(stale_round_masks=True, pairs_per_step=8,
                       _block=(64, 64), near_frac=0.25),
    "b64-near40": dict(stale_round_masks=True, pairs_per_step=8,
                       _block=(64, 64), near_frac=0.4),
    "b64-near60": dict(stale_round_masks=True, pairs_per_step=8,
                       _block=(64, 64), near_frac=0.6),
    "b64-win4096": dict(stale_round_masks=True, pairs_per_step=8,
                        _block=(64, 64), kernel_window=4096),
    "b64-near40-win4096": dict(stale_round_masks=True, pairs_per_step=8,
                               _block=(64, 64), near_frac=0.4,
                               kernel_window=4096),
    "b64-reuse": dict(stale_round_masks=True, pairs_per_step=8,
                      _block=(64, 64), reuse_bounce_order=True),
    "b64-k4": dict(stale_round_masks=True, pairs_per_step=8,
                   _block=(64, 64), closest_k=4),
    "b64-k12": dict(stale_round_masks=True, pairs_per_step=8,
                    _block=(64, 64), closest_k=12),
    "b64-anyk16": dict(stale_round_masks=True, pairs_per_step=8,
                       _block=(64, 64), anyhit_k=16),
    "b64-anyk24": dict(stale_round_masks=True, pairs_per_step=8,
                       _block=(64, 64), anyhit_k=24),
    "b64-anyk32": dict(stale_round_masks=True, pairs_per_step=8,
                       _block=(64, 64), anyhit_k=32),
    "b64-anyk64": dict(stale_round_masks=True, pairs_per_step=8,
                       _block=(64, 64), anyhit_k=64),
    "b64-any2r": dict(stale_round_masks=True, pairs_per_step=8,
                      _block=(64, 64), anyhit_strategy="two_round",
                      anyhit_k=16),
    "b64-anysingle": dict(stale_round_masks=True, pairs_per_step=8,
                          _block=(64, 64), anyhit_strategy="single"),
    "b128-anysingle": dict(stale_round_masks=True, pairs_per_step=8,
                           _block=(128, 128),
                           anyhit_strategy="single"),
    "b96-anysingle": dict(stale_round_masks=True, pairs_per_step=8,
                          _block=(96, 96), anyhit_strategy="single"),
    "b64-single-k12": dict(stale_round_masks=True, pairs_per_step=8,
                           _block=(64, 64), anyhit_strategy="single",
                           closest_k=12),
    # decomposition at the PRODUCTION config
    "prod-noshadow": dict(stale_round_masks=True, pairs_per_step=8,
                          _block=(64, 64), anyhit_strategy="single",
                          direct_light=False),
    "prod-b1": dict(stale_round_masks=True, pairs_per_step=8,
                    _block=(64, 64), anyhit_strategy="single",
                    max_bounces=1),
    "prod-b2": dict(stale_round_masks=True, pairs_per_step=8,
                    _block=(64, 64), anyhit_strategy="single",
                    max_bounces=2),
}


def run_variant(name, scene, camera, cfg0, n_frames=3):
    import jax as _jax

    from prismarine_core_tpu.ops.sampling import make_coherent_sample_arrays
    from prismarine_core_tpu.render.integrator import render_with_samples
    opts = dict(VARIANTS[name])
    block = opts.pop("_block", (16, 16))
    cfg = dataclasses.replace(cfg0, **opts)
    cam_s, bounce_s = make_coherent_sample_arrays(
        _jax.random.key(0), cfg, block=block)
    t0 = time.perf_counter()
    img, stats = render_with_samples(scene, camera, cfg, cam_s, bounce_s,
                                     with_stats=True)
    mean = float(img.mean())
    compile_s = time.perf_counter() - t0
    stats = np.asarray(stats)
    rays = int(stats[:, 0].sum() + stats[:, 4].sum())

    img = render_with_samples(scene, camera, cfg, cam_s, bounce_s)
    float(img.mean())
    t0 = time.perf_counter()
    for _ in range(n_frames):
        img = render_with_samples(scene, camera, cfg, cam_s, bounce_s)
        float(img.mean())
    dt = (time.perf_counter() - t0) / n_frames
    print(f"[r4_ab] {name:24s} {dt*1e3:8.1f} ms/frame  "
          f"{rays/dt/1e6:6.2f} Mrays/s  (mean={mean:.4f}, "
          f"compile {compile_s:.0f}s, {rays:,} live rays)", flush=True)
    return dt


def main():
    from prismarine_core_tpu.models.camera import Camera
    from prismarine_core_tpu.models.procedural import (
        make_hall_scene, make_sky_environment)
    from prismarine_core_tpu.ops.sampling import make_coherent_sample_arrays
    from prismarine_core_tpu.utils.config import RenderConfig

    args = [a for a in sys.argv[1:] if a.isdigit()]
    n_tris = int(args[0]) if args else 100_000
    names = list(VARIANTS)
    if "--set" in sys.argv:
        names = sys.argv[sys.argv.index("--set") + 1:]
    if "--quick" in sys.argv:
        names = ["r3-xla-full", "cull-tn"]

    print(f"[r4_ab] devices={jax.devices()}", flush=True)
    cfg = RenderConfig(width=1280, height=720, spp=1, max_bounces=4,
                       intersector="pallas", bvh_leaf_size=4,
                       coherent_bounce_sampling=True)
    scene = make_hall_scene(target_tris=n_tris)
    scene = dataclasses.replace(
        scene, environment=make_sky_environment(resolution=128))
    scene = jax.device_put(scene)
    camera = Camera.look_at(eye=(-10.0, 2.2, 0.0), target=(6.0, 1.6, 0.0),
                            fov_y_deg=60.0)
    print(f"[r4_ab] scene tris={int(scene.triangles.num_valid())}",
          flush=True)

    for name in names:
        if name not in VARIANTS:
            print(f"[r4_ab] unknown variant {name}", flush=True)
            continue
        run_variant(name, scene, camera, cfg)


if __name__ == "__main__":
    main()
