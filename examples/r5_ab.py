"""Round-5 A/B: two-level cull, identity primary order, strategy
re-sweeps on the cheapened selection stages.

Baseline = the round-4 PRODUCTION config (hall 137k tris, 720p,
4 bounces, coherent 64x64 sampling, pps8, stale anyhit masks, anyhit
"single"): 1,011 ms/frame = 3.19 Mrays/s.  Frame-level ms with forced
readbacks, bench-style warmup, ONE process per tunnel session.

Usage: python examples/r5_ab.py [n_tris] [--set NAME ...]
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import numpy as np

#: the round-4 production base — every variant patches on top of this
BASE = dict(stale_round_masks=True, pairs_per_step=8,
            anyhit_strategy="single")

VARIANTS = {
    # control: must reproduce BENCH_r04's 1,011 ms
    "r4-prod": dict(),
    # two-level cull alone
    "r5-p2": dict(cull_impl="pallas2"),
    # + identity primary order
    "r5-p2-ident": dict(cull_impl="pallas2", primary_identity=True),
    # selection-stage re-sweeps now that cull/refresh stages are cheap
    "r5-p2-k12": dict(cull_impl="pallas2", primary_identity=True,
                      closest_k=12),
    "r5-p2-k16": dict(cull_impl="pallas2", primary_identity=True,
                      closest_k=16),
    "r5-p2-near40": dict(cull_impl="pallas2", primary_identity=True,
                         near_frac=0.4),
    "r5-p2-rounds8": dict(cull_impl="pallas2", primary_identity=True,
                          closest_strategy="rounds", closest_k=8,
                          stale_round_masks=False),
    "r5-p2-rounds16": dict(cull_impl="pallas2", primary_identity=True,
                           closest_strategy="rounds", closest_k=16,
                           stale_round_masks=False),
    "r5-p2-rounds8-stale": dict(cull_impl="pallas2",
                                primary_identity=True,
                                closest_strategy="rounds",
                                closest_k=8),
    # cull-window / pps sweeps
    "r5-p2-cw8192": dict(cull_impl="pallas2", primary_identity=True,
                         cull_window=8192),
    "r5-p2-cw2048": dict(cull_impl="pallas2", primary_identity=True,
                         cull_window=2048),
    "r5-p2-pps16": dict(cull_impl="pallas2", primary_identity=True,
                        pairs_per_step=16),
    "r5-p2-pps4": dict(cull_impl="pallas2", primary_identity=True,
                       pairs_per_step=4),
    # identity order on the r4 cull (isolates the two effects)
    "r4-ident": dict(primary_identity=True),
    # anyhit back to rounds under p2 (refresh is cheap now)
    "r5-p2-anyrounds": dict(cull_impl="pallas2", primary_identity=True,
                            anyhit_strategy="rounds", anyhit_k=8,
                            stale_round_masks=False),
    # MIXED production candidate: p2 closest (tighter round-2 masks
    # under tightened caps), p1 any-hit (single compaction, no refine)
    "r5-mixed-k16": dict(cull_impl="pallas2", anyhit_cull_impl="pallas",
                         closest_k=16),
    "r5-mixed-k8": dict(cull_impl="pallas2", anyhit_cull_impl="pallas"),
    "r5-mixed-k16-cw8k": dict(cull_impl="pallas2",
                              anyhit_cull_impl="pallas", closest_k=16,
                              cull_window=8192),
    "r5-mixed-k16-w4k": dict(cull_impl="pallas2",
                             anyhit_cull_impl="pallas", closest_k=16,
                             kernel_window=4096),
    # clean p2 sweeps (no identity-order contamination)
    "r5-p2-k16c": dict(cull_impl="pallas2", closest_k=16),
    "r5-p2-k12c": dict(cull_impl="pallas2", closest_k=12),
    "r5-p2-cw8kc": dict(cull_impl="pallas2", cull_window=8192),
    "r5-p2-k16-cw8kc": dict(cull_impl="pallas2", closest_k=16,
                            cull_window=8192),
    "r5-p2-near40c": dict(cull_impl="pallas2", near_frac=0.4),
    "r5-p2-pps16c": dict(cull_impl="pallas2", pairs_per_step=16),
    # current best + the 16x8-pixel-tile primary lane order
    "r5-best": dict(cull_impl="pallas2", closest_k=16,
                    cull_window=8192),
    "r5-best-tile": dict(cull_impl="pallas2", closest_k=16,
                         cull_window=8192, primary_tile_order=True),
    "r5-tile-only": dict(primary_tile_order=True),
    # coherent-block sweep on the r5-best base (r4 swept on its own
    # base and stopped at 64; the equal-time MSE favored bigger blocks)
    "r5-best-b96": dict(cull_impl="pallas2", closest_k=16,
                        cull_window=8192, _block=(96, 96)),
    "r5-best-b128": dict(cull_impl="pallas2", closest_k=16,
                         cull_window=8192, _block=(128, 128)),
    # lane-filling refine kernel (16 pairs/step) with MT pps kept at 8
    "r5-best-cpps16": dict(cull_impl="pallas2", closest_k=16,
                           cull_window=8192, cull_pps=16),
    # ---- round-5 continuation: MXU determinant-form kernel ----
    # control: the committed round-5 production config (984.8 ms)
    "r5-prod": dict(cull_impl="pallas2", closest_k=16,
                    cull_window=8192, cull_pps=16),
    "r6-mxu": dict(cull_impl="pallas2", closest_k=16,
                   cull_window=8192, cull_pps=16, kernel_form="mxu"),
    "r6-mxu-pps4": dict(cull_impl="pallas2", closest_k=16,
                        cull_window=8192, cull_pps=16,
                        pairs_per_step=4, kernel_form="mxu"),
    "r6-mxu-pps16": dict(cull_impl="pallas2", closest_k=16,
                         cull_window=8192, cull_pps=16,
                         pairs_per_step=16, kernel_form="mxu"),
    # two-sub-block-interleaved MT (ILP experiment, r4 item 9)
    "r6-mt2": dict(cull_impl="pallas2", closest_k=16,
                   cull_window=8192, cull_pps=16, kernel_form="mt2"),
    # Russian roulette from bounce 2 / 3 (estimator lever 1)
    "r6-rr2": dict(cull_impl="pallas2", closest_k=16,
                   cull_window=8192, cull_pps=16, rr_start_bounce=2),
    "r6-rr3": dict(cull_impl="pallas2", closest_k=16,
                   cull_window=8192, cull_pps=16, rr_start_bounce=3),
}


def run_variant(name, scene, camera, cfg0, n_frames=3):
    from prismarine_core_tpu.ops.sampling import make_coherent_sample_arrays
    from prismarine_core_tpu.render.integrator import render_with_samples
    opts = {**BASE, **VARIANTS[name]}
    block = opts.pop("_block", (64, 64))
    cfg = dataclasses.replace(cfg0, **opts)
    cam_s, bounce_s = make_coherent_sample_arrays(
        jax.random.key(0), cfg, block=block)
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
    print(f"[r5_ab] {name:24s} {dt*1e3:8.1f} ms/frame  "
          f"{rays/dt/1e6:6.2f} Mrays/s  (mean={mean:.4f}, "
          f"compile {compile_s:.0f}s, {rays:,} live rays)", flush=True)
    return dt


def main():
    from prismarine_core_tpu.models.camera import Camera
    from prismarine_core_tpu.models.procedural import (
        make_hall_scene, make_sky_environment)
    from prismarine_core_tpu.utils.config import RenderConfig

    args = [a for a in sys.argv[1:] if a.isdigit()]
    n_tris = int(args[0]) if args else 100_000
    names = list(VARIANTS)
    if "--set" in sys.argv:
        names = sys.argv[sys.argv.index("--set") + 1:]

    print(f"[r5_ab] devices={jax.devices()}", flush=True)
    cfg = RenderConfig(width=1280, height=720, spp=1, max_bounces=4,
                       intersector="pallas", bvh_leaf_size=4,
                       coherent_bounce_sampling=True)
    textured = "--textured" in sys.argv
    scene = make_hall_scene(target_tris=n_tris, textured=textured,
                            pack_corners="--nopack" not in sys.argv)
    scene = dataclasses.replace(
        scene, environment=make_sky_environment(resolution=128))
    scene = jax.device_put(scene)
    camera = Camera.look_at(eye=(-10.0, 2.2, 0.0), target=(6.0, 1.6, 0.0),
                            fov_y_deg=60.0)
    print(f"[r5_ab] scene tris={int(scene.triangles.num_valid())}",
          flush=True)

    for name in names:
        if name not in VARIANTS:
            print(f"[r5_ab] unknown variant {name}", flush=True)
            continue
        run_variant(name, scene, camera, cfg)


if __name__ == "__main__":
    main()
