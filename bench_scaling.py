"""Scaling benchmark: rays/s at 1/2/4/8 devices (BASELINE: >=85%
efficiency 1 chip -> N).

Runs the data-parallel sharded renderer (rays over 'data', scene
replicated) at increasing device counts and reports throughput plus
parallel efficiency vs the single-device baseline.  One JSON line per
device count on stdout.

On real multi-chip TPU hardware the efficiency number is the BASELINE
target; on the local 8-way VIRTUAL CPU mesh (the only thing available in
this sandbox — the tunnel exposes one real chip) the devices share one
host's cores, so the numbers validate the sharding wiring and measure
host-parallel speedup, not ICI scaling.  The harness is identical either
way: on a pod slice, run `python bench_scaling.py` under
`jax.distributed` (see __graft_entry__.dryrun_multihost).

Usage: python bench_scaling.py [n_tris] [--cpu]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_tris = int(args[0]) if args else 20_000
    if "--cpu" in sys.argv or os.environ.get("JAX_PLATFORMS") == "cpu":
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from prismarine_core_tpu.models.camera import Camera
    from prismarine_core_tpu.models.procedural import make_hall_scene
    from prismarine_core_tpu.ops.sampling import make_sample_arrays
    from prismarine_core_tpu.parallel.mesh import (
        make_mesh, make_sharded_renderer, shard_scene)
    from prismarine_core_tpu.utils.config import RenderConfig

    devs = jax.devices()
    on_cpu = devs[0].platform == "cpu"
    print(f"[scaling] devices={len(devs)} ({devs[0].platform}); "
          f"{'VIRTUAL host mesh - wiring validation' if on_cpu else 'real chips'}",
          file=sys.stderr)

    # CPU virtual mesh: keep the workload small and the intersector XLA
    # (interpret-mode Pallas would swamp the measurement)
    if on_cpu:
        cfg = RenderConfig(width=256, height=192, spp=1, max_bounces=2,
                           intersector="bvh")
    else:
        cfg = RenderConfig(width=1280, height=720, spp=1, max_bounces=4,
                           intersector="pallas", pairs_per_step=8,
                           stale_round_masks=True)
    scene = make_hall_scene(target_tris=n_tris)
    camera = Camera.look_at(eye=(-10.0, 2.2, 0.0), target=(6.0, 1.6, 0.0),
                            fov_y_deg=60.0)
    cam_s, bounce_s = make_sample_arrays(
        jax.random.key(0), cfg.n_rays, cfg.max_bounces)

    # HONEST ray accounting (same policy as bench.py): live lanes
    # entering each closest-hit query + issued NEE shadow lanes.  The
    # count is a property of (scene, samples), identical at every
    # device count — measure it once on one device.
    import numpy as np

    from prismarine_core_tpu.render.integrator import render_with_samples
    _, stats = render_with_samples(scene, camera, cfg, cam_s, bounce_s,
                                   with_stats=True)
    stats = np.asarray(stats)
    rays = int(stats[:, 0].sum() + stats[:, 4].sum())
    live_frac = rays / (cfg.n_rays * cfg.max_bounces * 2)
    print(f"[scaling] live rays/frame: {rays:,} "
          f"({live_frac:.0%} of nominal)", file=sys.stderr)

    counts = [n for n in (1, 2, 4, 8) if n <= len(devs)]
    base = None
    for n in counts:
        mesh = make_mesh(n, model_parallel=1)
        sc = shard_scene(scene, mesh)
        renderer = make_sharded_renderer(mesh, cfg)
        cs = jax.device_put(cam_s)
        bs = jax.device_put(bounce_s)
        img = renderer(sc, camera, cs, bs)
        float(img.mean())                       # sync (compile + run)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            img = renderer(sc, camera, cs, bs)
            float(img.mean())
        dt = (time.perf_counter() - t0) / reps
        rps = rays / dt
        if base is None:
            base = rps
        eff = rps / (base * n)
        print(json.dumps({
            "metric": "scaling_rays_per_second",
            "devices": n,
            "value": rps,
            "unit": "rays/s",
            "efficiency_vs_linear": eff,
            "platform": devs[0].platform,
        }))
        print(f"[scaling] {n} dev: {dt*1e3:.1f} ms/frame "
              f"-> {rps/1e6:.2f} Mrays/s, efficiency {eff:.0%} "
              f"(target >= 85% on real chips)", file=sys.stderr)


if __name__ == "__main__":
    main()
