"""Collective-volume + overlap evidence for the sharded train step
(VERDICT r4 item 7; BASELINE north star: "gradient all-reduce over ICI
overlapped with the backward shading pass").

Two parts:

A. VIRTUAL 8-DEVICE MESH (cpu): compile the production train step
   (pallas_sharded, mp=2, BVH rebuilt inside the loss) and inventory
   the compiled HLO's collectives — op counts by kind and the
   gradient-all-reduce byte volume.  This is the collective PLACEMENT
   evidence: what crosses the mesh, and where.

B. REAL CHIP (mesh 1x1): time forward loss vs full value_and_grad step
   (forced readbacks) to get the backward-pass wall-clock that an
   all-reduce would have to hide under, then an ICI roofline: ring
   all-reduce moves 2(n-1)/n x grad bytes per link; at v5e-class ICI
   (~4.5e10 B/s per direction, a conservative figure) that time is
   compared against the measured backward time.

Run part A on CPU (default), part B with the TPU visible.
Usage: python examples/r5_overlap.py [--cpu-only|--tpu-only]
"""

from __future__ import annotations

import re
import sys
import time

ICI_BYTES_PER_S = 4.5e10    # conservative per-direction v5e-class ICI


def part_a_cpu():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from prismarine_core_tpu.models.camera import Camera
    from prismarine_core_tpu.models.procedural import make_hall_scene
    from prismarine_core_tpu.ops.sampling import make_sample_arrays
    from prismarine_core_tpu.parallel.mesh import (
        init_params, make_mesh, make_train_step)
    from prismarine_core_tpu.parallel.shard_intersect import (
        distribute_scene)
    from prismarine_core_tpu.utils.config import RenderConfig

    mesh = make_mesh(8, model_parallel=2)
    cfg = RenderConfig(width=128, height=128, spp=1, max_bounces=2,
                       intersector="pallas_sharded", mesh=mesh,
                       bvh_leaf_size=4)
    scene = distribute_scene(make_hall_scene(target_tris=30_000),
                             mesh, shard_soup=False)
    cam = Camera.look_at(eye=(-10.0, 2.2, 0.0), target=(6.0, 1.6, 0.0),
                         fov_y_deg=60.0)
    cam_s, bounce_s = make_sample_arrays(jax.random.key(0), cfg.n_rays,
                                         cfg.max_bounces)
    step = make_train_step(mesh, cfg)
    params = init_params(scene)
    target = jnp.zeros((cfg.height, cfg.width, 3))
    compiled = step.lower(params, scene, cam, cam_s, bounce_s,
                          target).compile()
    hlo = compiled.as_text()

    counts = {}
    for kind in ("all-reduce", "all-gather", "reduce-scatter",
                 "collective-permute", "all-to-all"):
        # count op instances (both sync and -start async forms)
        n = len(re.findall(rf"= \S+ {kind}(?:-start)?\(", hlo))
        counts[kind] = n
    grad_bytes = sum(p.size * 4 for p in params.values())
    print(f"[overlap A] virtual mesh {dict(mesh.shape)}; compiled HLO "
          f"collective inventory: {counts}")
    print(f"[overlap A] trainable params {grad_bytes/1e6:.2f} MB -> "
          f"ring all-reduce moves 2(n-1)/n x "
          f"{grad_bytes/1e6:.2f} MB/link")
    dp = mesh.shape["data"]
    ar = 2 * (dp - 1) / dp * grad_bytes / ICI_BYTES_PER_S
    print(f"[overlap A] ICI roofline: gradient all-reduce ~"
          f"{ar*1e6:.0f} us at {ICI_BYTES_PER_S/1e9:.0f} GB/s/dir "
          f"(dp={dp})")


def part_b_tpu():
    import jax
    import jax.numpy as jnp

    from prismarine_core_tpu.models.camera import Camera
    from prismarine_core_tpu.models.procedural import make_hall_scene
    from prismarine_core_tpu.ops.sampling import make_sample_arrays
    from prismarine_core_tpu.parallel.mesh import (
        init_params, make_mesh, make_train_step)
    from prismarine_core_tpu.parallel.shard_intersect import (
        distribute_scene)
    from prismarine_core_tpu.utils.config import RenderConfig

    print(f"[overlap B] devices={jax.devices()}", flush=True)
    mesh = make_mesh(1, model_parallel=1)
    cfg = RenderConfig(width=512, height=512, spp=1, max_bounces=2,
                       intersector="pallas_sharded", mesh=mesh,
                       bvh_leaf_size=4, pairs_per_step=8,
                       stale_round_masks=True, anyhit_strategy="single")
    scene = distribute_scene(make_hall_scene(target_tris=100_000),
                             mesh, shard_soup=False)
    cam = Camera.look_at(eye=(-10.0, 2.2, 0.0), target=(6.0, 1.6, 0.0),
                         fov_y_deg=60.0)
    cam_s, bounce_s = make_sample_arrays(jax.random.key(0), cfg.n_rays,
                                         cfg.max_bounces)
    step = make_train_step(mesh, cfg)
    params = init_params(scene)
    target = jnp.zeros((cfg.height, cfg.width, 3))

    from prismarine_core_tpu.parallel.mesh import make_sharded_renderer
    fwd = make_sharded_renderer(mesh, cfg)

    def force(x):
        return float(jnp.asarray(
            jax.tree_util.tree_leaves(x)[0]).ravel()[0])

    def timeit(fn, *args, n=3, label=""):
        out = fn(*args)
        force(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
            force(out)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"[overlap B] {label:<34s} {dt:9.1f} ms", flush=True)
        return dt

    f_ms = timeit(fwd, scene, cam, cam_s, bounce_s,
                  label="forward render (512^2, 2 bounces)")
    s_ms = timeit(step, params, scene, cam, cam_s, bounce_s, target,
                  label="train step (fwd+bwd+update)")
    grad_bytes = sum(p.size * 4 for p in params.values())
    for dp in (4, 8):
        ar = 2 * (dp - 1) / dp * grad_bytes / ICI_BYTES_PER_S * 1e3
        bwd = s_ms - f_ms
        print(f"[overlap B] dp={dp}: grad all-reduce roofline "
              f"{ar:.3f} ms vs backward ~{bwd:.0f} ms -> "
              f"{ar/max(bwd,1e-9)*100:.3f}% of the window it can hide "
              f"under", flush=True)


if __name__ == "__main__":
    if "--tpu-only" not in sys.argv:
        part_a_cpu()
    if "--cpu-only" not in sys.argv:
        part_b_tpu()
