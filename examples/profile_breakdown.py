"""Stage-level breakdown of the Pallas packet query + full frame.

Answers VERDICT item 1(a): where do the 3,707 ms/frame go?
Times each stage of `_run_packet_pallas` separately (sort, per-ray cull,
quad build, windowed kernel) on both coherent camera rays and incoherent
bounce-style rays, reports cull statistics (blocks/ray, quads/query), and
times one full frame for cross-checking.

Run on the real TPU: `python examples/profile_breakdown.py [n_tris]`.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from prismarine_core_tpu.accel import packet as pk
from prismarine_core_tpu.models.camera import Camera, generate_rays
from prismarine_core_tpu.models.procedural import make_hall_scene
from prismarine_core_tpu.ops.sampling import make_sample_arrays
from prismarine_core_tpu.render.integrator import render_with_samples
from prismarine_core_tpu.utils.config import INF_DIST, RenderConfig


def timeit(fn, *args, n=3, label=""):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"  {label:<42s} {dt:9.2f} ms")
    return out, dt


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    width, height = 1280, 720
    cfg = RenderConfig(width=width, height=height, spp=1, max_bounces=4,
                       intersector="pallas", bvh_leaf_size=4)
    scene = jax.device_put(make_hall_scene(target_tris=n_tris))
    bvh, ps = scene.bvh, scene.packets
    camera = Camera.look_at(eye=(-10.0, 2.2, 0.0), target=(6.0, 1.6, 0.0),
                            fov_y_deg=60.0)
    cam_s, bounce_s = make_sample_arrays(jax.random.key(0), cfg.n_rays,
                                         cfg.max_bounces)
    print(f"tris={int(scene.triangles.num_valid())} "
          f"bvh_nodes={bvh.n_nodes} blocks={ps.n_blocks} "
          f"rays={cfg.n_rays}")

    o, d = generate_rays(camera, cfg, cam_s)
    t_cap = jnp.full((o.shape[0],), INF_DIST)

    # incoherent rays: same pixel origins lifted into the scene with
    # random directions (bounce-1-like distribution)
    key = jax.random.key(1)
    hit_p = o + jax.random.uniform(key, (o.shape[0], 1), minval=2.0,
                                   maxval=14.0) * d
    d_inc = jax.random.normal(jax.random.key(2), (o.shape[0], 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)

    for name, (oo, dd) in [("coherent(camera)", (o, d)),
                           ("incoherent(bounce-like)", (hit_p, d_inc))]:
        print(f"\n=== {name} ===")
        r = oo.shape[0]

        @jax.jit
        def sort_stage(oo, dd):
            keys = pk._ray_sort_keys(bvh.lo[0], bvh.hi[0], oo, dd)
            iota = jnp.arange(r, dtype=jnp.int32)
            _, perm = jax.lax.sort((keys, iota), num_keys=1)
            return oo[perm], dd[perm], perm

        (os_, ds_, perm), _ = timeit(sort_stage, oo, dd, label="ray sort")
        pad = (-r) % pk.TILE
        rp = r + pad
        nt = rp // pk.TILE
        ot = jnp.pad(os_, ((0, pad), (0, 0))).reshape(nt, pk.TILE, 3)
        dt_ = jnp.pad(ds_, ((0, pad), (0, 0)),
                      constant_values=1.0).reshape(nt, pk.TILE, 3)
        tct = jnp.pad(t_cap, (0, pad)).reshape(nt, pk.TILE)

        @jax.jit
        def cull_stage(ot, dt_, tct):
            return pk._per_ray_tile_overlap(ot, dt_, tct,
                                            ps.block_lo, ps.block_hi)

        overlap, _ = timeit(cull_stage, ot, dt_, tct,
                            label="per-ray x all-blocks cull")

        @jax.jit
        def quad_stage(overlap):
            return pk._build_quads(overlap)

        (qt, qb, nq), _ = timeit(quad_stage, overlap, label="build quads")

        counts = overlap.sum(axis=1)
        print(f"  blocks/tile: mean={float(counts.mean()):.1f} "
              f"p50={float(jnp.percentile(counts, 50)):.0f} "
              f"p99={float(jnp.percentile(counts, 99)):.0f} "
              f"max={int(counts.max())} of {ps.n_blocks}")
        print(f"  n_quads={int(nq)}  "
              f"(tri-tests/ray = {float(nq)*4*128/r:.0f})")

        # kernel alone, with quads precomputed
        rays = jnp.zeros((nt + 1, pk.TILE, 8), jnp.float32)
        rays = rays.at[:nt, :, 0:3].set(ot)
        rays = rays.at[:nt, :, 3:6].set(dt_)
        rays = rays.at[:nt, :, 6].set(tct)
        rays = rays.reshape((nt + 1) * pk.TILE, 8)
        window = min(2048, int(qt.shape[0]))
        wpad = (-int(qt.shape[0])) % window
        qt_p = jnp.concatenate([qt, jnp.full((wpad,), nt, jnp.int32)])
        qb_p = jnp.concatenate(
            [qb, jnp.full((wpad, 4), ps.n_blocks, jnp.int32)])

        from prismarine_core_tpu.ops.pallas_intersect import (
            pallas_quad_intersect_windowed)

        def kernel_stage(qt_p, qb_p, nq, rays):
            return pallas_quad_intersect_windowed(
                qt_p, qb_p, nq, rays, ps.planes, window=window,
                any_hit=False)

        timeit(kernel_stage, qt_p, qb_p, nq, rays, label="windowed quad kernel")

        @jax.jit
        def full_query(oo, dd, t_cap):
            return pk._run_packet_pallas(bvh, ps, oo, dd, t_cap, False)

        timeit(full_query, oo, dd, t_cap, label="full closest-hit query")

    print("\n=== full frame ===")

    def frame():
        return render_with_samples(scene, camera, cfg, cam_s, bounce_s)

    timeit(frame, label="render_with_samples (4 bounces)")


if __name__ == "__main__":
    main()
