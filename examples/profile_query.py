"""Stage-level profiling of one Pallas closest-hit query on the bench scene.

Times: key sort, per-ray block culling, quad-list build, windowed kernel.
Run on TPU: python examples/profile_query.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from prismarine_core_tpu.accel import packet as pk
from prismarine_core_tpu.models.camera import Camera, generate_rays
from prismarine_core_tpu.models.procedural import make_hall_scene
from prismarine_core_tpu.ops import sampling as smp
from prismarine_core_tpu.utils.config import INF_DIST, RenderConfig


def timeit(name, fn, *a, n=3, **kw):
    out = jax.block_until_ready(fn(*a, **kw))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:36s} {dt*1e3:9.2f} ms")
    return out, dt


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cfg = RenderConfig(width=1280, height=720, spp=1, max_bounces=4,
                       intersector="pallas", bvh_leaf_size=4)
    scene = jax.device_put(make_hall_scene(target_tris=n_tris))
    camera = Camera.look_at(eye=(-10.0, 2.2, 0.0), target=(6.0, 1.6, 0.0),
                            fov_y_deg=60.0)
    cam_s, _ = smp.make_sample_arrays(jax.random.key(0), cfg.n_rays,
                                      cfg.max_bounces)
    o, d = jax.jit(lambda: generate_rays(camera, cfg, cam_s))()
    o, d = jax.block_until_ready((o, d))
    r = o.shape[0]
    t_cap = jnp.full((r,), INF_DIST)
    bvh, ps = scene.bvh, scene.packets
    print(f"rays={r} tris={int(scene.triangles.num_valid())} "
          f"blocks={ps.n_blocks}")

    # stage 1: sort
    @jax.jit
    def stage_sort(o, d, t_cap):
        keys = pk._ray_sort_keys(bvh.lo[0], bvh.hi[0], o, d)
        iota = jnp.arange(r, dtype=jnp.int32)
        _, perm = jax.lax.sort((keys, iota), num_keys=1)
        return o[perm], d[perm], t_cap[perm], perm

    (os_, ds_, tc_, perm), _ = timeit("sort rays", stage_sort, o, d, t_cap)

    pad = (-r) % pk.TILE
    rp = r + pad
    nt = rp // pk.TILE
    if pad:
        os_ = jnp.concatenate([os_, jnp.tile(jnp.asarray([[0., 0., 1e8]]), (pad, 1))])
        ds_ = jnp.concatenate([ds_, jnp.tile(jnp.asarray([[1., 0., 0.]]), (pad, 1))])
        tc_ = jnp.concatenate([tc_, jnp.zeros((pad,))])
    ot = os_.reshape(nt, pk.TILE, 3)
    dt_ = ds_.reshape(nt, pk.TILE, 3)
    tct = tc_.reshape(nt, pk.TILE)

    # stage 2: per-ray culling
    cull = jax.jit(lambda ot, dt, tct: pk._per_ray_tile_overlap(
        ot, dt, tct, ps.block_lo, ps.block_hi))
    overlap, _ = timeit("per-ray block culling", cull, ot, dt_, tct)
    counts = jax.device_get(overlap.sum(axis=1))
    print(f"  blocks/tile: mean={counts.mean():.1f} max={counts.max()} "
          f"p50={jnp.median(jnp.asarray(counts)):.0f}")

    # stage 3: quad list build
    bq = jax.jit(pk._build_quads)
    (quad_tile, quad_blocks, n_quads), _ = timeit(
        "build quad lists", bq, overlap)
    nq = int(jax.device_get(n_quads))
    print(f"  quads={nq} (= {nq*4*128/1e6:.1f}M ray-tri... x128 rays "
          f"= {nq*4*128*128/1e9:.1f} G MT tests)")

    # stage 4: full pallas query (end to end)
    full = jax.jit(lambda o, d, t_cap: pk._run_packet_pallas(
        bvh, ps, o, d, t_cap, any_hit=False))
    _, dt_full = timeit("FULL closest-hit query", full, o, d, t_cap, n=2)

    # stage 4b: kernel-only (reuse prebuilt lists)
    from prismarine_core_tpu.ops.pallas_intersect import (
        pallas_quad_intersect_windowed)
    nb = ps.n_blocks
    window = 2048
    lq = int(quad_tile.shape[0])
    wpad = (-lq) % window
    qt = jnp.concatenate([quad_tile, jnp.full((wpad,), nt, jnp.int32)])
    qb = jnp.concatenate([quad_blocks, jnp.full((wpad, 4), nb, jnp.int32)])
    rays = jnp.zeros((nt + 1, pk.TILE, 8), jnp.float32)
    rays = rays.at[:nt, :, :3].set(ot).at[:nt, :, 3:6].set(dt_)
    rays = rays.at[:nt, :, 6].set(tct).reshape((nt + 1) * pk.TILE, 8)
    kern = jax.jit(lambda qt, qb, nq, rays: pallas_quad_intersect_windowed(
        qt, qb, nq, rays, ps.planes, window=window))
    _, dt_k = timeit("windowed kernel only", kern, qt, qb, n_quads, rays,
                     n=2)
    print(f"  kernel MT throughput: "
          f"{nq*4*128*128/dt_k/1e9:.1f} G ray-tri tests/s")


if __name__ == "__main__":
    main()
