"""Round-4 stage-level timing: old (r3 XLA) vs new (pallas-cull) stages.

Times, for coherent camera rays and incoherent bounce-like rays:
  sorts:      full (r3) vs packed vs group
  cull:       _per_ray_tile_overlap+_block_masks (r3) vs
              pallas_block_cull+derive_pair_tables (r4)
  compaction: _compact_pairs (r3) vs _compact_pairs_masked (r4 windowed)
  queries:    closest (xla / pallas+recull=kernel / pallas+recull=sb),
              any-hit rounds (xla / pallas)

Run on the real TPU: `python examples/r4_stages.py [n_tris]`.
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
from prismarine_core_tpu.utils.config import INF_DIST, RenderConfig


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))


def timeit(fn, *args, n=3, label=""):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        _force(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"  {label:<46s} {dt:9.2f} ms", flush=True)
    return out, dt


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    mult = 1
    if "--mult" in sys.argv:
        mult = int(sys.argv[sys.argv.index("--mult") + 1])
    cfg = RenderConfig(width=1280, height=720, spp=1, max_bounces=4,
                       intersector="pallas", bvh_leaf_size=4)
    scene = jax.device_put(make_hall_scene(target_tris=n_tris))
    bvh, ps = scene.bvh, scene.packets
    camera = Camera.look_at(eye=(-10.0, 2.2, 0.0), target=(6.0, 1.6, 0.0),
                            fov_y_deg=60.0)
    cam_s, _ = make_sample_arrays(jax.random.key(0), cfg.n_rays,
                                  cfg.max_bounces)
    print(f"tris={int(scene.triangles.num_valid())} "
          f"blocks={ps.n_blocks} superblocks={ps.n_superblocks} "
          f"rays={cfg.n_rays}", flush=True)

    o, d = generate_rays(camera, cfg, cam_s)
    if mult > 1:          # spp-style ray-count scaling diagnosis
        o = jnp.tile(o, (mult, 1))
        d = jnp.tile(d, (mult, 1))
        print(f"rays x{mult} = {o.shape[0]}", flush=True)
    t_cap = jnp.full((o.shape[0],), INF_DIST)
    key = jax.random.key(1)
    hit_p = o + jax.random.uniform(key, (o.shape[0], 1), minval=2.0,
                                   maxval=14.0) * d
    d_inc = jax.random.normal(jax.random.key(2), (o.shape[0], 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)

    from prismarine_core_tpu.ops.pallas_cull import (
        box_rows_from_blocks, derive_pair_tables, pallas_block_cull)
    from prismarine_core_tpu.ops.pallas_intersect import RAY_COLS

    for name, (oo, dd) in [("coherent(camera)", (o, d)),
                           ("incoherent(bounce-like)", (hit_p, d_inc))]:
        print(f"\n=== {name} ===", flush=True)

        for mode in ("full", "packed", "group"):
            sf = jax.jit(lambda oo, dd, tc, m=mode: pk._sort_pad_rays(
                bvh.lo[0], bvh.hi[0], oo, dd, tc, mode=m))
            (os_, ds_, tc_, _, _), _ = timeit(sf, oo, dd, t_cap,
                                              label=f"sort[{mode}]+pad")

        nt = os_.shape[0] // pk.TILE
        ot = os_.reshape(nt, pk.TILE, 3)
        dt_ = ds_.reshape(nt, pk.TILE, 3)
        tct = tc_.reshape(nt, pk.TILE)
        inv = pk._safe_inv(dt_)
        nsb = ps.n_superblocks

        # ---- old stages ----
        cull_old = jax.jit(lambda ot, inv, tct: pk._per_ray_tile_overlap(
            ot, inv, tct, ps.sb_lo, ps.sb_hi))
        sb_mask, _ = timeit(cull_old, ot, inv, tct,
                            label="r3 dense superblock cull")
        comp_old = jax.jit(lambda m: pk._compact_pairs(m, nsb))
        (pt, psb, npairs), _ = timeit(comp_old, sb_mask,
                                      label="r3 pair compaction")
        mask_old = jax.jit(lambda pt, psb, np_: pk._block_masks(
            ot, inv, tct, pt, psb, np_, ps.block_lo, ps.block_hi))
        timeit(mask_old, pt, psb, npairs, label="r3 block masks")

        # ---- new stages ----
        rays = jnp.zeros((nt + 1, pk.TILE, RAY_COLS), jnp.float32)
        rays = rays.at[:nt, :, 0:3].set(ot)
        rays = rays.at[:nt, :, 3:6].set(dt_)
        rays = rays.at[:nt, :, 6].set(tct)
        rays = rays.at[:nt, :, 8:11].set(inv)
        rays = rays.reshape((nt + 1) * pk.TILE, RAY_COLS)
        box_rows = box_rows_from_blocks(ps.block_lo, ps.block_hi)
        n_live = pk._live_tile_bound(tct)

        for chunk in (512, 1024, 2048):
            cf = jax.jit(lambda r_, b_, nl, c=chunk: pallas_block_cull(
                r_, b_, nl, chunk=c))
            tn_blk, _ = timeit(cf, rays, box_rows, n_live,
                               label=f"r4 pallas block cull[{chunk}]")

        der = jax.jit(lambda t: derive_pair_tables(t, nsb, pk.SB))
        (sb_m2, sb_tn2, mask8), _ = timeit(der, tn_blk,
                                           label="r4 derive tables")
        comp_new = jax.jit(lambda m, m8, nl: pk._compact_pairs_masked(
            m, m8, nl))
        (pt2, psb2, pm2, np2), _ = timeit(comp_new, sb_m2, mask8, n_live,
                                          label="r4 masked compaction")
        nb_old = jnp.sum(jnp.bitwise_count(
            mask_old(pt, psb, npairs).astype(jnp.uint32)))
        nb_new = jnp.sum(jnp.bitwise_count(pm2.astype(jnp.uint32)))
        print(f"  pairs r3={int(npairs)} r4={int(np2)}; "
              f"block-tests r3={int(nb_old)} r4={int(nb_new)}",
              flush=True)

        # ---- full queries ----
        for label, kw in [
            ("closest r3(xla)", dict(cull_impl="xla")),
            ("closest r4 recull=kernel", dict(cull_impl="pallas",
                                              recull="kernel")),
            ("closest r4 recull=sb", dict(cull_impl="pallas",
                                          recull="sb")),
        ]:
            f = jax.jit(lambda oo, dd, tc, kw=kw: pk._run_packet_pallas(
                bvh.lo[0], bvh.hi[0], ps, oo, dd, tc, False, **kw))
            timeit(f, oo, dd, t_cap, label=label)

        for label, kw in [
            ("any-hit r3(xla)", dict(cull_impl="xla")),
            ("any-hit r4(pallas)", dict(cull_impl="pallas")),
        ]:
            f = jax.jit(lambda oo, dd, tc, kw=kw: pk._run_packet_pallas(
                bvh.lo[0], bvh.hi[0], ps, oo, dd, tc, True, **kw))
            timeit(f, oo, dd, jnp.full((oo.shape[0],), 30.0),
                   label=label)

        # ---- PRODUCTION config (pps8, any-hit single) ----
        prod = dict(cull_impl="pallas", recull="sb", pairs_per_step=8)
        f = jax.jit(lambda oo, dd, tc: pk._run_packet_pallas(
            bvh.lo[0], bvh.hi[0], ps, oo, dd, tc, False, **prod))
        timeit(f, oo, dd, t_cap, label="closest PROD pps8")
        f = jax.jit(lambda oo, dd, tc: pk._run_packet_pallas(
            bvh.lo[0], bvh.hi[0], ps, oo, dd, tc, True,
            strategy="single", **prod))
        timeit(f, oo, dd, jnp.full((oo.shape[0],), 30.0),
               label="any-hit PROD pps8 single")

        # sorted-matrix build alone (keys+sort+inv+row gather)
        f = jax.jit(lambda oo, dd, tc: pk._sorted_rays_matrix(
            bvh.lo[0], bvh.hi[0], oo, dd, tc))
        timeit(f, oo, dd, t_cap, label="sorted-matrix build (fused)")


if __name__ == "__main__":
    main()
