"""Round-5 stage-level A/B: one-level (pallas) vs two-level (pallas2)
cull pipelines on the bench scene, plus the tests/ray counter.

Measures, per (coherent / incoherent) ray set:
  * dense cull kernel alone (block-granular vs superblock-granular)
  * derive stage (derive_pair_tables vs plain compare)
  * compaction (+ pair-refine kernel for p2)
  * full closest-hit / any-hit queries for both impls
  * work counters: pairs, live MT sub-blocks, tests/ray

Run: python examples/r5_stages.py [n_tris]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from prismarine_core_tpu.accel import packet as pk
from prismarine_core_tpu.models.camera import Camera, generate_rays
from prismarine_core_tpu.models.procedural import make_hall_scene
from prismarine_core_tpu.ops import pallas_cull as pc
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
    cfg = RenderConfig(width=1280, height=720, spp=1, max_bounces=4,
                       intersector="pallas", bvh_leaf_size=4)
    scene = jax.device_put(make_hall_scene(target_tris=n_tris))
    bvh, ps = scene.bvh, scene.packets
    camera = Camera.look_at(eye=(-10.0, 2.2, 0.0), target=(6.0, 1.6, 0.0),
                            fov_y_deg=60.0)
    cam_s, _ = make_sample_arrays(jax.random.key(0), cfg.n_rays, 1)
    nsb = ps.n_superblocks
    print(f"tris={int(scene.triangles.num_valid())} blocks={ps.n_blocks} "
          f"superblocks={nsb} rays={cfg.n_rays}", flush=True)

    o, d = generate_rays(camera, cfg, cam_s)
    t_cap = jnp.full((o.shape[0],), INF_DIST)
    key = jax.random.key(1)
    hit_p = o + jax.random.uniform(key, (o.shape[0], 1), minval=2.0,
                                   maxval=14.0) * d
    d_inc = jax.random.normal(jax.random.key(2), (o.shape[0], 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)

    for name, (oo, dd) in [("coherent(camera)", (o, d)),
                           ("incoherent(bounce-like)", (hit_p, d_inc))]:
        print(f"\n=== {name} ===", flush=True)

        @jax.jit
        def prep(oo, dd, tc):
            rays, order, _ = pk._sorted_rays_matrix(
                bvh.lo[0], bvh.hi[0], oo, dd, tc)
            nt = rays.shape[0] // pk.TILE - 1
            tct = rays[:nt * pk.TILE, 6].reshape(nt, pk.TILE)
            return rays, pk._live_tile_bound(tct)

        (rays, n_live), _ = timeit(prep, oo, dd, t_cap,
                                   label="sort + matrix + live bound")
        nt = rays.shape[0] // pk.TILE - 1

        # --- level-1 dense culls ---
        box_rows = pc.box_rows_from_blocks(ps.block_lo, ps.block_hi)
        sb_rows = pc.box_rows_from_blocks(ps.sb_lo, ps.sb_hi)
        sbbox = pc.sb_box_table(ps.block_lo, ps.block_hi)

        @jax.jit
        def cull_blocks(rays, n_live):
            return pc.pallas_block_cull(rays, box_rows, n_live)

        @jax.jit
        def cull_sbs(rays, n_live):
            return pc.pallas_block_cull(rays, sb_rows, n_live)

        tn_blk, _ = timeit(cull_blocks, rays, n_live,
                           label="dense cull @ BLOCK granularity (r4)")
        tn_sb, _ = timeit(cull_sbs, rays, n_live,
                          label="dense cull @ SB granularity (r5)")

        @jax.jit
        def derive_r4(tn_blk):
            return pc.derive_pair_tables(tn_blk, nsb, pk.SB)

        @jax.jit
        def derive_r5(tn_sb):
            t = tn_sb[:, :nsb]
            return t < INF_DIST, t

        (sb_mask4, sb_tn4, mask8), _ = timeit(derive_r4, tn_blk,
                                              label="derive (r4 tables)")
        (sb_mask5, sb_tn5), _ = timeit(derive_r5, tn_sb,
                                       label="derive (r5 compare)")

        @jax.jit
        def compact_r4(sb_mask, mask8, n_live):
            return pk._compact_pairs_masked(sb_mask, mask8, n_live,
                                            align=8)

        @jax.jit
        def compact_r5(sb_mask, n_live):
            nt_, nsb_ = sb_mask.shape
            sb2d = jnp.broadcast_to(
                jnp.arange(nsb_, dtype=jnp.int32), sb_mask.shape)
            return pk._compact_rows_masked(
                sb_mask, sb2d, None, nt_, nsb_,
                jnp.minimum(n_live * nsb_, nt_ * nsb_), align=8)

        (pt4, psb4, pm4, np4), _ = timeit(compact_r4, sb_mask4, mask8,
                                          n_live,
                                          label="masked compaction (r4)")
        (pt5, psb5, _, np5), _ = timeit(compact_r5, sb_mask5, n_live,
                                        label="compaction (r5, no masks)")

        @jax.jit
        def refine(pt, psb, np_, rays):
            return pc.pallas_pair_cull(pt, psb, np_, rays, sbbox,
                                       cpps=8, window=4096)

        pm5, _ = timeit(refine, pt5, psb5, np5, rays,
                        label="pair-refine kernel (r5)")
        print(f"  pairs r4={int(np4)} r5={int(np5)}  "
              f"mt_sb r4={int(jnp.sum(jnp.bitwise_count(pm4.astype(jnp.uint32))))} "
              f"r5={int(jnp.sum(jnp.bitwise_count(pm5.astype(jnp.uint32))))}",
              flush=True)

        # --- full queries + counters ---
        for impl in ("pallas", "pallas2"):
            q = partial(pk._run_packet_pallas, cull_impl=impl,
                        pairs_per_step=8, stale_round_masks=True)

            @jax.jit
            def closest(oo, dd, tc):
                return q(bvh.lo[0], bvh.hi[0], ps, oo, dd, tc)[:2]

            @jax.jit
            def anyhit(oo, dd, tc):
                return q(bvh.lo[0], bvh.hi[0], ps, oo, dd, tc,
                         any_hit=True, strategy="single")[:2]

            timeit(closest, oo, dd, t_cap,
                   label=f"closest-hit query ({impl})")
            timeit(anyhit, oo, dd, jnp.full((oo.shape[0],), 30.0),
                   label=f"any-hit 'single' query ({impl})")

            @jax.jit
            def counters(oo, dd, tc):
                return q(bvh.lo[0], bvh.hi[0], ps, oo, dd, tc,
                         with_counters=True)[3]

            c = counters(oo, dd, t_cap)
            r = oo.shape[0]
            print(f"  [{impl}] closest: pairs={int(c['n_pairs']):,} "
                  f"mt_sb={int(c['mt_subblocks']):,} "
                  f"tests/ray={int(c['mt_subblocks'])*128*128/r:,.0f}",
                  flush=True)


if __name__ == "__main__":
    main()
