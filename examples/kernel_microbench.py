"""Microbenchmark of the fused Pallas intersect kernel in isolation.

Builds the hall scene, reproduces an incoherent query's real pair list
(dense cull + compaction, exactly as `_run_packet_pallas` does), then
times ONLY `pallas_sb_intersect_windowed` under controlled masks:

  * zero masks  — every pair skips all 8 sub-blocks: measures the fixed
    per-pair cost (64 KB plane DMA + grid-step machinery);
  * real masks  — the production block masks;
  * full masks  — all 8 bits set: measures the marginal cost of one
    [TILE, BLOCK] Moller-Trumbore sub-block test.

From (zero, real, full) we derive: fixed us/pair, us per sub-block
test, and what fraction of kernel time the MT math actually is — the
facts that decide whether to optimize compute (op count, subtile
predication) or scheduling (window size, DMA layout).

Run on the real TPU: `python examples/kernel_microbench.py [n_tris]`.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from prismarine_core_tpu.accel import packet as pk
from prismarine_core_tpu.models.camera import Camera, generate_rays
from prismarine_core_tpu.models.procedural import make_hall_scene
from prismarine_core_tpu.ops.pallas_intersect import (
    RAY_COLS, pallas_sb_intersect_windowed)
from prismarine_core_tpu.ops.sampling import make_sample_arrays
from prismarine_core_tpu.utils.config import INF_DIST, RenderConfig


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))


def timeit(fn, *args, n=5, label=""):
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
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    cfg = RenderConfig(width=1280, height=720, spp=1, max_bounces=4,
                       intersector="pallas", bvh_leaf_size=4)
    scene = jax.device_put(make_hall_scene(target_tris=n_tris))
    bvh, ps = scene.bvh, scene.packets
    camera = Camera.look_at(eye=(-10.0, 2.2, 0.0), target=(6.0, 1.6, 0.0),
                            fov_y_deg=60.0)
    cam_s, _ = make_sample_arrays(jax.random.key(0), cfg.n_rays, 1)
    o, d = generate_rays(camera, cfg, cam_s)

    # incoherent bounce-like rays
    hit_p = o + jax.random.uniform(jax.random.key(1), (o.shape[0], 1),
                                   minval=2.0, maxval=14.0) * d
    d_inc = jax.random.normal(jax.random.key(2), (o.shape[0], 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)
    t_cap = jnp.full((o.shape[0],), INF_DIST)

    TILE = pk.TILE
    nsb = ps.n_superblocks

    @jax.jit
    def build_pairs(o, d, tc):
        o, d, tc, order, r = pk._sort_pad_rays(bvh.lo[0], bvh.hi[0],
                                               o, d, tc)
        nt = o.shape[0] // TILE
        ot = o.reshape(nt, TILE, 3)
        dt = d.reshape(nt, TILE, 3)
        tct = tc.reshape(nt, TILE)
        inv = pk._safe_inv(dt)
        sb_mask = pk._per_ray_tile_overlap(ot, inv, tct, ps.sb_lo,
                                           ps.sb_hi)
        pair_tile, pair_sb, n_pairs = pk._compact_pairs(sb_mask, nsb)
        pair_mask = pk._block_masks(ot, inv, tct, pair_tile, pair_sb,
                                    n_pairs, ps.block_lo, ps.block_hi)
        rays = jnp.zeros((nt + 1, TILE, RAY_COLS), jnp.float32)
        rays = rays.at[:nt, :, 0:3].set(ot)
        rays = rays.at[:nt, :, 3:6].set(dt)
        rays = rays.at[:nt, :, 6].set(tct)
        rays = rays.at[:nt, :, 8:11].set(pk._safe_inv(dt))
        rays = rays.reshape((nt + 1) * TILE, RAY_COLS)
        return pair_tile, pair_sb, pair_mask, n_pairs, rays, nt

    for name, (oo, dd) in [("coherent(camera)", (o, d)),
                           ("incoherent(bounce-like)", (hit_p, d_inc))]:
        pt, psb, pm, n_pairs, rays, nt = jax.tree_util.tree_map(
            lambda x: x, build_pairs(oo, dd, t_cap))
        n_pairs_i = int(n_pairs)
        pm_host = jax.device_get(pm)[:n_pairs_i]
        bits = sum(bin(int(m)).count("1") for m in pm_host)
        print(f"\n=== {name}: pairs={n_pairs_i} "
              f"live sub-blocks={bits} ({bits/max(n_pairs_i,1):.2f}/pair) "
              f"window={window} ===", flush=True)

        run = jax.jit(lambda pt, psb, pm, np_, rays: (
            pallas_sb_intersect_windowed(pt, psb, pm, np_, rays,
                                         ps.planes, window=window)))
        zero_pm = jnp.zeros_like(pm)
        full_pm = jnp.full_like(pm, 255)
        _, t_zero = timeit(run, pt, psb, zero_pm, n_pairs, rays,
                           label="kernel, masks=0 (fixed cost)")
        _, t_real = timeit(run, pt, psb, pm, n_pairs, rays,
                           label="kernel, real masks")
        _, t_full = timeit(run, pt, psb, full_pm, n_pairs, rays,
                           label="kernel, masks=255 (dense)")
        per_pair_fixed = t_zero * 1e3 / max(n_pairs_i, 1)
        mt_us = (t_full - t_zero) * 1e3 / max(n_pairs_i * 8, 1)
        print(f"  fixed {per_pair_fixed:.3f} us/pair; "
              f"marginal MT {mt_us:.3f} us/sub-block; "
              f"real kernel = {t_real:.1f} ms "
              f"({(t_real - t_zero) * 1e3 / max(bits, 1):.3f} us per live "
              f"sub-block incl. shared)", flush=True)


if __name__ == "__main__":
    main()
