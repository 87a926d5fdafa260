"""One-stop TPU measurement session: runs every perf experiment in
sequence so a single (slow) tunnel session yields all decision data.

Stages (each prints incrementally, flush=True):
  1. kernel microbench: fixed per-pair cost vs marginal MT cost
     (zero/real/full masks) on coherent + incoherent pair lists;
  2. window-size sweep for the fused kernel;
  3. stage profile of a full query (sort / dense cull / compaction /
     block masks / kernel) with forced value readbacks;
  4. full-frame hall bench (the bench.py main config, 1 frame timed).

Usage: python examples/tpu_measurement_suite.py [n_tris]
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
from prismarine_core_tpu.render.integrator import render_with_samples
from prismarine_core_tpu.utils.config import INF_DIST, RenderConfig


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))


def timeit(fn, *args, n=3, label=""):
    t0 = time.perf_counter()
    out = fn(*args)
    _force(out)
    print(f"  {label:<46s} warm {time.perf_counter()-t0:6.1f} s",
          flush=True, end="")
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        _force(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"   {dt:9.2f} ms", flush=True)
    return out, dt


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    t_start = time.time()
    cfg = RenderConfig(width=1280, height=720, spp=1, max_bounces=4,
                       intersector="pallas", bvh_leaf_size=4)
    print(f"[suite] building scene ({n_tris} target tris)...", flush=True)
    scene = jax.device_put(make_hall_scene(target_tris=n_tris))
    bvh, ps = scene.bvh, scene.packets
    print(f"[suite] scene on device after {time.time()-t_start:.0f}s: "
          f"tris={int(scene.triangles.num_valid())} "
          f"blocks={ps.n_blocks} superblocks={ps.n_superblocks}",
          flush=True)

    camera = Camera.look_at(eye=(-10.0, 2.2, 0.0), target=(6.0, 1.6, 0.0),
                            fov_y_deg=60.0)
    cam_s, bounce_s = make_sample_arrays(jax.random.key(0), cfg.n_rays,
                                         cfg.max_bounces)
    o, d = generate_rays(camera, cfg, cam_s)
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
        rays = rays.at[:nt, :, 8:11].set(inv)
        rays = rays.reshape((nt + 1) * TILE, RAY_COLS)
        return pair_tile, pair_sb, pair_mask, n_pairs, rays

    # ---------------- stage 1+2: kernel microbench ----------------
    for name, (oo, dd) in [("coherent", (o, d)),
                           ("incoherent", (hit_p, d_inc))]:
        pt, psb, pm, n_pairs, rays = build_pairs(oo, dd, t_cap)
        n_pairs_i = int(n_pairs)
        import numpy as np
        pm_host = np.asarray(jax.device_get(pm))[:n_pairs_i]
        bits = int(np.bitwise_count(pm_host.astype(np.uint8)).sum()) \
            if hasattr(np, "bitwise_count") else \
            sum(bin(int(m)).count("1") for m in pm_host)
        print(f"\n=== {name}: pairs={n_pairs_i} live sub-blocks={bits} "
              f"({bits/max(n_pairs_i,1):.2f}/pair) ===", flush=True)

        for window in (512, 1024, 2048):
            run = jax.jit(lambda pt, psb, pm, np_, rays, w=window: (
                pallas_sb_intersect_windowed(pt, psb, pm, np_, rays,
                                             ps.planes, window=w)))
            _, t_real = timeit(run, pt, psb, pm, n_pairs, rays,
                               label=f"kernel window={window} real masks")
        window = 1024
        run = jax.jit(lambda pt, psb, pm, np_, rays: (
            pallas_sb_intersect_windowed(pt, psb, pm, np_, rays,
                                         ps.planes, window=window)))
        _, t_zero = timeit(run, pt, psb, jnp.zeros_like(pm), n_pairs,
                           rays, label="kernel masks=0 (fixed cost)")
        _, t_full = timeit(run, pt, psb, jnp.full_like(pm, 255),
                           n_pairs, rays, label="kernel masks=255 (dense)")
        print(f"  -> fixed {t_zero*1e3/max(n_pairs_i,1):.3f} us/pair, "
              f"marginal MT {(t_full-t_zero)*1e3/max(n_pairs_i*8,1):.3f} "
              f"us/sub-block", flush=True)

    # ---------------- stage 3: query stage profile ----------------
    print("\n=== stage profile (incoherent) ===", flush=True)

    @jax.jit
    def sort_stage(oo, dd, tc):
        return pk._sort_pad_rays(bvh.lo[0], bvh.hi[0], oo, dd, tc)[:3]

    (os_, ds_, tcs_), _ = timeit(sort_stage, hit_p, d_inc, t_cap,
                                 label="sort+pad")
    nt = os_.shape[0] // TILE
    ot = os_.reshape(nt, TILE, 3)
    dt_ = ds_.reshape(nt, TILE, 3)
    tct = tcs_.reshape(nt, TILE)
    inv = pk._safe_inv(dt_)

    @jax.jit
    def cull_stage(ot, inv, tct):
        return pk._per_ray_tile_overlap(ot, inv, tct, ps.sb_lo, ps.sb_hi)

    sb_mask, _ = timeit(cull_stage, ot, inv, tct,
                        label="dense superblock cull")

    @jax.jit
    def compact_stage(sb_mask):
        return pk._compact_pairs(sb_mask, nsb)

    (ptile, psb_, npairs), _ = timeit(compact_stage, sb_mask,
                                      label="pair compaction")

    @jax.jit
    def mask_stage(ot, inv, tct, ptile, psb_, npairs):
        return pk._block_masks(ot, inv, tct, ptile, psb_, npairs,
                               ps.block_lo, ps.block_hi)

    timeit(mask_stage, ot, inv, tct, ptile, psb_, npairs,
           label="block-mask refinement")

    @jax.jit
    def full_closest(oo, dd, tc):
        return pk._run_packet_pallas(bvh.lo[0], bvh.hi[0], ps, oo, dd,
                                     tc)[0]

    @jax.jit
    def full_anyhit(oo, dd, tc):
        return pk._run_packet_pallas(bvh.lo[0], bvh.hi[0], ps, oo, dd,
                                     tc, any_hit=True)[0]

    for name, (oo, dd) in [("coherent", (o, d)),
                           ("incoherent", (hit_p, d_inc))]:
        timeit(full_closest, oo, dd, t_cap,
               label=f"FULL closest-hit query ({name})")
        timeit(full_anyhit, oo, dd, t_cap * 0.002,
               label=f"FULL any-hit query ({name})")

    # ---------------- stage 4: full frame ----------------
    print("\n=== full frame (hall 720p 4 bounces) ===", flush=True)

    def frame(scene, camera, cam_s, bounce_s):
        return render_with_samples(scene, camera, cfg, cam_s, bounce_s)

    timeit(frame, scene, camera, cam_s, bounce_s, n=3,
           label="render_with_samples")
    print(f"[suite] total wall {time.time()-t_start:.0f}s", flush=True)


if __name__ == "__main__":
    main()
