"""Round-5 strategy sweep with WORK COUNTERS on incoherent rays.

The kernel MT work (10.7k tests/ray incoherent under two_round) is now
the bulk of every closest query; this sweeps execution strategies with
the two-level cull's cheap per-round mask refresh and prints BOTH
wall-clock and tests/ray, so the work-vs-overhead tradeoff is explicit.

Run: python examples/r5_counters.py [n_tris]
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
from prismarine_core_tpu.ops.sampling import make_sample_arrays
from prismarine_core_tpu.utils.config import INF_DIST, RenderConfig

VARIANTS = {
    "2r-k8-p1": dict(cull_impl="pallas"),
    "2r-k8-p2": dict(cull_impl="pallas2"),
    "2r-k16-p2": dict(cull_impl="pallas2", k_round=16),
    "2r-k4-p2": dict(cull_impl="pallas2", k_round=4),
    "rounds-k4-p2": dict(cull_impl="pallas2", strategy="rounds",
                         k_round=4, stale_round_masks=False),
    "rounds-k8-p2": dict(cull_impl="pallas2", strategy="rounds",
                         k_round=8, stale_round_masks=False),
    "rounds-k16-p2": dict(cull_impl="pallas2", strategy="rounds",
                          k_round=16, stale_round_masks=False),
    "rounds-k8-p2-stale": dict(cull_impl="pallas2", strategy="rounds",
                               k_round=8),
    "single-p2": dict(cull_impl="pallas2", strategy="single"),
}


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cfg = RenderConfig(width=1280, height=720, spp=1, max_bounces=4,
                       intersector="pallas", bvh_leaf_size=4)
    scene = jax.device_put(make_hall_scene(target_tris=n_tris))
    bvh, ps = scene.bvh, scene.packets
    camera = Camera.look_at(eye=(-10.0, 2.2, 0.0), target=(6.0, 1.6, 0.0),
                            fov_y_deg=60.0)
    cam_s, _ = make_sample_arrays(jax.random.key(0), cfg.n_rays, 1)
    print(f"tris={int(scene.triangles.num_valid())} rays={cfg.n_rays}",
          flush=True)

    o, d = generate_rays(camera, cfg, cam_s)
    t_cap = jnp.full((o.shape[0],), INF_DIST)
    key = jax.random.key(1)
    hit_p = o + jax.random.uniform(key, (o.shape[0], 1), minval=2.0,
                                   maxval=14.0) * d
    d_inc = jax.random.normal(jax.random.key(2), (o.shape[0], 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)
    r = o.shape[0]

    for name, kw in VARIANTS.items():
        q = partial(pk._run_packet_pallas, pairs_per_step=8, **kw)

        @jax.jit
        def closest(oo, dd, tc):
            t, slot, _, c = q(bvh.lo[0], bvh.hi[0], ps, oo, dd, tc,
                              with_counters=True)
            return t, slot, c

        t0 = time.perf_counter()
        t, slot, c = closest(hit_p, d_inc, t_cap)
        _force(t)
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            out = closest(hit_p, d_inc, t_cap)
            _force(out[0])
        dt = (time.perf_counter() - t0) / 3 * 1e3
        print(f"[r5_cnt] {name:22s} {dt:8.1f} ms  "
              f"pairs={int(c['n_pairs']):>9,} "
              f"mt_sb={int(c['mt_subblocks']):>9,} "
              f"tests/ray={int(c['mt_subblocks'])*128*128/r:>8,.0f} "
              f"(compile {comp:.0f}s, slotsum={int(jnp.sum(slot >= 0))})",
              flush=True)


if __name__ == "__main__":
    main()
