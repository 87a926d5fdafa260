"""Per-bounce capacity-reduction bound (VERDICT r4 item 8).

Late bounces run at full lane capacity with ~50-75% dead lanes; dead
lanes already sort last and emit no pairs, so the open question is how
much the remaining FULL-SHAPE stage costs (sort, matrix build, [nt,*]
selection tables, unsort) would shrink if live rays were PHYSICALLY
compacted to a smaller batch.  This measures exactly that upper bound:
the same query with (a) dead lanes masked (production), vs (b) the
live rays truncated to a half/quarter-size array — the difference is
the most any integrator-level compaction could save, BEFORE paying its
own per-bounce gather/scatter cost.

Run: python examples/r5_capacity.py [n_tris]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

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
    print(f"  {label:<52s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cfg = RenderConfig(width=1280, height=720, spp=1, max_bounces=4,
                       intersector="pallas", bvh_leaf_size=4)
    scene = jax.device_put(make_hall_scene(target_tris=n_tris))
    bvh, ps = scene.bvh, scene.packets
    camera = Camera.look_at(eye=(-10.0, 2.2, 0.0), target=(6.0, 1.6, 0.0),
                            fov_y_deg=60.0)
    cam_s, _ = make_sample_arrays(jax.random.key(0), cfg.n_rays, 1)
    o, d = generate_rays(camera, cfg, cam_s)
    r = o.shape[0]
    print(f"tris={int(scene.triangles.num_valid())} rays={r}",
          flush=True)

    key = jax.random.key(1)
    hp = o + jax.random.uniform(key, (r, 1), minval=2.0,
                                maxval=14.0) * d
    di = jax.random.normal(jax.random.key(2), (r, 3))
    di = di / jnp.linalg.norm(di, axis=-1, keepdims=True)

    q = partial(pk._run_packet_pallas, cull_impl="pallas2",
                pairs_per_step=8, stale_round_masks=True, k_round=16,
                cull_window=8192)

    for live_frac in (0.5, 0.25):
        n_live = int(r * live_frac)
        # random live subset (late-bounce liveness is spatially mixed)
        perm = np.random.default_rng(7).permutation(r)
        live_idx = jnp.asarray(np.sort(perm[:n_live]))
        mask = jnp.zeros((r,), bool).at[live_idx].set(True)
        t_cap_masked = jnp.where(mask, INF_DIST, 0.0)

        @jax.jit
        def masked(oo, dd, tc):
            return q(bvh.lo[0], bvh.hi[0], ps, oo, dd, tc)[:2]

        @jax.jit
        def truncated(oo, dd):
            return q(bvh.lo[0], bvh.hi[0], ps, oo, dd,
                     jnp.full((oo.shape[0],), INF_DIST))[:2]

        print(f"== live fraction {live_frac:.0%} ==", flush=True)
        a = timeit(masked, hp, di, t_cap_masked,
                   label=f"full-capacity query, {live_frac:.0%} live "
                         f"(dead masked+sorted-last)")
        b = timeit(truncated, hp[live_idx], di[live_idx],
                   label=f"physically truncated to {n_live:,} lanes")
        print(f"  -> compaction upper bound {a-b:9.2f} ms/query "
              f"(before paying the per-bounce gather/scatter)",
              flush=True)


if __name__ == "__main__":
    main()
