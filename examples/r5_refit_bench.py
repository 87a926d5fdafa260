"""Full-rebuild vs topology-reusing refit cost at bench scale
(VERDICT r4 item 9): times `build_bvh` (Morton sort + Karras topology
+ escape links + fix-point AABBs) against `refit_bvh` (leaf + fix-point
AABB re-union over frozen topology) and `build_packet_set`, at the
hall's 137k triangles.  This bounds both the animated-geometry frame
cost and the inverse-rendering step's in-loss rebuild.

Run: python examples/r5_refit_bench.py [n_tris]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from prismarine_core_tpu.accel.lbvh import build_bvh, refit_bvh
from prismarine_core_tpu.accel.packet import build_packet_set
from prismarine_core_tpu.models.procedural import make_hall_scene


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
    return out


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    scene = make_hall_scene(target_tris=n_tris, build_bvh=False)
    soup = jax.device_put(scene.triangles)
    print(f"tris={int(soup.num_valid())}", flush=True)

    bvh = timeit(lambda s: build_bvh(s, leaf_size=4), soup, n=5,
                 label="full build_bvh (sort+topology+AABBs)")
    timeit(refit_bvh, bvh, soup, n=5,
           label="refit_bvh (frozen topology)")
    timeit(build_packet_set, bvh, n=5,
           label="build_packet_set (planes + block AABBs)")


if __name__ == "__main__":
    main()
