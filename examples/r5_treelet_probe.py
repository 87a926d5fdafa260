"""Probe: would TREELET-packed blocks cut MT work?

Current packet blocks are fixed 128-slot runs of the Morton order;
their AABBs ignore the radix tree's adaptive splits.  This probe cuts
the Karras tree into subtree spans (<= 128 slots each), packs each
span (or greedy merges of spans) into its own padded block, and
compares CANDIDATE WORK — the number of (tile, block) pairs passing
the exact per-ray slab test — against the fixed-run packing, on
coherent and incoherent ray sets.  Pure CPU/numpy+XLA; no kernel runs.

Run: python examples/r5_treelet_probe.py [n_tris] [scale]
"""

from __future__ import annotations

import sys

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from prismarine_core_tpu.accel import packet as pk  # noqa: E402
from prismarine_core_tpu.models.camera import (  # noqa: E402
    Camera, generate_rays)
from prismarine_core_tpu.models.procedural import (  # noqa: E402
    make_hall_scene)
from prismarine_core_tpu.ops.sampling import (  # noqa: E402
    make_sample_arrays)
from prismarine_core_tpu.utils.config import (  # noqa: E402
    INF_DIST, RenderConfig)


def karras_spans(bvh, max_slots=128):
    """Cut the radix tree into disjoint contiguous leaf spans of
    <= max_slots slots: descend while too big, emit otherwise."""
    first_leaf = bvh.first_leaf
    left = np.asarray(bvh.left)
    skip = np.asarray(bvh.skip)
    k = bvh.leaf_size
    max_leaves = max_slots // k

    # leaf range per node, bottom-up
    n_nodes = bvh.n_nodes
    lo = np.zeros(n_nodes, np.int64)
    hi = np.zeros(n_nodes, np.int64)
    lo[first_leaf:] = np.arange(first_leaf + 1)
    hi[first_leaf:] = np.arange(first_leaf + 1)
    # children of internal i: left[i], skip[left[i]]
    order = []  # internal nodes in reverse BFS
    stack = [0]
    seen = []
    while stack:
        n = stack.pop()
        if n < first_leaf:
            seen.append(n)
            stack.append(left[n])
            stack.append(skip[left[n]])
    for n in reversed(seen):
        a, b = left[n], skip[left[n]]
        lo[n] = min(lo[a], lo[b])
        hi[n] = max(hi[a], hi[b])

    spans = []
    stack = [0]
    while stack:
        n = stack.pop()
        if hi[n] - lo[n] + 1 <= max_leaves or n >= first_leaf:
            spans.append((int(lo[n]), int(hi[n])))
        else:
            stack.append(skip[left[n]])
            stack.append(left[n])
    spans.sort()
    return spans, k


def blocks_from_spans(bvh, spans, k, greedy_fill: bool):
    """Span list -> block AABBs + real slot count per block."""
    tv0 = np.asarray(bvh.tv0)
    tv1 = np.asarray(bvh.tv1)
    tv2 = np.asarray(bvh.tv2)
    orig = np.asarray(bvh.orig)
    blocks = []
    cur = []
    cur_slots = 0
    for (a, b) in spans:
        s = (b - a + 1) * k
        if greedy_fill and cur_slots + s <= 128:
            cur.append((a, b))
            cur_slots += s
            continue
        if cur:
            blocks.append(cur)
        cur = [(a, b)]
        cur_slots = s
    if cur:
        blocks.append(cur)

    lo_list, hi_list, real = [], [], []
    for group in blocks:
        sl = []
        for (a, b) in group:
            sl.extend(range(a * k, (b + 1) * k))
        sl = np.asarray(sl)
        valid = orig[sl] >= 0
        if not valid.any():
            continue
        v = sl[valid]
        p = np.concatenate([tv0[v], tv1[v], tv2[v]])
        lo_list.append(p.min(0))
        hi_list.append(p.max(0))
        real.append(valid.sum())
    return (np.asarray(lo_list, np.float32),
            np.asarray(hi_list, np.float32), np.asarray(real))


def fixed_blocks(ps):
    lo = np.asarray(ps.block_lo)
    hi = np.asarray(ps.block_hi)
    orig = np.asarray(ps.slot_orig).reshape(len(lo), -1)
    real = (orig >= 0).sum(1)
    keep = real > 0
    return lo[keep], hi[keep], real[keep]


def count_work(ot, inv, tct, lo, hi, real):
    """Exact per-tile slab candidates -> (listed blocks, listed real
    slots) summed over tiles."""
    m = pk._per_ray_tile_overlap(ot, inv, tct, jnp.asarray(lo),
                                 jnp.asarray(hi))
    m = np.asarray(m)
    listed = int(m.sum())
    slots = int((m * real[None, :]).sum())
    return listed, slots


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cfg = RenderConfig(width=1280 // scale, height=720 // scale, spp=1,
                       max_bounces=1, intersector="pallas")
    scene = make_hall_scene(target_tris=n_tris)
    bvh, ps = scene.bvh, scene.packets
    cam = Camera.look_at(eye=(-10.0, 2.2, 0.0), target=(6.0, 1.6, 0.0),
                         fov_y_deg=60.0)
    cam_s, _ = make_sample_arrays(jax.random.key(0), cfg.n_rays, 1)
    o, d = generate_rays(cam, cfg, cam_s)
    t_cap = jnp.full((o.shape[0],), INF_DIST)
    key = jax.random.key(1)
    hp = o + jax.random.uniform(key, (o.shape[0], 1), minval=2.0,
                                maxval=14.0) * d
    di = jax.random.normal(jax.random.key(2), o.shape)
    di = di / jnp.linalg.norm(di, axis=-1, keepdims=True)

    spans, k = karras_spans(bvh)
    packings = {
        "fixed-128-runs": fixed_blocks(ps),
        "treelet-1span": blocks_from_spans(bvh, spans, k, False),
        "treelet-greedy": blocks_from_spans(bvh, spans, k, True),
    }
    for nm, (lo, hi, real) in packings.items():
        print(f"{nm}: {len(lo)} blocks, {real.sum()} real slots, "
              f"fill={real.mean():.0f}/128", flush=True)

    for rays_nm, (oo, dd) in [("coherent", (o, d)),
                              ("incoherent", (hp, di))]:
        os_, ds_, tc_, _, _ = pk._sort_pad_rays(
            bvh.lo[0], bvh.hi[0], oo, dd, t_cap)
        nt = os_.shape[0] // pk.TILE
        ot = os_.reshape(nt, pk.TILE, 3)
        dt = ds_.reshape(nt, pk.TILE, 3)
        tct = tc_.reshape(nt, pk.TILE)
        inv = pk._safe_inv(dt)
        print(f"== {rays_nm} ({nt} tiles) ==", flush=True)
        for nm, (lo, hi, real) in packings.items():
            listed, slots = count_work(ot, inv, tct, lo, hi, real)
            print(f"  {nm:16s} listed-blocks={listed:>8,} "
                  f"MT-equivalent={listed*128*128/1e6:,.0f}M "
                  f"real-slot-tests={slots*128/1e6:,.0f}M", flush=True)


if __name__ == "__main__":
    main()
