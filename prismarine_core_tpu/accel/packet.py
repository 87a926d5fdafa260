"""Packet (tile x block) intersector — the dense, TPU-shaped fast path.

The skip-link walk (accel/traverse.py) is correct but latency-bound: every
step is a data-dependent gather of ~4 bytes/lane from HBM, which TPUs
execute at a tiny fraction of streaming bandwidth.  This module replaces
pointer-chasing with dense compute, the classic packet-tracing idea
re-shaped for the VPU/MXU:

1. rays sort by (direction octant, origin Morton) and group into TILES of
   128 contiguous rays (the analog of the reference's optional ray
   sorting, ``Pipeline.hpp:101``, taken to its logical end);
2. triangles are already Morton-sorted by the BVH build; consecutive runs
   of 128 slots form BLOCKS with precomputed AABBs (a coarse level of the
   same implicit tree);
3. a conservative interval-arithmetic slab test culls [tiles x blocks]
   densely — one vectorized op, no tree walk at all;
4. surviving (tile, block) pairs run dense 128x128 Möller–Trumbore with
   *contiguous* ray and triangle loads, scheduled as a while_loop over
   each tile's m-th overlapping block (trip count = max blocks/tile, a
   data-dependent scalar — no recompilation);
5. per-ray closest hits fold across blocks, then unsort.

Every memory access is a contiguous 128-row slice; all hot math is dense
[tile, block] broadcasting that XLA fuses into the block-min reduction.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from prismarine_core_tpu.accel.lbvh import BVH, EMPTY_BOX
from prismarine_core_tpu.models.geometry import TriangleSoup
from prismarine_core_tpu.ops.intersect import Hit, moller_trumbore
from prismarine_core_tpu.utils.config import INF_DIST, PZERO

TILE = 128      # rays per tile
BLOCK = 128     # triangle slots per block


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PacketSet:
    """Block-level view over the BVH's Morton-sorted triangle slots.

    Includes SoA component planes of the sorted triangles (positions +
    precomputed edges) shaped [nb, BLOCK] — the exact VMEM layout the
    Pallas pair kernel consumes (ops/pallas_intersect.py)."""

    block_lo: jax.Array  # f32[B,3]
    block_hi: jax.Array  # f32[B,3]
    #: f32[B+1, 16, BLOCK] component rows: v0xyz, e1xyz, e2xyz, valid,
    #: pad; the extra trailing block is all-zero (the quad-padding
    #: sentinel: valid=0 so it never hits)
    planes: jax.Array
    slot_orig: jax.Array  # i32[B*BLOCK] slot -> original triangle id

    @property
    def n_blocks(self) -> int:
        return self.block_lo.shape[0]


def build_packet_set(bvh: BVH) -> PacketSet:
    """Block AABBs + SoA triangle planes (build-time, fully jittable)."""
    s = bvh.tv0.shape[0]
    bk = BLOCK
    nb = max(-(-s // bk), 1)
    pad = nb * bk - s
    big = jnp.float32(EMPTY_BOX)

    def padded(a, fill=0.0):
        if pad:
            widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, widths, constant_values=fill)
        return a

    tv0 = padded(bvh.tv0)
    tv1 = padded(bvh.tv1)
    tv2 = padded(bvh.tv2)
    orig = padded(bvh.orig, -1)

    valid = (orig >= 0)[:, None]
    slo = jnp.where(valid, jnp.minimum(jnp.minimum(tv0, tv1), tv2), big)
    shi = jnp.where(valid, jnp.maximum(jnp.maximum(tv0, tv1), tv2), -big)
    block_lo = slo.reshape(nb, bk, 3).min(axis=1)
    block_hi = shi.reshape(nb, bk, 3).max(axis=1)
    # empty blocks -> far point box (always misses the overlap test)
    empty = (block_lo > block_hi).any(-1, keepdims=True)
    block_lo = jnp.where(empty, big, block_lo)
    block_hi = jnp.where(empty, big, block_hi)

    e1 = tv1 - tv0
    e2 = tv2 - tv0
    rows = [tv0[:, 0], tv0[:, 1], tv0[:, 2],
            e1[:, 0], e1[:, 1], e1[:, 2],
            e2[:, 0], e2[:, 1], e2[:, 2],
            (orig >= 0).astype(jnp.float32)]
    rows += [jnp.zeros_like(rows[0])] * (16 - len(rows))
    planes = jnp.stack([x.reshape(nb, bk) for x in rows], axis=1)
    # trailing zero sentinel block for quad padding (valid row = 0)
    planes = jnp.concatenate(
        [planes, jnp.zeros((1, 16, bk), jnp.float32)])
    return PacketSet(block_lo=block_lo, block_hi=block_hi,
                     planes=planes, slot_orig=orig)


def _interval_overlap(o_lo, o_hi, inv_lo, inv_hi, blk_lo, blk_hi, t_hi):
    """Conservative tile-frustum vs block-AABB test.

    All tile quantities are [T,1,3] intervals, blocks [1,B,3]; returns
    [T,B] bool that is True whenever ANY ray in the tile could hit.
    Interval slab test: entry/exit times bound by interval products.
    """
    # candidate products of interval endpoints (4 per axis per face)
    def prods(a_lo, a_hi):
        p1 = a_lo * inv_lo
        p2 = a_lo * inv_hi
        p3 = a_hi * inv_lo
        p4 = a_hi * inv_hi
        return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))

    # slab k entered between (blk_lo - o) and (blk_hi - o) times inv_d
    a_lo = blk_lo - o_hi          # min of (blk_lo - o)
    a_hi = blk_lo - o_lo
    b_lo = blk_hi - o_hi
    b_hi = blk_hi - o_lo
    lo1, hi1 = prods(a_lo, a_hi)
    lo2, hi2 = prods(b_lo, b_hi)
    t0_lo = jnp.minimum(lo1, lo2)     # earliest any ray can enter slab
    t1_hi = jnp.maximum(hi1, hi2)     # latest any ray can leave slab
    tn = jnp.max(t0_lo, axis=-1)      # over xyz
    tf = jnp.min(t1_hi, axis=-1)
    return (tf >= jnp.maximum(tn, 0.0)) & (tn <= t_hi)


def _per_ray_tile_overlap(ot, dt, tct, sb_lo, sb_hi,
                          chunk: int = 64):
    """Exact per-tile candidate mask: a tile lists a superblock iff some
    ray in it actually passes the slab test.

    Replaces the conservative interval-frustum test for the Pallas path:
    incoherent (bounce) tiles have wide direction cones, and the frustum
    bound degenerates toward 'every block'; testing the 128 rays
    individually and OR-reducing is a few Gflop of dense VPU work and
    shrinks pair counts by an order of magnitude.
    """
    nt = ot.shape[0]
    nb = sb_lo.shape[0]
    pad = (-nt) % chunk
    if pad:
        zot = jnp.zeros((pad,) + ot.shape[1:], ot.dtype)
        ot = jnp.concatenate([ot, zot])
        dt = jnp.concatenate([dt, jnp.ones_like(zot)])
        tct = jnp.concatenate(
            [tct, jnp.zeros((pad,) + tct.shape[1:], tct.dtype)])

    inv = 1.0 / jnp.where(jnp.abs(dt) < 1e-12,
                          jnp.where(dt < 0, -1e-12, 1e-12), dt)

    def step(_, args):
        o_c, inv_c, tc_c = args                     # [C, TILE, ...]
        t0 = (sb_lo[None, None] - o_c[:, :, None]) * inv_c[:, :, None]
        t1 = (sb_hi[None, None] - o_c[:, :, None]) * inv_c[:, :, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)  # [C, TILE, nsb]
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit = (tf >= jnp.maximum(tn, 0.0)) & (tn <= tc_c[:, :, None])
        return None, jnp.any(hit, axis=1)           # [C, nsb]

    n_chunks = ot.shape[0] // chunk
    _, out = jax.lax.scan(
        step, None,
        (ot.reshape(n_chunks, chunk, TILE, 3),
         inv.reshape(n_chunks, chunk, TILE, 3),
         tct.reshape(n_chunks, chunk, TILE)))
    return out.reshape(-1, nb)[:nt]


def _ray_sort_keys(root_lo, root_hi, o, d):
    """Coherence key: octant(3b) ++ origin-Morton(15b) ++
    direction-Morton(12b).

    Bounce rays share origins but scatter in direction; without the
    direction bits a tile's frustum covers a whole octant of directions
    and its conservative overlap list approaches *every* block.  Binning
    by |d| within the octant (4 bits/axis) tightens tile cones to ~20
    degrees, collapsing the pair count for incoherent queries.
    """
    from prismarine_core_tpu.ops.morton import morton30
    unit = jnp.clip((o - root_lo)
                    / jnp.maximum(root_hi - root_lo, 1e-6), 0.0, 1.0)
    om = morton30((unit * 31.0).astype(jnp.uint32))        # 15 bits
    dm = morton30((jnp.abs(d) * 15.0).astype(jnp.uint32))  # 12 bits
    octant = ((d[:, 0] >= 0).astype(jnp.uint32)
              | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
              | ((d[:, 2] >= 0).astype(jnp.uint32) << 2))
    return (octant << 27) | (om << 12) | (dm & 0xFFF)


def _packet_core(bvh: BVH, ps: PacketSet, o, d, t_cap, any_hit: bool):
    """Sorted-ray packet query. o/d/t_cap padded to a multiple of TILE."""
    r = o.shape[0]
    nt = r // TILE
    nb = ps.n_blocks
    s = bvh.tv0.shape[0]
    bk = min(BLOCK, s)

    ot = o.reshape(nt, TILE, 3)
    dt = d.reshape(nt, TILE, 3)
    tct = t_cap.reshape(nt, TILE)

    # tile intervals
    o_lo = ot.min(axis=1)[:, None, :]
    o_hi = ot.max(axis=1)[:, None, :]
    inv = 1.0 / jnp.where(jnp.abs(dt) < 1e-12,
                          jnp.where(dt < 0, -1e-12, 1e-12), dt)
    inv_lo = inv.min(axis=1)[:, None, :]
    inv_hi = inv.max(axis=1)[:, None, :]
    t_hi = tct.max(axis=1)[:, None]

    overlap = _interval_overlap(
        o_lo, o_hi, inv_lo, inv_hi,
        ps.block_lo[None, :, :], ps.block_hi[None, :, :], t_hi)  # [T,B]

    counts = overlap.sum(axis=1).astype(jnp.int32)               # [T]
    # per-tile list of overlapping block ids, hits first (stable sort on
    # ~overlap keeps ascending block order within each class)
    keys = (~overlap).astype(jnp.int32)
    blk_ids = jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32),
                               (nt, nb))
    _, blk_list = jax.lax.sort((keys, blk_ids), dimension=1, num_keys=1,
                               is_stable=True)                   # [T,B]
    max_m = jnp.max(counts)

    tv0, tv1, tv2 = bvh.tv0, bvh.tv1, bvh.tv2
    orig = bvh.orig

    def get_block(base, arr, width):
        return jax.lax.dynamic_slice(arr, (base, 0), (bk, width))

    def cond(state):
        m = state[0]
        done_all = state[5]
        return (m < max_m) & ~done_all

    def body(state):
        m, bt, bslot, bu, bv, _ = state
        blk = blk_list[:, m]                                     # [T]
        live = m < counts                                        # [T]
        base = jnp.where(live, blk, 0) * bk

        b0 = jax.vmap(lambda b: get_block(b, tv0, 3))(base)      # [T,bk,3]
        b1 = jax.vmap(lambda b: get_block(b, tv1, 3))(base)
        b2 = jax.vmap(lambda b: get_block(b, tv2, 3))(base)
        bo = jax.vmap(lambda b: jax.lax.dynamic_slice(orig, (b,), (bk,))
                      )(base)                                    # [T,bk]

        tt, tu, tv_, ok = moller_trumbore(
            ot[:, :, None, :], dt[:, :, None, :],
            b0[:, None, :, :], b1[:, None, :, :], b2[:, None, :, :])
        ok = ok & (bo[:, None, :] >= 0) & live[:, None, None]
        tt = jnp.where(ok & (tt < bt[:, :, None]), tt, INF_DIST)
        j = jnp.argmin(tt, axis=2)                               # [T,TILE]
        tj = jnp.take_along_axis(tt, j[:, :, None], axis=2)[:, :, 0]
        better = tj < bt
        slot_j = base[:, None] + j
        bt = jnp.where(better, tj, bt)
        bslot = jnp.where(better, slot_j, bslot)
        bu = jnp.where(
            better,
            jnp.take_along_axis(tu, j[:, :, None], axis=2)[:, :, 0], bu)
        bv = jnp.where(
            better,
            jnp.take_along_axis(tv_, j[:, :, None], axis=2)[:, :, 0], bv)
        done_all = jnp.array(False)
        if any_hit:
            done_all = jnp.all(bslot >= 0)  # every lane shadowed already
        return (m + 1, bt, bslot, bu, bv, done_all)

    init = (
        jnp.int32(0),
        tct.astype(jnp.float32),
        jnp.full((nt, TILE), -1, jnp.int32),
        jnp.zeros((nt, TILE), jnp.float32),
        jnp.zeros((nt, TILE), jnp.float32),
        jnp.array(False),
    )
    _, bt, bslot, bu, bv, _ = jax.lax.while_loop(cond, body, init)
    return (bt.reshape(r), bslot.reshape(r), bu.reshape(r),
            bv.reshape(r))


def _build_pairs(overlap):
    """Compact the [T,B] overlap mask into a tile-major pair list.

    Returns (pair_tile, pair_block, n_real) with static length T*B (the
    exact worst case — execution cost adapts to ``n_real``, see the
    windowed kernel driver); padded entries target tile index T.
    """
    nt, nb = overlap.shape
    flat = overlap.reshape(-1)                      # tile-major order
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    total = pos[-1] + 1
    tile_of = (jnp.arange(nt * nb, dtype=jnp.int32) // nb)
    block_of = (jnp.arange(nt * nb, dtype=jnp.int32) % nb)
    target = jnp.where(flat, pos, nt * nb)
    pair_tile = jnp.full((nt * nb + 1,), nt, jnp.int32).at[target].set(
        tile_of, mode="drop")[:nt * nb]
    pair_block = jnp.zeros((nt * nb + 1,), jnp.int32).at[target].set(
        block_of, mode="drop")[:nt * nb]
    return pair_tile, pair_block, total


def _build_quads(overlap):
    """Chunk each tile's culled-block list into quads of 4.

    overlap: bool[nt, nb].  Returns (quad_tile i32[Lq],
    quad_blocks i32[Lq, 4], n_quads) with static Lq = nt * ceil(nb/4);
    padded quads target tile nt / the sentinel block nb.

    Sort-free: per-row cumsum ranks each hit block within its tile and a
    single flat scatter drops block ids into their quad slots (the
    ranking a GPU gets from warp ballot+popcount, ``ballotlib.glsl:
    106-132``, done as two linear passes instead of the [nt, nb] sort
    this used to do — the sort was the single hottest op of a query).
    """
    nt, nb = overlap.shape
    nq_tile = -(-nb // 4)
    lq = nt * nq_tile

    # rank of each hit block within its tile row
    pos = jnp.cumsum(overlap.astype(jnp.int32), axis=1) - 1  # [nt, nb]
    counts = pos[:, -1] + 1                                  # [nt]

    # scatter block ids straight into [lq, 4] quad slots (tile-major)
    tile_idx = jnp.arange(nt, dtype=jnp.int32)[:, None]
    flat_dest = ((tile_idx * nq_tile + pos // 4) * 4 + pos % 4)
    flat_dest = jnp.where(overlap, flat_dest, lq * 4)        # drop misses
    blk_ids = jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32), (nt, nb))
    qb_all = jnp.full((lq * 4 + 1,), nb, jnp.int32).at[
        flat_dest.reshape(-1)].set(blk_ids.reshape(-1),
                                   mode="drop")[:lq * 4].reshape(lq, 4)

    # compact used (tile, m) quad slots to the front, tile-major
    qc = -(-counts // 4)                                     # quads/tile
    mask = (jnp.arange(nq_tile, dtype=jnp.int32)[None, :]
            < qc[:, None]).reshape(-1)
    cpos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    n_quads = cpos[-1] + 1
    target = jnp.where(mask, cpos, lq)
    tile_of = jnp.arange(lq, dtype=jnp.int32) // nq_tile
    quad_tile = jnp.full((lq + 1,), nt, jnp.int32).at[target].set(
        tile_of, mode="drop")[:lq]
    slot_of = jnp.arange(lq, dtype=jnp.int32)
    quad_slot = jnp.zeros((lq + 1,), jnp.int32).at[target].set(
        slot_of, mode="drop")[:lq]
    qb = jnp.where((quad_tile < nt)[:, None], qb_all[quad_slot], nb)
    return quad_tile, qb, n_quads


def _run_packet_pallas(bvh: BVH, ps: PacketSet, o, d, t_cap,
                       any_hit: bool, window: int = 2048):
    """Pallas fast path: sort+tile rays, cull blocks per ray, chunk
    into quads, run the windowed quad kernel
    (ops/pallas_intersect.py), unsort."""
    from prismarine_core_tpu.ops.pallas_intersect import (
        pallas_quad_intersect_windowed)

    r = o.shape[0]
    keys = _ray_sort_keys(bvh.lo[0], bvh.hi[0], o, d)
    iota = jnp.arange(r, dtype=jnp.int32)
    _, perm = jax.lax.sort((keys, iota), num_keys=1)
    inv_perm = jnp.zeros((r,), jnp.int32).at[perm].set(iota)
    o, d, t_cap = o[perm], d[perm], t_cap[perm]

    pad = (-r) % TILE
    if pad:
        o = jnp.concatenate([o, jnp.tile(jnp.asarray([[0.0, 0.0, 1e8]]),
                                         (pad, 1))])
        d = jnp.concatenate([d, jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]),
                                         (pad, 1))])
        t_cap = jnp.concatenate([t_cap, jnp.zeros((pad,))])
    rp = r + pad
    nt = rp // TILE

    ot = o.reshape(nt, TILE, 3)
    dt = d.reshape(nt, TILE, 3)
    tct = t_cap.reshape(nt, TILE)

    # exact per-ray culling at BLOCK granularity
    overlap = _per_ray_tile_overlap(ot, dt, tct, ps.block_lo,
                                    ps.block_hi)
    counts = overlap.sum(axis=1).astype(jnp.int32)
    quad_tile, quad_blocks, n_quads = _build_quads(overlap)

    # rays layout [(nt+1)*TILE, 8]: component columns + one padding tile
    rays = jnp.zeros((nt + 1, TILE, 8), jnp.float32)
    rays = rays.at[:nt, :, 0].set(ot[:, :, 0])
    rays = rays.at[:nt, :, 1].set(ot[:, :, 1])
    rays = rays.at[:nt, :, 2].set(ot[:, :, 2])
    rays = rays.at[:nt, :, 3].set(dt[:, :, 0])
    rays = rays.at[:nt, :, 4].set(dt[:, :, 1])
    rays = rays.at[:nt, :, 5].set(dt[:, :, 2])
    rays = rays.at[:nt, :, 6].set(tct)
    rays = rays.reshape((nt + 1) * TILE, 8)

    # pad the quad list to a window multiple so dynamic_slice never clamps
    nb = ps.n_blocks
    window = min(window, int(quad_tile.shape[0]))
    wpad = (-int(quad_tile.shape[0])) % window
    if wpad:
        quad_tile = jnp.concatenate(
            [quad_tile, jnp.full((wpad,), nt, jnp.int32)])
        quad_blocks = jnp.concatenate(
            [quad_blocks, jnp.full((wpad, 4), nb, jnp.int32)])
    out = pallas_quad_intersect_windowed(
        quad_tile, quad_blocks, n_quads, rays, ps.planes, window=window,
        any_hit=any_hit)
    out = out.reshape(nt + 1, TILE, 8)[:nt]
    t = out[:, :, 0]
    slot = jax.lax.bitcast_convert_type(out[:, :, 1], jnp.int32)
    u = out[:, :, 2]
    v = out[:, :, 3]

    # tiles never visited by any pair keep garbage — fix them up
    no_pair = (counts == 0)[:, None]
    t = jnp.where(no_pair, tct, t)
    slot = jnp.where(no_pair, -1, slot)
    u = jnp.where(no_pair, 0.0, u)
    v = jnp.where(no_pair, 0.0, v)

    t, slot, u, v = (x.reshape(rp)[:r] for x in (t, slot, u, v))
    return (t[inv_perm], slot[inv_perm], u[inv_perm], v[inv_perm])


def _run_packet(bvh: BVH, ps: PacketSet, o, d, t_cap, any_hit: bool):
    """Sort rays, pad to a tile multiple, run the packet core, unsort."""
    r = o.shape[0]
    keys = _ray_sort_keys(bvh.lo[0], bvh.hi[0], o, d)
    iota = jnp.arange(r, dtype=jnp.int32)
    _, perm = jax.lax.sort((keys, iota), num_keys=1)
    inv_perm = jnp.zeros((r,), jnp.int32).at[perm].set(iota)
    o, d, t_cap = o[perm], d[perm], t_cap[perm]

    pad = (-r) % TILE
    if pad:
        o = jnp.concatenate([o, jnp.tile(jnp.asarray([[0.0, 0.0, 1e8]]),
                                         (pad, 1))])
        d = jnp.concatenate([d, jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]),
                                         (pad, 1))])
        t_cap = jnp.concatenate([t_cap, jnp.zeros((pad,))])

    t, slot, u, v = _packet_core(bvh, ps, o, d, t_cap, any_hit)
    t, slot, u, v = t[:r], slot[:r], u[:r], v[:r]
    return t[inv_perm], slot[inv_perm], u[inv_perm], v[inv_perm]


def intersect_closest_packet(bvh: BVH, ps: PacketSet, soup: TriangleSoup,
                             o, d) -> Hit:
    """Closest hit via packets; differentiable like the BVH path (detached
    discrete hit + differentiable re-evaluation)."""
    sg = jax.lax.stop_gradient
    _, slot, _, _ = _run_packet(
        sg(bvh), sg(ps), sg(o), sg(d),
        jnp.full((o.shape[0],), INF_DIST), any_hit=False)
    tri = jnp.where(slot >= 0, bvh.orig[jnp.maximum(slot, 0)], -1)
    tri = sg(tri)

    trix = jnp.maximum(tri, 0)
    t, u, v, _ = moller_trumbore(
        o, d, soup.v0[trix], soup.v1[trix], soup.v2[trix])
    hitm = tri >= 0
    return Hit(
        t=jnp.where(hitm, t, INF_DIST),
        tri=tri,
        u=jnp.where(hitm, u, 0.0),
        v=jnp.where(hitm, v, 0.0),
    )


def occluded_packet(bvh: BVH, ps: PacketSet, soup: TriangleSoup,
                    o, d, t_max):
    sg = jax.lax.stop_gradient
    _, slot, _, _ = _run_packet(sg(bvh), sg(ps), sg(o), sg(d), sg(t_max),
                                any_hit=True)
    return slot >= 0


def intersect_closest_pallas(bvh: BVH, ps: PacketSet, soup: TriangleSoup,
                             o, d, t_cap=None) -> Hit:
    """Closest hit via the Pallas pair kernel (fast path).

    ``t_cap`` (f32[R], optional): per-lane far limit; lanes with 0 are
    culled out of the pair lists entirely (dead-lane compaction)."""
    sg = jax.lax.stop_gradient
    if t_cap is None:
        t_cap = jnp.full((o.shape[0],), INF_DIST)
    _, slot, _, _ = _run_packet_pallas(
        sg(bvh), sg(ps), sg(o), sg(d), sg(t_cap), any_hit=False)
    tri = jnp.where(slot >= 0, bvh.orig[jnp.maximum(slot, 0)], -1)
    tri = sg(tri)

    trix = jnp.maximum(tri, 0)
    t, u, v, _ = moller_trumbore(
        o, d, soup.v0[trix], soup.v1[trix], soup.v2[trix])
    hitm = tri >= 0
    return Hit(
        t=jnp.where(hitm, t, INF_DIST),
        tri=tri,
        u=jnp.where(hitm, u, 0.0),
        v=jnp.where(hitm, v, 0.0),
    )


def occluded_pallas(bvh: BVH, ps: PacketSet, soup: TriangleSoup,
                    o, d, t_max):
    sg = jax.lax.stop_gradient
    _, slot, _, _ = _run_packet_pallas(sg(bvh), sg(ps), sg(o), sg(d),
                                       sg(t_max), any_hit=True)
    return slot >= 0
