"""Packet (tile x superblock) intersector — the dense, TPU-shaped fast path.

The skip-link walk (accel/traverse.py) is correct but latency-bound: every
step is a data-dependent gather of ~4 bytes/lane from HBM, which TPUs
execute at a tiny fraction of streaming bandwidth.  This module replaces
pointer-chasing with dense compute, the classic packet-tracing idea
re-shaped for the VPU:

1. rays sort by (direction octant, origin Morton, direction Morton) and
   group into TILES of 128 contiguous rays (the analog of the reference's
   optional ray sorting, ``Pipeline.hpp:101``, taken to its logical end);
   the kernel ray matrix is built unsorted and permuted with ONE
   64-byte-row gather (``_sorted_rays_matrix``, a measured 7% of the
   round-3 frame);
2. triangles are already Morton-sorted by the BVH build; consecutive runs
   of 128 slots form BLOCKS and runs of SB=8 blocks form SUPERBLOCKS with
   precomputed AABBs (two coarse levels of the same implicit tree);
3. the dense cull runs at BLOCK granularity in a Pallas kernel
   (ops/pallas_cull.py): per-(tile, block) entry distances in one
   pass, from which superblock candidates, front-to-back bounds AND
   the per-pair 8-bit block masks all derive (the round-3 XLA
   superblock scan + separate windowed mask stage remain as the
   ``cull_impl="xla"`` fallback);
4. surviving (tile, superblock) pairs compact via ONE windowed packed
   scatter bounded by the live-tile prefix (masks ride along as code
   bits) and execute FRONT-TO-BACK through the fused Pallas kernel
   (ops/pallas_intersect.py) under one of two strategies
   (``_run_packet_pallas``): "two_round" for closest-hit (K nearest
   superblocks per tile, then one per-ray re-cull of the rest against
   the tightened caps) and "rounds" for any-hit (fully ordered
   K-at-a-time rounds with exact cap-based exit); ``pairs_per_step``
   consecutive same-tile pairs share each kernel grid step;
5. per-ray closest hits fold across pairs in the kernel's VMEM
   accumulator (deferred argmin: one cross-lane reduction per step),
   then unsort.

Every memory access is a contiguous 128-row slice; all hot math is dense
broadcasting that XLA/Mosaic fuse into the block-min reduction.
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
SB = 8      # blocks per superblock (dense-cull granularity)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PacketSet:
    """Block/superblock-level view over the BVH's Morton-sorted triangle
    slots.

    ``planes`` holds SoA component planes of the sorted triangles
    (positions + precomputed edges) in superblock-contiguous layout —
    the exact VMEM stream the fused Pallas kernel consumes
    (ops/pallas_intersect.py).  The block count pads to a multiple of
    SB; padding blocks carry far-point AABBs (never pass a slab test)
    and invalid planes."""

    block_lo: jax.Array  # f32[B,3]
    block_hi: jax.Array  # f32[B,3]
    sb_lo: jax.Array     # f32[B/SB,3] superblock AABB min
    sb_hi: jax.Array     # f32[B/SB,3]
    #: f32[B/SB + 1, 16, SB*BLOCK] component rows: v0xyz, e1xyz, e2xyz,
    #: valid, pad; sub-block k on lanes [128k, 128k+128).  The trailing
    #: superblock is all-zero (the pair-padding sentinel: valid=0).
    planes: jax.Array
    slot_orig: jax.Array  # i32[B*BLOCK] slot -> original triangle id

    @property
    def n_blocks(self) -> int:
        return self.block_lo.shape[0]

    @property
    def n_superblocks(self) -> int:
        return self.sb_lo.shape[0]


def build_packet_set(bvh: BVH) -> PacketSet:
    """Block/superblock AABBs + SoA triangle planes (build-time, fully
    jittable)."""
    s = bvh.tv0.shape[0]
    bk = BLOCK
    assert s % bk == 0, "slot count must be a multiple of BLOCK (lbvh pads)"
    nb = -(-(s // bk) // SB) * SB   # pad block count to superblock size
    nsb = nb // SB
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

    # superblock AABBs (union of SB consecutive blocks; far point boxes
    # stay far, so fully-empty superblocks remain point boxes)
    sb_lo = block_lo.reshape(nsb, SB, 3).min(axis=1)
    sb_hi = block_hi.reshape(nsb, SB, 3).max(axis=1)

    e1 = tv1 - tv0
    e2 = tv2 - tv0
    rows = [tv0[:, 0], tv0[:, 1], tv0[:, 2],
            e1[:, 0], e1[:, 1], e1[:, 2],
            e2[:, 0], e2[:, 1], e2[:, 2],
            (orig >= 0).astype(jnp.float32)]
    rows += [jnp.zeros_like(rows[0])] * (16 - len(rows))
    planes = jnp.stack([x.reshape(nb, bk) for x in rows], axis=1)
    # superblock-contiguous layout + trailing zero sentinel superblock
    planes = planes.reshape(nsb, SB, 16, bk).transpose(0, 2, 1, 3)
    planes = planes.reshape(nsb, 16, SB * bk)
    planes = jnp.concatenate(
        [planes, jnp.zeros((1, 16, SB * bk), jnp.float32)])

    return PacketSet(block_lo=block_lo, block_hi=block_hi,
                     sb_lo=sb_lo, sb_hi=sb_hi,
                     planes=planes, slot_orig=orig)


def _safe_inv(d):
    return 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                           jnp.where(d < 0, -1e-12, 1e-12), d)


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


def _per_ray_tile_overlap(ot, inv, tct, box_lo, box_hi,
                          chunk: int = 32, return_tn: bool = False):
    """Exact per-tile candidate mask at ``box`` granularity: a tile lists
    a box iff some ray in it actually passes the slab test.

    Replaces a conservative interval-frustum test: incoherent (bounce)
    tiles have wide direction cones, and the frustum bound degenerates
    toward 'every box'; testing the 128 rays individually and
    OR-reducing is dense VPU work that XLA fuses into the reduction.
    Dead lanes (t_cap == 0) contribute nothing.

    ``return_tn``: also return f32[nt, nbx] — the min entry distance
    over the tile's hitting rays (INF_DIST where none) — used to pick
    each tile's nearest superblock for the two-pass ordered query.
    """
    nt = ot.shape[0]
    nbx = box_lo.shape[0]
    pad = (-nt) % chunk
    if pad:
        zot = jnp.zeros((pad,) + ot.shape[1:], ot.dtype)
        ot = jnp.concatenate([ot, zot])
        inv = jnp.concatenate([inv, jnp.ones_like(zot)])
        tct = jnp.concatenate(
            [tct, jnp.zeros((pad,) + tct.shape[1:], tct.dtype)])

    def step(_, args):
        o_c, inv_c, tc_c = args                     # [C, TILE, ...]
        t0 = (box_lo[None, None] - o_c[:, :, None]) * inv_c[:, :, None]
        t1 = (box_hi[None, None] - o_c[:, :, None]) * inv_c[:, :, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)  # [C, TILE, nbx]
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        # tc > 0 term: lanes with a zero cap are DEAD and must produce
        # no pairs even when their origin sits inside a box (tn < 0)
        hit = ((tf >= jnp.maximum(tn, 0.0))
               & (tn <= tc_c[:, :, None]) & (tc_c[:, :, None] > 0.0))
        any_hit = jnp.any(hit, axis=1)               # [C, nbx]
        if not return_tn:
            return None, (any_hit,)
        tn_min = jnp.min(
            jnp.where(hit, jnp.maximum(tn, 0.0), INF_DIST), axis=1)
        return None, (any_hit, tn_min)

    n_chunks = ot.shape[0] // chunk
    _, outs = jax.lax.scan(
        step, None,
        (ot.reshape(n_chunks, chunk, TILE, 3),
         inv.reshape(n_chunks, chunk, TILE, 3),
         tct.reshape(n_chunks, chunk, TILE)))
    outs = tuple(o.reshape(-1, nbx)[:nt] for o in outs)
    return outs if return_tn else outs[0]


def _block_masks(ot, inv, tct, pair_tile, pair_sb, n_pairs,
                 block_lo, block_hi, window: int = 4096):
    """Per-pair 8-bit block mask: bit k set iff some ray of the pair's
    tile slab-passes block ``sb*SB + k``.

    The second cull level, run over the compacted pair list in windows
    (cost adapts to the survivor count).  Writes are contiguous
    ``dynamic_update_slice`` windows — no scatters (the r1 quad builder's
    ~15M-element scatters were the single hottest stage of a query).
    The kernel consumes the mask as a scalar-prefetch array and skips
    masked-off sub-blocks with cheap SMEM-side predication.
    """
    nt = ot.shape[0]
    nsb = block_lo.shape[0] // SB
    sblk_lo = block_lo.reshape(nsb, SB, 3)
    sblk_hi = block_hi.reshape(nsb, SB, 3)
    lw = pair_tile.shape[0]
    window = min(window, lw)
    wpad = (-lw) % window
    if wpad:
        pair_tile = jnp.concatenate(
            [pair_tile, jnp.full((wpad,), nt, jnp.int32)])
        pair_sb = jnp.concatenate(
            [pair_sb, jnp.full((wpad,), nsb, jnp.int32)])

    # sentinel tile nt: zero rays with t_cap 0 -> no bits set
    otp = jnp.concatenate([ot, jnp.zeros((1, TILE, 3), ot.dtype)])
    invp = jnp.concatenate([inv, jnp.ones((1, TILE, 3), inv.dtype)])
    tctp = jnp.concatenate([tct, jnp.zeros((1, TILE), tct.dtype)])
    bits = (1 << jnp.arange(SB, dtype=jnp.int32))[None, :]

    def cond(state):
        return state[0] < n_pairs

    def body(state):
        start, masks = state
        pt = jax.lax.dynamic_slice(pair_tile, (start,), (window,))
        psb = jax.lax.dynamic_slice(pair_sb, (start,), (window,))
        live = (start + jnp.arange(window, dtype=jnp.int32)) < n_pairs
        pt = jnp.where(live, pt, nt)
        psb = jnp.minimum(psb, nsb - 1)
        o_w = otp[pt]                                 # [W, TILE, 3]
        i_w = invp[pt]
        tc_w = tctp[pt]
        lo_w = sblk_lo[psb][:, None]                  # [W, 1, SB, 3]
        hi_w = sblk_hi[psb][:, None]
        t0 = (lo_w - o_w[:, :, None]) * i_w[:, :, None]
        t1 = (hi_w - o_w[:, :, None]) * i_w[:, :, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)    # [W, TILE, SB]
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit = ((tf >= jnp.maximum(tn, 0.0))
               & (tn <= tc_w[:, :, None]) & (tc_w[:, :, None] > 0.0))
        bm = jnp.any(hit, axis=1) & live[:, None]     # [W, SB]
        mw = jnp.sum(jnp.where(bm, bits, 0), axis=1)  # [W] i32
        masks = jax.lax.dynamic_update_slice(masks, mw, (start,))
        return start + window, masks

    masks0 = jnp.zeros((pair_tile.shape[0],), jnp.int32)
    _, masks = jax.lax.while_loop(cond, body, (jnp.int32(0), masks0))
    return masks[:lw]


def _compact_flat(flat, tile_of, sb_of, nt, nsb_sentinel):
    """Compact a flat candidate mask into a tile-major pair list.

    One cumsum + two scatters (the GPU analog is a ballot+popcount queue
    append, ``ballotlib.glsl:106-132``).  Padded entries ->
    (nt, sentinel)."""
    lw = flat.shape[0]
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    n_pairs = pos[-1] + 1
    target = jnp.where(flat, pos, lw)
    pair_tile = jnp.full((lw + 1,), nt, jnp.int32).at[target].set(
        tile_of, mode="drop", unique_indices=True)[:lw]
    pair_sb = jnp.full((lw + 1,), nsb_sentinel, jnp.int32).at[target].set(
        sb_of, mode="drop", unique_indices=True)[:lw]
    return pair_tile, pair_sb, n_pairs


def _compact_pairs(sb_mask, nsb_sentinel):
    """[nt, nsb] mask -> tile-major (pair_tile, pair_sb, n_pairs) with
    static length nt*nsb; padded entries -> (nt, sentinel)."""
    nt, nsb = sb_mask.shape
    lw = nt * nsb
    tile_of = jnp.arange(lw, dtype=jnp.int32) // nsb
    sb_of = jnp.arange(lw, dtype=jnp.int32) % nsb
    return _compact_flat(sb_mask.reshape(-1), tile_of, sb_of,
                         nt, nsb_sentinel)


def _compact_topk(cand, cand_ok, nt, nsb_sentinel):
    """[nt, K] per-tile candidate ids (+validity) -> tile-major pair
    list of static length nt*K — the round-1 compaction of the
    front-to-back query (K nearest superblocks per tile)."""
    k = cand.shape[1]
    lw = nt * k
    tile_of = jnp.arange(lw, dtype=jnp.int32) // k
    return _compact_flat(cand_ok.reshape(-1), tile_of, cand.reshape(-1),
                         nt, nsb_sentinel)


def _live_tile_bound(tct):
    """i32[]: 1 + index of the LAST tile holding any live lane.

    Dead lanes sort last (``_ray_sort_keys``), so for freshly-sorted
    queries this is the live-tile prefix length; for order-reusing
    shadow queries it is a correct (if looser) bound.  Cull and
    compaction cost scale with it instead of with nt."""
    live_t = (tct > 0.0).any(axis=1)
    idx = jnp.arange(live_t.shape[0], dtype=jnp.int32)
    return jnp.max(jnp.where(live_t, idx + 1, 0))


def _compact_codes(flat, codes, bound, sentinel, window: int = 1 << 18,
                   pos_of=None, out_len=None):
    """Windowed cumsum+scatter compaction of ``codes[flat]`` bounded by
    the live prefix.

    ``flat`` bool[lw] selects entries; positions >= ``bound`` must all
    be False (dead-tile suffix).  The while_loop trip count is
    ceil(bound / window), so late-bounce queries (mostly-dead tiles)
    pay a fraction of the full 1.8M-element scatter that round 3
    measured at ~44 ms/query.  ``pos_of`` (i32[lw], optional) overrides
    the packed output position of each selected entry (tile-aligned
    layouts); default is the running count.  Returns
    (packed i32[out_len or lw], n_set)."""
    lw = flat.shape[0]
    out_len = lw if out_len is None else out_len
    window = min(window, lw)
    wpad = (-lw) % window
    fi = flat.astype(jnp.int32)
    if wpad:
        fi = jnp.concatenate([fi, jnp.zeros((wpad,), jnp.int32)])
        codes = jnp.concatenate(
            [codes, jnp.full((wpad,), sentinel, jnp.int32)])
        if pos_of is not None:
            pos_of = jnp.concatenate(
                [pos_of, jnp.zeros((wpad,), jnp.int32)])
    out0 = jnp.full((out_len + 1,), sentinel, jnp.int32)

    def cond(state):
        start, _, _ = state
        return start < bound

    def body(state):
        start, total, out = state
        f = jax.lax.dynamic_slice(fi, (start,), (window,))
        c = jax.lax.dynamic_slice(codes, (start,), (window,))
        if pos_of is None:
            pos = total + jnp.cumsum(f) - f
        else:
            pos = jax.lax.dynamic_slice(pos_of, (start,), (window,))
        # unselected entries all land on the last slot (sliced off
        # below); the racy duplicate writes there are benign — same
        # precedent as _compact_flat
        target = jnp.where(f > 0, pos, out_len)
        out = out.at[target].set(c, mode="drop", unique_indices=True)
        return start + window, total + jnp.sum(f), out

    _, n_set, out = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), out0))
    return out[:out_len], n_set


def _compact_rows_masked(mask2d, sb2d, pm2d, nt, nsb, bound,
                         align: int = 1):
    """Generic masked row compaction: [nt, K] selection mask +
    superblock ids + 8-bit masks -> packed tile-major pair list via ONE
    windowed scatter (two when the id+mask packing exceeds 31 bits).

    ``align`` > 1 pads each tile's pair run to a multiple of ``align``
    with same-tile mask-0 entries, so the kernel can execute ``align``
    pairs per grid step without a step ever straddling tiles
    (pairs_per_step; worst-case padding nt*(align-1) entries at 8-bit
    mask density ~0).  ``pm2d=None`` skips the mask bits entirely and
    returns ``pm=None`` (the two-level-cull path derives masks AFTER
    compaction from the pair-driven refine kernel)."""
    rows, k = mask2d.shape
    lw = nt * k
    tb = max(nt, 1).bit_length()
    sbb = max(nsb, 1).bit_length()
    tile_of = jnp.arange(lw, dtype=jnp.int32) // k
    flat = mask2d.reshape(-1)
    sb_of = jnp.minimum(sb2d.reshape(-1), nsb)
    with_mask = pm2d is not None and tb + sbb + 8 <= 31
    assert with_mask or pm2d is None or tb + sbb <= 31, \
        "scene/ray count exceeds pair-packing range"
    shift = (sbb + 8) if with_mask else sbb
    if with_mask:
        codes = ((tile_of << shift) | (sb_of << 8)
                 | (pm2d.reshape(-1) & 0xFF))
    else:
        codes = (tile_of << shift) | sb_of
    sentinel = (nt << shift) | (nsb << 8 if with_mask else nsb)

    if align == 1:
        packed, n_pairs = _compact_codes(flat, codes, bound, sentinel)
        out_len = lw
    else:
        counts = mask2d.sum(axis=1).astype(jnp.int32)       # [nt]
        padded = -(-counts // align) * align
        poff = jnp.cumsum(padded) - padded                  # exclusive
        wrank = jnp.cumsum(mask2d.astype(jnp.int32), axis=1) - 1
        pos_of = (poff[:, None] + wrank).reshape(-1)
        out_len = lw + nt * (align - 1)
        packed, _ = _compact_codes(flat, codes, bound, sentinel,
                                   pos_of=pos_of, out_len=out_len)
        # intra-tile padding entries carry the RIGHT tile (mask 0, sb
        # sentinel) so aligned steps stay single-tile
        extra = align - 1
        tiles = jnp.arange(nt, dtype=jnp.int32)
        pad_code = ((tiles << shift)
                    | (nsb << 8 if with_mask else nsb))
        ppos = poff[:, None] + counts[:, None] \
            + jnp.arange(extra, dtype=jnp.int32)[None, :]
        pvalid = (counts[:, None]
                  + jnp.arange(extra, dtype=jnp.int32)[None, :]
                  ) < padded[:, None]
        tgt = jnp.where(pvalid, ppos, out_len).reshape(-1)
        packed = packed.at[tgt].set(
            jnp.broadcast_to(pad_code[:, None], (nt, extra)
                             ).reshape(-1), mode="drop")
        n_pairs = jnp.sum(padded)

    pt = packed >> shift
    psb = (packed >> 8 if with_mask else packed) & ((1 << sbb) - 1)
    if with_mask:
        return pt, psb, packed & 0xFF, n_pairs
    if pm2d is None:
        return pt, psb, None, n_pairs
    pm, _ = _compact_codes(
        flat, pm2d.reshape(-1), bound, 0,
        pos_of=None if align == 1 else pos_of, out_len=out_len)
    return pt, psb, pm, n_pairs


def _compact_pairs_masked(sb_mask, mask8, bound_rows, align: int = 1):
    """[nt, nsb] candidate mask + per-pair 8-bit block masks -> packed
    tile-major pair list.  Replaces _compact_pairs + _block_masks on
    the pallas-cull path: masks ride along as code bits, so no
    separate mask stage and no gathers."""
    nt, nsb = sb_mask.shape
    sb2d = jnp.broadcast_to(jnp.arange(nsb, dtype=jnp.int32),
                            (nt, nsb))
    bound = jnp.minimum(bound_rows * nsb, nt * nsb)
    return _compact_rows_masked(sb_mask, sb2d, mask8, nt, nsb, bound,
                                align=align)


def _compact_topk_masked(cand, cand_ok, pmask, nt, nsb,
                         align: int = 1):
    """[nt, K] per-tile candidates + validity + per-candidate 8-bit
    masks -> packed tile-major pair list."""
    return _compact_rows_masked(cand_ok, cand, pmask, nt, nsb,
                                nt * cand.shape[1], align=align)


def _tables_with_cap(tn_blk, cap_tile, nsb):
    """Re-derive (sb_mask, mask8) from saved block entry distances under
    TIGHTENED per-tile caps — the cheap two_round re-cull: blocks whose
    round-1 entry distance exceeds the tile's worst surviving cap can
    no longer contain a better hit.  Tile-granular (the kernel re-cull
    is per-ray exact); strictly conservative, so results are
    unchanged."""
    nt = tn_blk.shape[0]
    cap = cap_tile[:, None, None]
    blk = tn_blk[:, :nsb * SB].reshape(nt, nsb, SB)
    ok = (blk <= cap) & (cap > 0.0)
    bits = (1 << jnp.arange(SB, dtype=jnp.int32))[None, None, :]
    mask8 = jnp.sum(jnp.where(ok, bits, 0), axis=-1)
    return mask8 != 0, mask8


def _ray_sort_keys(root_lo, root_hi, o, d, t_cap=None):
    """Coherence key: dead(1b) ++ octant(3b) ++ origin-Morton(15b) ++
    direction-Morton(12b).

    Bounce rays share origins but scatter in direction; without the
    direction bits a tile's direction cone covers a whole octant and its
    overlap list approaches *every* superblock.  Binning by |d| within
    the octant (4 bits/axis) tightens tile cones to ~20 degrees,
    collapsing the pair count for incoherent queries.  Dead lanes
    (t_cap == 0) sort LAST: they concentrate into all-dead trailing
    tiles whose cull rows are empty, so late bounces (~50% dead) stop
    diluting live tiles' boxes and pair lists shrink with liveness.
    """
    from prismarine_core_tpu.ops.morton import morton30
    unit = jnp.clip((o - root_lo)
                    / jnp.maximum(root_hi - root_lo, 1e-6), 0.0, 1.0)
    om = morton30((unit * 31.0).astype(jnp.uint32))        # 15 bits
    dm = morton30((jnp.abs(d) * 15.0).astype(jnp.uint32))  # 12 bits
    octant = ((d[:, 0] >= 0).astype(jnp.uint32)
              | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
              | ((d[:, 2] >= 0).astype(jnp.uint32) << 2))
    keys = (octant << 27) | (om << 12) | (dm & 0xFFF)
    if t_cap is not None:
        keys = keys | ((t_cap <= 0.0).astype(jnp.uint32) << 31)
    return keys


def _packet_core(bvh: BVH, ps: PacketSet, o, d, t_cap, any_hit: bool):
    """Sorted-ray packet query. o/d/t_cap padded to a multiple of TILE.

    The pure-XLA packet path: conservative tile-frustum cull at block
    granularity, then a while_loop over each tile's m-th candidate block
    with dense [TILE, BLOCK] Möller–Trumbore.
    """
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
    inv = _safe_inv(dt)
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
        base = jnp.minimum(base, s - bk)  # padding blocks clamp into s

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


def _sort_pad_rays(root_lo, root_hi, o, d, t_cap, order=None,
                   mode: str = "full"):
    """Coherence-sort rays and pad to a TILE multiple.

    ``order`` (perm, inv_perm) reuses a previous query's sort — shadow
    rays originate at the closest-hit points, so the bounce query's
    origin-coherent order transfers to them and the (expensive) u32
    lax.sort is paid once per bounce, not once per query.

    ``mode`` trades sort cost against tile tightness (the full u32 sort
    was a measured 57 ms/query at 921k rays, PERF.md r3):

    * ``"full"``   — 2-array (key, iota) sort on the full 31-bit key.
    * ``"packed"`` — ONE-array u32 sort: the top ``32 - ceil_log2(R)``
      key bits become the bin, the low bits carry the ray index, so the
      permutation falls out of the sorted word itself.  Within a bin,
      rays keep image order (scanline-adjacent pixels stay adjacent).
    * ``"group"``  — sort GROUPS of 16 consecutive rays by their
      live-lane centroid key (16x fewer elements, full key width).
      Exact for any estimator; tightest when neighboring rays are
      already correlated (camera rays, coherent bounce sampling).

    Returns (o, d, t_cap, (perm, inv_perm), n_orig)."""
    r = o.shape[0]
    if order is None:
        order = _coherence_perm(root_lo, root_hi, o, d, t_cap, mode)
    perm, inv_perm = order
    o, d, t_cap = o[perm], d[perm], t_cap[perm]

    pad = (-r) % TILE
    if pad:
        o = jnp.concatenate([o, jnp.tile(jnp.asarray([[0.0, 0.0, 1e8]]),
                                         (pad, 1))])
        d = jnp.concatenate([d, jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]),
                                         (pad, 1))])
        t_cap = jnp.concatenate([t_cap, jnp.zeros((pad,))])
    return o, d, t_cap, (perm, inv_perm), r


def _coherence_perm(root_lo, root_hi, o, d, t_cap, mode: str = "full"):
    """(perm, inv_perm) of the coherence sort — key logic of
    _sort_pad_rays without any data gathers (callers that build the
    kernel ray matrix apply the permutation as ONE row gather)."""
    r = o.shape[0]
    if True:   # noqa: indentation kept shallow for the mode ladder
        iota = jnp.arange(r, dtype=jnp.int32)
        if mode == "group" and r % 16 == 0 and r >= 2048:
            g = 16
            ng = r // g
            live = (t_cap.reshape(ng, g) > 0.0)
            cnt = live.sum(axis=1)
            w = live[:, :, None].astype(jnp.float32)
            denom = jnp.maximum(cnt, 1).astype(jnp.float32)[:, None]
            oc = (o.reshape(ng, g, 3) * w).sum(axis=1) / denom
            dc = (d.reshape(ng, g, 3) * w).sum(axis=1) / denom
            keys_g = _ray_sort_keys(
                root_lo, root_hi, oc, dc,
                t_cap=jnp.where(cnt > 0, 1.0, 0.0))
            iota_g = jnp.arange(ng, dtype=jnp.int32)
            _, perm_g = jax.lax.sort((keys_g, iota_g), num_keys=1)
            perm = (perm_g[:, None] * g
                    + jnp.arange(g, dtype=jnp.int32)[None, :]).reshape(-1)
            inv_g = jnp.zeros((ng,), jnp.int32).at[perm_g].set(iota_g)
            inv_perm = inv_g[iota // g] * g + (iota % g)
        elif mode == "packed":
            keys = _ray_sort_keys(root_lo, root_hi, o, d, t_cap)
            idx_bits = max(1, (r - 1).bit_length())
            packed = ((keys >> jnp.uint32(idx_bits)) << jnp.uint32(idx_bits)
                      ) | iota.astype(jnp.uint32)
            packed = jax.lax.sort(packed)
            perm = (packed
                    & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)
            inv_perm = jnp.zeros((r,), jnp.int32).at[perm].set(iota)
        else:
            keys = _ray_sort_keys(root_lo, root_hi, o, d, t_cap)
            _, perm = jax.lax.sort((keys, iota), num_keys=1)
            inv_perm = jnp.zeros((r,), jnp.int32).at[perm].set(iota)
    return perm, inv_perm


def _sorted_rays_matrix(root_lo, root_hi, o, d, t_cap, order=None,
                        mode: str = "full"):
    """Kernel ray matrix f32[(nt+1)*TILE, RAY_COLS] in coherence order
    with ONE row gather.

    The r3 path gathered o/d/t_cap separately (three 12-byte-row
    gathers) and then copied them into the component matrix; building
    the unsorted matrix first and permuting whole 64-byte rows once is
    the same data movement the hardware actually likes.  Trailing
    rows: dead-ray padding to a TILE multiple + the all-zero sentinel
    tile.  Returns (rays, (perm, inv_perm), n_orig).

    ``order="identity"`` skips the sort AND the row gather entirely
    (cfg.primary_identity: camera rays in scanline order are already
    tile-coherent) and is returned as-is so shadow-query reuse stays
    gather-free too."""
    from prismarine_core_tpu.ops.pallas_intersect import (
        RAY_COLS, RC_CX, RC_ONE)
    r = o.shape[0]
    identity = isinstance(order, str) and order == "identity"
    if order is None:
        order = _coherence_perm(root_lo, root_hi, o, d, t_cap, mode)

    cols = jnp.zeros((r, RAY_COLS), jnp.float32)
    cols = cols.at[:, 0:3].set(o)
    cols = cols.at[:, 3:6].set(d)
    cols = cols.at[:, 6].set(t_cap)
    cols = cols.at[:, 8:11].set(_safe_inv(d))
    # mxu kernel-form features: constant 1 + c = (o - center) x d
    # (scene-centered to keep the bilinear terms' magnitudes local);
    # the mt kernel and the cull never read these columns
    center = 0.5 * (root_lo + root_hi)
    cols = cols.at[:, RC_ONE].set(1.0)
    cols = cols.at[:, RC_CX:RC_CX + 3].set(jnp.cross(o - center, d))
    rays = cols if identity else cols[order[0]]   # the one row gather

    pad = (-r) % TILE
    if pad:
        dead = jnp.zeros((pad, RAY_COLS), jnp.float32)
        dead = dead.at[:, 2].set(1e8)       # o = (0, 0, 1e8)
        dead = dead.at[:, 3].set(1.0)       # d = (1, 0, 0)
        dead = dead.at[:, 8:11].set(
            _safe_inv(jnp.asarray([[1.0, 0.0, 0.0]])))
        rays = jnp.concatenate([rays, dead])
    rays = jnp.concatenate(
        [rays, jnp.zeros((TILE, RAY_COLS), jnp.float32)])
    return rays, order, r


def _run_kernel(pair_tile, pair_sb, pair_mask, n_real, rays, planes,
                nt, nsb, window, prior=None, pairs_per_step: int = 1,
                kernel_form: str = "mt"):
    """Pad a pair list to a window multiple and run the Pallas kernel."""
    from prismarine_core_tpu.ops.pallas_intersect import (
        pallas_sb_intersect_windowed)
    pps = pairs_per_step
    window = min(window, -(-int(pair_tile.shape[0]) // pps) * pps)
    wpad = (-int(pair_tile.shape[0])) % window
    if wpad:
        pair_tile = jnp.concatenate(
            [pair_tile, jnp.full((wpad,), nt, jnp.int32)])
        pair_sb = jnp.concatenate(
            [pair_sb, jnp.full((wpad,), nsb, jnp.int32)])
        pair_mask = jnp.concatenate(
            [pair_mask, jnp.zeros((wpad,), jnp.int32)])
    return pallas_sb_intersect_windowed(
        pair_tile, pair_sb, pair_mask, n_real, rays, planes,
        window=window, prior=prior, pairs_per_step=pps,
        kernel_form=kernel_form)


#: per-round budget of the front-to-back query: each round executes
#: each tile's next K_FIRST nearest remaining superblocks (by tile-min
#: box entry distance).  Morton-adjacent blocks make "nearest
#: superblock contains the hit" unreliable for K=1 (measured ~1-2%
#: wrong-hit rate when round 2 was skipped) but K=8 captures the true
#: hit for the large majority of rays in the first round, so later
#: rounds retire almost everything against the tightened per-ray caps.
K_FIRST = 8


def _run_packet_pallas(root_lo, root_hi, ps: PacketSet, o, d, t_cap,
                       any_hit: bool = False, window: int = 1024,
                       order=None, two_round: bool = True,
                       k_round: int | None = None,
                       strategy: str | None = None,
                       cull_impl: str = "pallas",
                       sort_mode: str = "full",
                       recull: str = "sb",
                       stale_round_masks: bool = False,
                       pairs_per_step: int = 1,
                       near_frac: float = 0.0,
                       cull_chunk: int = 1024,
                       cull_window: int = 4096,
                       cull_pps: int = 0,
                       kernel_form: str = "mt",
                       with_counters: bool = False):
    """Pallas fast path: sort+tile rays, dense block-granular cull,
    front-to-back pair execution, unsort.  Returns (t, slot, order).

    Three execution strategies (measured on the hall 137k-tri bench,
    PERF.md round 3):

    * ``"single"``  — one dense compaction, every pair executes.
    * ``"two_round"`` — K nearest superblocks per tile (top_k on the
      cull's entry distances) first, then ONE re-cull of the rest
      against the tightened caps.  Fastest for closest-hit queries.
    * ``"rounds"``  — full per-tile front-to-back ordering (one
      row-wise ``lax.sort``), then K-at-a-time rounds in a
      ``while_loop``; each round re-reads per-ray caps, and the loop
      exits as soon as no tile's nearest remaining candidate can beat
      its cap (exact: candidates are tn-ascending).  Fastest for
      ANY-HIT queries: finished lanes zero their caps, so whole
      rounds evaporate.

    Default: ``"rounds"`` for any-hit, ``"two_round"`` for closest.

    ``cull_impl``: "pallas" runs the block-granular cull kernel
    (ops/pallas_cull.py) which yields superblock candidates, entry
    distances AND the per-pair 8-bit block masks in one pass; "xla" is
    the round-3 two-stage fallback (superblock scan + windowed
    _block_masks).  ``recull``: how two_round prunes round 2 on the
    pallas path — "sb" per-ray-reculls at superblock granularity and
    keeps the round-1 block masks (measured fastest), "kernel" re-runs
    the cull kernel with per-ray tightened caps, "tn" filters the
    saved block entry distances by per-tile caps (cheapest stage-wise
    but per-tile caps re-admit whole tiles once one lane misses to the
    sky — measured 6x slower end-to-end, kept for reference).
    ``stale_round_masks``: the "rounds" strategy normally re-derives
    per-ray block masks each round against the tightened caps (lanes
    retire individually — stale masks measured +34% on incoherent
    any-hit); True keeps round-0 masks (wins for coherent queries that
    finish in a round or two).  ``sort_mode``: see _sort_pad_rays.
    ``with_counters``: additionally return a dict of work counters —
    executed pairs and live [128x128] Möller–Trumbore sub-blocks
    (popcount of the executed masks) — the per-round tests/ray
    instrumentation (VERDICT r4 item 2).
    """
    rays, order, r = _sorted_rays_matrix(root_lo, root_hi, o, d, t_cap,
                                         order, mode=sort_mode)
    nt = rays.shape[0] // TILE - 1
    nsb = ps.n_superblocks

    # "mxu" kernel form: the MT kernel consumes determinant-form
    # coefficient planes (one matmul per sub-block on the MXU).  The
    # transform is pure elementwise/cross-product work fused into the
    # query's program (~4x the plane bytes written once per query).
    exec_planes = ps.planes
    if kernel_form == "mxu":
        from prismarine_core_tpu.ops.pallas_intersect import (
            mxu_planes_from_planes)
        exec_planes = mxu_planes_from_planes(
            ps.planes, 0.5 * (root_lo + root_hi))

    from prismarine_core_tpu.ops.pallas_intersect import (RAY_COLS,
                                                          RC_TCAP)

    body = rays[:nt * TILE]
    ot = body[:, 0:3].reshape(nt, TILE, 3)
    dt = body[:, 3:6].reshape(nt, TILE, 3)
    tct = body[:, RC_TCAP].reshape(nt, TILE)
    inv = body[:, 8:11].reshape(nt, TILE, 3)

    k_first = K_FIRST if k_round is None else k_round
    if strategy is None:
        strategy = "rounds" if any_hit else "two_round"
    if not two_round or nsb <= k_first:
        strategy = "single"

    use_p2 = cull_impl == "pallas2"
    use_pallas_cull = cull_impl in ("pallas", "pallas2")
    # pairs_per_step needs tile-ALIGNED pair lists, which only the
    # masked (pallas-cull) compaction produces
    pps = pairs_per_step if use_pallas_cull else 1
    # two-level path: compact with align = the pair-cull kernel's
    # pairs-per-step (every aligned group shares a tile); the MT
    # kernel's pps must divide it.  ``cull_pps=16`` fills all 128
    # refine-kernel lanes (16 pairs x 8 blocks) at the price of more
    # tile-run padding in the MT windows.
    align = (cull_pps or (16 if pps == 16 else 8)) if use_p2 else pps
    assert align % max(pps, 1) == 0, \
        "pairs_per_step must divide the pair-cull alignment " \
        "(cull_pps or 8/16) with cull_impl='pallas2'"
    n_live = _live_tile_bound(tct)

    # ---- dense cull: candidate superblocks + entry distances (+ masks
    # at block granularity on the one-level "pallas" path; the
    # two-level "pallas2" path culls dense at SUPERBLOCK granularity —
    # 1/8 the slab work — and refines masks per compacted pair)
    tn_blk = box_rows = sb_rows = sbbox = None
    if use_p2:
        from prismarine_core_tpu.ops.pallas_cull import (
            box_rows_from_blocks, pallas_block_cull, pallas_pair_cull,
            sb_box_table)
        sb_rows = box_rows_from_blocks(ps.sb_lo, ps.sb_hi)
        sbbox = sb_box_table(ps.block_lo, ps.block_hi)
        tn_sb = pallas_block_cull(rays, sb_rows, n_live,
                                  chunk=cull_chunk)[:, :nsb]
        sb_mask = tn_sb < INF_DIST
        sb_tn = tn_sb
        mask8 = None
    elif use_pallas_cull:
        from prismarine_core_tpu.ops.pallas_cull import (
            box_rows_from_blocks, derive_pair_tables, pallas_block_cull)
        box_rows = box_rows_from_blocks(ps.block_lo, ps.block_hi)
        tn_blk = pallas_block_cull(rays, box_rows, n_live,
                                   chunk=cull_chunk)
        sb_mask, sb_tn, mask8 = derive_pair_tables(tn_blk, nsb, SB)
    else:
        mask8 = None
        if strategy == "single":
            sb_mask = _per_ray_tile_overlap(ot, inv, tct,
                                            ps.sb_lo, ps.sb_hi)
            sb_tn = None
        else:
            sb_mask, sb_tn = _per_ray_tile_overlap(
                ot, inv, tct, ps.sb_lo, ps.sb_hi, return_tn=True)

    def rays_with_caps(tct_eff):
        from prismarine_core_tpu.ops.pallas_intersect import RC_TCAP
        return rays.at[:nt * TILE, RC_TCAP].set(tct_eff.reshape(-1))

    def attach_masks(pt, psb, np_, rays_eff):
        """Two-level path: per-pair 8-bit block masks from the
        pair-driven refine kernel (replaces both the [nt, nb] dense
        block cull and the _block_masks XLA stage)."""
        return pallas_pair_cull(pt, psb, np_,
                                rays if rays_eff is None else rays_eff,
                                sbbox, cpps=align, window=cull_window)

    def compact_dense(mask, tct_eff, m8, bound, rays_eff=None):
        """[nt, nsb] candidate mask -> (pt, psb, pm, n_pairs)."""
        if use_p2:
            pt, psb, _, np_ = _compact_rows_masked(
                mask, jnp.broadcast_to(
                    jnp.arange(nsb, dtype=jnp.int32), mask.shape),
                None, nt, nsb,
                jnp.minimum(bound * nsb, nt * nsb), align=align)
            pm = attach_masks(pt, psb, np_, rays_eff)
            return pt, psb, pm, np_
        if m8 is not None:
            return _compact_pairs_masked(mask, m8, bound, align=pps)
        pt, psb, np_ = _compact_pairs(mask, nsb)
        pm = _block_masks(ot, inv, tct_eff, pt, psb, np_,
                          ps.block_lo, ps.block_hi)
        return pt, psb, pm, np_

    def compact_topk(cand, ok, tct_eff, m8, rays_eff=None):
        """[nt, K] candidates -> (pt, psb, pm, n_pairs)."""
        if use_p2:
            pt, psb, _, np_ = _compact_rows_masked(
                ok, cand, None, nt, nsb, nt * cand.shape[1],
                align=align)
            pm = attach_masks(pt, psb, np_, rays_eff)
            return pt, psb, pm, np_
        if m8 is not None:
            pmk = jnp.take_along_axis(
                m8, jnp.minimum(cand, nsb - 1), axis=1)
            pmk = jnp.where(ok, pmk, 0)
            return _compact_topk_masked(cand, ok, pmk, nt, nsb,
                                        align=pps)
        pt, psb, np_ = _compact_topk(cand, ok, nt, nsb)
        pm = _block_masks(ot, inv, tct_eff, pt, psb, np_,
                          ps.block_lo, ps.block_hi)
        return pt, psb, pm, np_

    def _bits(pm):
        return jnp.sum(jnp.bitwise_count(pm.astype(jnp.uint32)
                                         ).astype(jnp.int32))

    counters = None
    if strategy == "single":
        pt, psb, pm, np_ = compact_dense(sb_mask, tct, mask8, n_live)
        out = _run_kernel(pt, psb, pm, np_, rays,
                          exec_planes, nt, nsb, window,
                          pairs_per_step=pps, kernel_form=kernel_form)
        if with_counters:
            counters = dict(n_pairs=np_, mt_subblocks=_bits(pm))
    elif strategy == "two_round":
        # ---- round 1: nearest candidate superblocks per tile ----
        tn_cand = jnp.where(sb_mask, sb_tn, INF_DIST)
        if near_frac > 0.0 and (mask8 is not None or use_p2):
            # THRESHOLD selection: superblocks whose entry distance is
            # within near_frac of the tile's candidate range run first
            # (two row reduces instead of a ~41 ms top_k; measured a
            # wash on the hall bench — kept as a knob)
            tmin = jnp.min(tn_cand, axis=1, keepdims=True)
            tmax = jnp.max(jnp.where(sb_mask, sb_tn, -INF_DIST),
                           axis=1, keepdims=True)
            thr = tmin + jnp.float32(near_frac) * jnp.maximum(
                tmax - tmin, 0.0)
            executed = sb_mask & (sb_tn <= thr)
            pt1, psb1, pm1, np1 = compact_dense(executed, tct, mask8,
                                                n_live)
        else:
            neg_tn, cand = jax.lax.top_k(-tn_cand, k_first)  # [nt, K]
            cand_ok = -neg_tn < INF_DIST
            pt1, psb1, pm1, np1 = compact_topk(cand, cand_ok, tct,
                                               mask8)
            executed = jnp.zeros((nt, nsb + 1), bool).at[
                jnp.arange(nt, dtype=jnp.int32)[:, None],
                jnp.where(cand_ok, cand, nsb)].set(True)[:, :nsb]
        out = _run_kernel(pt1, psb1, pm1, np1, rays, exec_planes,
                          nt, nsb, window, pairs_per_step=pps,
                          kernel_form=kernel_form)

        # ---- round 2: re-cull the rest against tightened caps ----
        o1 = out.reshape(nt + 1, TILE, 8)
        best1 = o1[:nt, :, 0]                             # [nt, TILE]
        if any_hit:
            slot1 = jax.lax.bitcast_convert_type(o1[:nt, :, 1],
                                                 jnp.int32)
            tct2 = jnp.where(slot1 >= 0, 0.0, tct)        # done lanes out
        else:
            tct2 = jnp.minimum(tct, best1)
        n_live2 = _live_tile_bound(tct2)
        rays2 = None
        if use_p2:
            # re-run the SUPERBLOCK-level dense cull with the
            # per-ray tightened caps (exact per-ray pruning at sb
            # granularity, ~1/8 the round-4 block-cull work); the
            # pair-driven refine then derives masks under the same
            # tightened caps
            rays2 = rays_with_caps(tct2)
            tn2 = pallas_block_cull(rays2, sb_rows, n_live2,
                                    chunk=cull_chunk)[:, :nsb]
            sb_mask2 = (tn2 < INF_DIST) & sb_mask & ~executed
            mask8_2 = None
        elif use_pallas_cull:
            if recull == "kernel":
                rays2 = rays_with_caps(tct2)
                from prismarine_core_tpu.ops.pallas_cull import (
                    derive_pair_tables, pallas_block_cull)
                tn2 = pallas_block_cull(rays2, box_rows, n_live2,
                                        chunk=cull_chunk)
                sb_mask2, _, mask8_2 = derive_pair_tables(tn2, nsb, SB)
            elif recull == "sb":
                # per-ray XLA recull at SUPERBLOCK granularity + the
                # round-1 block masks (stale bits are conservative):
                # per-ray caps prune what a per-tile cap cannot — one
                # sky lane's INF cap otherwise re-admits the whole tile
                sb_mask2 = _per_ray_tile_overlap(ot, inv, tct2,
                                                 ps.sb_lo, ps.sb_hi)
                mask8_2 = mask8
            else:   # "tn": per-tile caps on saved block distances
                sb_mask2, mask8_2 = _tables_with_cap(
                    tn_blk, jnp.max(tct2, axis=1), nsb)
            sb_mask2 = sb_mask2 & sb_mask & ~executed
        else:
            mask8_2 = None
            sb_mask2 = (_per_ray_tile_overlap(ot, inv, tct2,
                                              ps.sb_lo, ps.sb_hi)
                        & sb_mask & ~executed)
        pt2, psb2, pm2, np2 = compact_dense(sb_mask2, tct2, mask8_2,
                                            n_live2, rays_eff=rays2)
        out = _run_kernel(pt2, psb2, pm2, np2, rays, exec_planes,
                          nt, nsb, window, prior=out,
                          pairs_per_step=pps, kernel_form=kernel_form)
        if with_counters:
            counters = dict(n_pairs=np1 + np2,
                            mt_subblocks=_bits(pm1) + _bits(pm2))
    else:
        k = k_first
        # per-tile front-to-back candidate order (one row-wise sort)
        tn_cand = jnp.where(sb_mask, sb_tn, INF_DIST)     # [nt, nsb]
        ids = jnp.broadcast_to(jnp.arange(nsb, dtype=jnp.int32),
                               (nt, nsb))
        tn_sorted, sb_sorted = jax.lax.sort(
            (tn_cand, ids), dimension=1, num_keys=1)
        n_rounds = -(-nsb // k)
        pad_cols = n_rounds * k - nsb
        if pad_cols:
            tn_sorted = jnp.concatenate(
                [tn_sorted, jnp.full((nt, pad_cols), INF_DIST)], axis=1)
            sb_sorted = jnp.concatenate(
                [sb_sorted, jnp.full((nt, pad_cols), nsb, jnp.int32)],
                axis=1)

        def caps_from(out):
            o_ = out.reshape(nt + 1, TILE, 8)
            best = o_[:nt, :, 0]                          # [nt, TILE]
            if any_hit:
                slot = jax.lax.bitcast_convert_type(o_[:nt, :, 1],
                                                    jnp.int32)
                tct_eff = jnp.where(slot >= 0, 0.0, tct)
            else:
                tct_eff = jnp.minimum(tct, best)
            return tct_eff, jnp.max(tct_eff, axis=1)      # per-tile cap

        def do_round(rr, out, tct_eff, tile_cap):
            cand = jax.lax.dynamic_slice(sb_sorted, (0, rr * k),
                                         (nt, k))
            ctn = jax.lax.dynamic_slice(tn_sorted, (0, rr * k),
                                        (nt, k))
            ok = (ctn <= tile_cap[:, None]) & (ctn < INF_DIST)
            # refresh the block masks against the PER-RAY tightened
            # caps: lanes retire individually, and round-0 masks
            # measured +34% kernel work on incoherent any-hit.  On the
            # two-level path the refresh is the pair-driven refine
            # kernel itself, fed cap-tightened rays.
            rays_eff = (None if stale_round_masks
                        else rays_with_caps(tct_eff)) if use_p2 else None
            pt, psb, pm, npairs = compact_topk(cand, ok, tct_eff,
                                               mask8, rays_eff=rays_eff)
            if use_pallas_cull and not use_p2 and not stale_round_masks:
                pm = _block_masks(ot, inv, tct_eff, pt, psb, npairs,
                                  ps.block_lo, ps.block_hi)
            out = _run_kernel(pt, psb, pm, npairs, rays, exec_planes,
                              nt, nsb, window, prior=out,
                              pairs_per_step=pps,
                              kernel_form=kernel_form)
            return out, npairs, _bits(pm)

        # round 0 always runs (prior=None initializes the accumulator
        # to t_cap/-1 inside _run_kernel)
        cand0 = sb_sorted[:, :k]
        ctn0 = tn_sorted[:, :k]
        ok0 = ctn0 < INF_DIST
        pt0, psb0, pm0, np0 = compact_topk(cand0, ok0, tct, mask8)
        out = _run_kernel(pt0, psb0, pm0, np0, rays, exec_planes,
                          nt, nsb, window, pairs_per_step=pps,
                          kernel_form=kernel_form)

        def cond(state):
            rr, out, tile_cap, _, _ = state
            # exact: per tile, candidates are tn-ascending, so if the
            # round's FIRST candidate cannot beat the tile's worst
            # live cap, none can
            nxt = jax.lax.dynamic_slice(tn_sorted, (0, rr * k),
                                        (nt, 1))[:, 0]
            return (rr < n_rounds) & jnp.any(nxt <= tile_cap)

        def body(state):
            rr, out, _, npa, bca = state
            tct_eff, tile_cap = caps_from(out)
            out, npr, bcr = do_round(rr, out, tct_eff, tile_cap)
            _, tile_cap = caps_from(out)
            return rr + 1, out, tile_cap, npa + npr, bca + bcr

        _, tile_cap0 = caps_from(out)
        _, out, _, np_acc, bc_acc = jax.lax.while_loop(
            cond, body, (jnp.int32(1), out, tile_cap0, np0, _bits(pm0)))
        if with_counters:
            counters = dict(n_pairs=np_acc, mt_subblocks=bc_acc)

    out = out.reshape(nt + 1, TILE, 8)[:nt]
    t = out[:, :, 0]
    slot = jax.lax.bitcast_convert_type(out[:, :, 1], jnp.int32)

    t, slot = (x.reshape(nt * TILE)[:r] for x in (t, slot))
    if not isinstance(order, str):
        inv_perm = order[1]
        t, slot = t[inv_perm], slot[inv_perm]
    if with_counters:
        return t, slot, order, counters
    return t, slot, order


def _run_packet(bvh: BVH, ps: PacketSet, o, d, t_cap, any_hit: bool):
    """Sort rays, pad to a tile multiple, run the packet core, unsort."""
    o, d, t_cap, order, r = _sort_pad_rays(bvh.lo[0], bvh.hi[0], o, d,
                                           t_cap)
    t, slot, u, v = _packet_core(bvh, ps, o, d, t_cap, any_hit)
    t, slot = t[:r], slot[:r]
    return t[order[1]], slot[order[1]]


def _reeval_hit(bvh: BVH, soup: TriangleSoup, o, d, slot) -> Hit:
    """Differentiable re-evaluation of a detached discrete hit."""
    sg = jax.lax.stop_gradient
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


def intersect_closest_packet(bvh: BVH, ps: PacketSet, soup: TriangleSoup,
                             o, d) -> Hit:
    """Closest hit via packets; differentiable like the BVH path (detached
    discrete hit + differentiable re-evaluation)."""
    sg = jax.lax.stop_gradient
    _, slot = _run_packet(
        sg(bvh), sg(ps), sg(o), sg(d),
        jnp.full((o.shape[0],), INF_DIST), any_hit=False)
    return _reeval_hit(bvh, soup, o, d, slot)


def occluded_packet(bvh: BVH, ps: PacketSet, soup: TriangleSoup,
                    o, d, t_max):
    sg = jax.lax.stop_gradient
    _, slot = _run_packet(sg(bvh), sg(ps), sg(o), sg(d), sg(t_max),
                          any_hit=True)
    return slot >= 0


def intersect_closest_pallas(bvh: BVH, ps: PacketSet, soup: TriangleSoup,
                             o, d, t_cap=None, return_order=False,
                             order=None, **kw):
    """Closest hit via the fused Pallas kernel (fast path).

    ``t_cap`` (f32[R], optional): per-lane far limit; lanes with 0 are
    culled out of the pair lists entirely (dead-lane compaction).
    ``return_order``: also return the coherence sort (perm, inv_perm)
    for reuse by this bounce's shadow query.  ``order``: reuse a
    previous query's sort instead of re-sorting
    (cfg.reuse_bounce_order).  ``**kw``: strategy/cull/sort knobs,
    forwarded to _run_packet_pallas."""
    sg = jax.lax.stop_gradient
    if t_cap is None:
        t_cap = jnp.full((o.shape[0],), INF_DIST)
    _, slot, order = _run_packet_pallas(
        sg(bvh.lo[0]), sg(bvh.hi[0]), sg(ps), sg(o), sg(d), sg(t_cap),
        order=order, **kw)
    hit = _reeval_hit(bvh, soup, o, d, slot)
    return (hit, order) if return_order else hit


def occluded_pallas(bvh: BVH, ps: PacketSet, soup: TriangleSoup,
                    o, d, t_max, order=None, **kw):
    """Any-hit query.  ``order`` reuses a closest query's ray sort
    (shadow origins = that query's hit points, so coherence carries)."""
    sg = jax.lax.stop_gradient
    _, slot, _ = _run_packet_pallas(sg(bvh.lo[0]), sg(bvh.hi[0]),
                                    sg(ps), sg(o), sg(d), sg(t_max),
                                    any_hit=True, order=order, **kw)
    return slot >= 0
