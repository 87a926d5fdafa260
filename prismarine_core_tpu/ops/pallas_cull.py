"""Pallas TPU kernel: dense block-granular ray-tile culling.

Round 3 localized ~55-65% of the frame in fixed XLA stages per query
(PERF.md): the dense superblock cull (28 ms) plus a SEPARATE windowed
block-mask refinement (41 ms) that re-gathered ray tiles pair by pair
and re-ran the same slab tests one level finer.  This kernel replaces
both with ONE pass at BLOCK granularity:

  * grid = (ray tile, block-lane chunk); per step, a [TILE, CHUNK] slab
    test of the tile's 128 rays against CHUNK block AABBs — dense VPU
    work at the exact register shape, no gathers (the block AABB rows
    use a constant-in-``i`` index map, so Mosaic keeps them VMEM-
    resident across the whole row of tiles instead of re-DMAing);
  * output is the per-(tile, block) ENTRY DISTANCE (`INF_DIST` where no
    ray of the tile passes).  Everything the packet scheduler needs
    derives from it in one cheap XLA pass over [nt, nb]:
    per-pair 8-bit block masks (bit-pack over SB), superblock candidate
    masks (any bit set — strictly TIGHTER than the old superblock-AABB
    test, which could pass on the union box when every individual block
    misses), and superblock entry distances (min over blocks — a valid
    and tighter front-to-back lower bound for the ordered strategies);
  * tiles past the live prefix (every lane's ``t_cap`` == 0 — dead
    lanes sort last, accel/packet.py:_ray_sort_keys) skip the slab
    work under ``pl.when`` on a prefetched scalar bound, so cull cost
    scales with LIVE work as paths die across bounces.

Replaces the per-pair mask stage of ``accel/packet.py:_block_masks``
(kept for the pure-XLA fallback path); the reference's analog of this
scheduling work is the per-ray BVH descent of ``directTraverse.comp``
(383-464), which a TPU cannot do a lane at a time.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prismarine_core_tpu.ops.pallas_intersect import (
    RAY_COLS, RC_IVX, RC_IVY, RC_IVZ, RC_OX, RC_OY, RC_OZ, RC_TCAP,
    SB as _SB, TILE)
from prismarine_core_tpu.utils.config import INF_DIST

#: block AABB component rows (lanes = blocks)
_BOX_ROWS = 8   # lo_x lo_y lo_z hi_x hi_y hi_z pad pad


def _cull_kernel(packed, n_live,         # SMEM i32[1]
                 ray_ref,                # [TILE, RAY_COLS]
                 box_ref,                # [_BOX_ROWS, CHUNK or 8*CHUNK]
                 out_ref):               # [1, 8, CHUNK]
    i = pl.program_id(0)
    chunk = out_ref.shape[2]

    def rcol(c):
        return ray_ref[:, c][:, None]

    def slab_row(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z):
        tc = rcol(RC_TCAP)
        t0x = (lo_x - rcol(RC_OX)) * rcol(RC_IVX)
        t1x = (hi_x - rcol(RC_OX)) * rcol(RC_IVX)
        t0y = (lo_y - rcol(RC_OY)) * rcol(RC_IVY)
        t1y = (hi_y - rcol(RC_OY)) * rcol(RC_IVY)
        t0z = (lo_z - rcol(RC_OZ)) * rcol(RC_IVZ)
        t1z = (hi_z - rcol(RC_OZ)) * rcol(RC_IVZ)
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        tn0 = jnp.maximum(tn, 0.0)
        # same predicate as accel/packet.py:_per_ray_tile_overlap: the
        # tc > 0 term keeps dead lanes from listing boxes their origin
        # happens to sit inside
        hit = (tf >= tn0) & (tn <= tc) & (tc > 0.0)
        return jnp.min(jnp.where(hit, tn0, INF_DIST), axis=0)

    @pl.when(i < n_live[0])
    def _live():
        if packed:
            # 8 block chunks per step, one output row each: the write
            # stays sublane-legal WITHOUT the 8x row broadcast (the
            # broadcast layout wrote nt*8*nb floats — 1.9 GB at 3.7M
            # rays; packed writes exactly nt*nb)
            for r in range(8):
                def brow(rr, r=r):
                    return box_ref[rr, r * chunk:(r + 1) * chunk][None, :]
                out_ref[0, r, :] = slab_row(brow(0), brow(1), brow(2),
                                            brow(3), brow(4), brow(5))
        else:
            def brow(rr):
                return box_ref[rr, :][None, :]
            row = slab_row(brow(0), brow(1), brow(2),
                           brow(3), brow(4), brow(5))
            out_ref[0, :, :] = jnp.broadcast_to(row[None, :],
                                                out_ref.shape[1:])

    @pl.when(i >= n_live[0])
    def _dead():
        out_ref[0, :, :] = jnp.full_like(out_ref[0, :, :], INF_DIST)


@partial(jax.jit, static_argnames=("chunk", "packed_min_nt"))
def pallas_block_cull(rays,      # f32[(nt+1)*TILE, RAY_COLS]
                      box_rows,  # f32[_BOX_ROWS, nb_pad] (nb_pad % 128 == 0)
                      n_live,    # i32[] count of leading candidate tiles
                      chunk: int = 1024,
                      packed_min_nt: int = 12000):
    """Per-(tile, block) entry distance, INF_DIST where the tile has no
    ray passing the block's slab test under its cap.

    ``n_live`` bounds the slab work: tiles >= n_live write INF rows
    without testing (their lanes are all dead — the caller computes the
    bound as 1 + the last tile holding any live lane)."""
    n_rows = rays.shape[0]
    nt = n_rows // TILE - 1
    nb_pad = box_rows.shape[1]
    assert nb_pad % 128 == 0
    # largest lane chunk <= requested that tiles nb_pad exactly
    chunk = min(chunk - chunk % 128 or 128, nb_pad)
    while nb_pad % chunk:
        chunk -= 128
    # packed layout: 8 block chunks per step -> exactly nt*nb floats
    # written.  The per-row stores are sublane-1 (masked vreg writes),
    # measured ~8 ms slower than the broadcast layout at 921k rays —
    # packed only pays once the 8x write volume dominates (multi-spp /
    # very large ray counts), so it gates on nt.
    packed = (nb_pad % (8 * chunk) == 0 and nb_pad >= 8 * 128
              and nt > packed_min_nt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt, nb_pad // ((8 if packed else 1) * chunk)),
        in_specs=[
            pl.BlockSpec((TILE, RAY_COLS),
                         lambda i, c, nl: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BOX_ROWS, (8 if packed else 1) * chunk),
                         lambda i, c, nl: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, chunk),
                               lambda i, c, nl: (i, 0, c),
                               memory_space=pltpu.VMEM),
    )
    out_cols = nb_pad // 8 if packed else nb_pad
    call = pl.pallas_call(
        partial(_cull_kernel, packed),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, 8, out_cols), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )
    out = call(jnp.asarray([n_live], jnp.int32), rays, box_rows)
    if not packed:
        return out[:, 0, :]
    # un-permute [i, r, c*chunk+l] -> block id c*8*chunk + r*chunk + l
    ngr = nb_pad // (8 * chunk)
    return out.reshape(nt, 8, ngr, chunk).transpose(0, 2, 1, 3
                                                    ).reshape(nt, nb_pad)


def box_rows_from_blocks(block_lo, block_hi):
    """[nb,3]x2 block AABBs -> f32[_BOX_ROWS, nb_pad] lane-major rows
    (padding blocks get far-point boxes that never pass a slab test)."""
    nb = block_lo.shape[0]
    nb_pad = -(-nb // 128) * 128
    from prismarine_core_tpu.accel.lbvh import EMPTY_BOX
    rows = jnp.full((_BOX_ROWS, nb_pad), 0.0, jnp.float32)
    rows = rows.at[0:3, :].set(jnp.float32(EMPTY_BOX))
    rows = rows.at[3:6, :].set(jnp.float32(-EMPTY_BOX))
    rows = rows.at[0:3, :nb].set(block_lo.T)
    rows = rows.at[3:6, :nb].set(block_hi.T)
    return rows


def sb_box_table(block_lo, block_hi):
    """[nb,3]x2 block AABBs -> f32[nsb+1, 8, SB] per-superblock box
    table for the pair-driven refine kernel: entry ``[s, c, k]`` is
    component ``c`` (lo_xyz, hi_xyz, pad, pad) of block ``s*SB + k``.
    Row ``nsb`` is the compaction sentinel: far POINT boxes
    (lo == hi == +EMPTY_BOX) that never pass a slab test — NOT the
    inverted box, which would pass it for every ray (tn=-E, tf=+E on
    all axes)."""
    nb = block_lo.shape[0]
    assert nb % _SB == 0
    nsb = nb // _SB
    from prismarine_core_tpu.accel.lbvh import EMPTY_BOX
    tab = jnp.full((nsb + 1, _BOX_ROWS, _SB), jnp.float32(EMPTY_BOX))
    tab = tab.at[:nsb, 0:3, :].set(
        block_lo.reshape(nsb, _SB, 3).transpose(0, 2, 1))
    tab = tab.at[:nsb, 3:6, :].set(
        block_hi.reshape(nsb, _SB, 3).transpose(0, 2, 1))
    return tab


def _pair_cull_kernel(cpps, pair_tile, pair_sb,   # SMEM i32[window]
                      ray_ref,                    # [TILE, RAY_COLS]
                      *refs):                     # cpps box refs, out, scr
    box_refs = refs[:cpps]                        # each [1, 8, SB]
    out_ref, scr = refs[cpps:]                    # [1, 8, 128], [8, 128]
    del pair_tile, pair_sb

    # assemble the step's [8, cpps*SB] box matrix: component rows on
    # sublanes, (pair j, block k) on lane j*SB + k; unused trailing
    # lanes keep far POINT boxes (lo == hi, slab test never passes)
    from prismarine_core_tpu.accel.lbvh import EMPTY_BOX
    scr[:, :] = jnp.full((_BOX_ROWS, 128), EMPTY_BOX, jnp.float32)
    for j in range(cpps):
        scr[:, j * _SB:(j + 1) * _SB] = box_refs[j][0, :, :]

    def rcol(c):
        return ray_ref[:, c][:, None]

    def brow(c):
        return scr[c, :][None, :]

    tc = rcol(RC_TCAP)
    t0x = (brow(0) - rcol(RC_OX)) * rcol(RC_IVX)
    t1x = (brow(3) - rcol(RC_OX)) * rcol(RC_IVX)
    t0y = (brow(1) - rcol(RC_OY)) * rcol(RC_IVY)
    t1y = (brow(4) - rcol(RC_OY)) * rcol(RC_IVY)
    t0z = (brow(2) - rcol(RC_OZ)) * rcol(RC_IVZ)
    t1z = (brow(5) - rcol(RC_OZ)) * rcol(RC_IVZ)
    tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                 jnp.minimum(t0y, t1y)),
                     jnp.minimum(t0z, t1z))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                 jnp.maximum(t0y, t1y)),
                     jnp.maximum(t0z, t1z))
    tn0 = jnp.maximum(tn, 0.0)
    hit = (tf >= tn0) & (tn <= tc) & (tc > 0.0)
    row = jnp.min(jnp.where(hit, tn0, INF_DIST), axis=0)
    # full-vreg broadcast store (a single-sublane store would be a
    # masked write; the 8x volume is 4 KB/step — noise)
    out_ref[0, :, :] = jnp.broadcast_to(row[None, :], (8, 128))


@partial(jax.jit, static_argnames=("cpps", "window"))
def pallas_pair_cull(pair_tile,   # i32[L] tile-aligned pair list
                     pair_sb,     # i32[L] superblock ids (pad -> nsb)
                     n_real,      # i32[] live pair count
                     rays,        # f32[(nt+1)*TILE, RAY_COLS]
                     sb_boxes,    # f32[nsb+1, 8, SB] (sb_box_table)
                     cpps: int = 8,
                     window: int = 4096):
    """Per-pair 8-bit block masks via a PAIR-DRIVEN slab kernel.

    The second level of the two-level cull (``cull_impl="pallas2"``):
    the dense pass runs at SUPERBLOCK granularity (1/8 the slab work of
    the round-4 block-granular cull), and this kernel refines only the
    COMPACTED survivor pairs to block granularity — cull work scales
    with the candidate count instead of O(rays x blocks).  Each grid
    step tests one 128-ray tile against the ``cpps`` pairs' 8 block
    AABBs each laid out on lanes ([128 rays x cpps*8 block-lanes] dense
    slab test, min-reduced over rays).  Requires the pair list aligned
    so every ``cpps`` consecutive pairs share a tile (packet.py
    compacts with ``align=cpps``).  Windowed like the intersect kernel:
    cost adapts to the live pair count, masks fold to i32 codes
    XLA-side per window.  Returns i32[L] 8-bit masks (0 past n_real).
    """
    lw = pair_tile.shape[0]
    assert cpps * _SB <= 128
    window += (-window) % cpps      # grid needs window % cpps == 0
    wpad = (-lw) % window
    nsb = sb_boxes.shape[0] - 1
    n_rows = rays.shape[0]
    nt = n_rows // TILE - 1
    if wpad:
        pair_tile = jnp.concatenate(
            [pair_tile, jnp.full((wpad,), nt, jnp.int32)])
        pair_sb = jnp.concatenate(
            [pair_sb, jnp.full((wpad,), nsb, jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(window // cpps,),
        in_specs=[
            pl.BlockSpec((TILE, RAY_COLS),
                         lambda i, pt, psb: (pt[i * cpps], 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, _BOX_ROWS, _SB),
                         (lambda j: lambda i, pt, psb:
                          (psb[i * cpps + j], 0, 0))(j),
                         memory_space=pltpu.VMEM)
            for j in range(cpps)
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, pt, psb: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_BOX_ROWS, 128), jnp.float32)],
    )
    call = pl.pallas_call(
        partial(_pair_cull_kernel, cpps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((window // cpps, 8, 128),
                                       jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )

    bits = (1 << jnp.arange(_SB, dtype=jnp.int32))[None, None, :]
    lwp = lw + wpad

    def cond(state):
        return state[0] < n_real

    def body(state):
        start, pm = state
        pt = jax.lax.dynamic_slice(pair_tile, (start,), (window,))
        psb = jax.lax.dynamic_slice(pair_sb, (start,), (window,))
        live = (start + jnp.arange(window, dtype=jnp.int32)) < n_real
        pt = jnp.where(live, pt, nt)
        psb = jnp.where(live, psb, nsb)
        # the same box table feeds every per-pair input slot; only the
        # index maps differ
        rows = call(pt, psb, rays,
                    *([sb_boxes] * cpps))[:, 0, :]   # [window/cpps, 128]
        tn8 = rows[:, :cpps * _SB].reshape(-1, cpps, _SB)
        codes = jnp.sum(jnp.where(tn8 < INF_DIST, bits, 0),
                        axis=-1).reshape(window).astype(jnp.int32)
        pm = jax.lax.dynamic_update_slice(pm, codes, (start,))
        return start + window, pm

    _, pm = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((lwp,), jnp.int32)))
    return pm[:lw]


def derive_pair_tables(tn_blk, nsb, sb: int):
    """[nt, nb_pad] block entry distances -> (sb_mask, sb_tn, mask8).

    sb_mask bool[nt, nsb]: tile lists superblock (any block hit);
    sb_tn   f32[nt, nsb]: min block entry (front-to-back lower bound);
    mask8   i32[nt, nsb]: per-pair block bitmask (bit k = block sb*SB+k).

    Works on STRIDED lane slices [nt, nsb] instead of a
    [nt, nsb, sb] reshape: an 8-wide minor dimension runs every
    elementwise op at 8/128 lane occupancy (measured 40-50 ms for this
    trivial pass; the strided form keeps a 128-multiple minor dim).
    """
    blk = tn_blk[:, :nsb * sb]
    sl = blk[:, 0::sb]
    sb_tn = sl
    mask8f = (sl < INF_DIST).astype(jnp.float32)
    for k in range(1, sb):
        sl = blk[:, k::sb]
        sb_tn = jnp.minimum(sb_tn, sl)
        mask8f = mask8f + (sl < INF_DIST).astype(jnp.float32) * (1 << k)
    mask8 = mask8f.astype(jnp.int32)
    return mask8 != 0, sb_tn, mask8
