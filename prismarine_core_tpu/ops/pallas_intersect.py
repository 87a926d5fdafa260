"""Pallas TPU kernel: fused cull + intersect over (ray-tile, superblock)
pairs — the hot op of the framework.

Pointer-chasing BVH walks are latency-bound on TPU (every step is a
~4 B/lane random HBM gather); this kernel restructures intersection as
dense batched work: one 128-ray tile against one 8-block superblock
(1024 Morton-adjacent triangle slots) per grid step, everything in VMEM.

The r1 pipeline culled per-ray x per-block in XLA, then compacted
(tile, block) pairs into quads with ~15M-element scatters (173 ms/query
on a v5e — more than the intersection itself) and re-gathered a
[window, 4, 16, 128] triangle stream per window (~16 MB/step of HBM
round-trip).  This version fuses all of that into the kernel:

  * the caller culls rays only against SUPERBLOCK AABBs (nb/8 columns,
    dense exact OR-per-tile) and compacts (tile, superblock) pairs —
    one cumsum+scatter over [nt, nsb], 8x smaller;
  * per grid step, BlockSpec index maps pull the superblock's triangle
    planes (one contiguous 64 KB DMA, double-buffered by Mosaic) and its
    8 block AABBs straight from HBM via the scalar-prefetched pair list;
  * the kernel slab-tests the tile's 128 rays against the 8 block boxes
    (per-ray entry distance pruned against the running best t), and
    runs the dense 128x128 Möller–Trumbore ONLY for sub-blocks some ray
    actually overlaps (`pl.when` predication — the data-dependent skip a
    GPU gets from warp divergence, done as predicated whole-tile work).

Layouts (all Mosaic-legal block shapes):
  rays   f32[(nt+1)*TILE, 16] — block (TILE, 16); component columns
         [ox oy oz dx dy dz t_cap pad ivx ivy ivz pad...] (iv = 1/d);
         rays land on sublanes.
  planes f32[nsb+1, 16, SB*BLOCK] — per-superblock SoA triangle
         components [v0xyz e1xyz e2xyz valid 0...]; triangles land on
         lanes, sub-block k occupying lanes [128k, 128k+128).  Row
         TC_VALID is 0 for padding slots; the trailing superblock is
         all-zero (the pair-padding sentinel).
  boxes  f32[nsb+1, 8, 8] — block AABBs [lox loy loz hix hiy hiz 0 0].
  out    f32[(nt+1)*TILE, 8] — block (TILE, 8); columns [t slot 0...]
         (slot is an int32 BITCAST into the f32 column; Mosaic has no
         int<->float converts on this path).  Barycentrics are NOT
         tracked: callers re-evaluate the winning triangle
         differentiably anyway (accel/packet.py).

The hot math is [TILE, BLOCK] = [128, 128] f32 — the exact VPU register
shape — written component-wise (the 128-wide generalization of the
reference's 2-wide packed Möller–Trumbore, ``vertex.glsl:117-189``).
Pairs of the same tile are consecutive (tile-major pair list), so the
output block stays VMEM-resident and accumulates the running closest hit
across steps (sequential grid => race-free, no atomics — the reference
needs warp-aggregated atomics for the same job,
``ballotlib.glsl:106-132``).  Windows of pairs execute inside a
while_loop so cost adapts to the scene without recompilation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prismarine_core_tpu.utils.config import INF_DIST, PZERO

TILE = 128      # rays per tile
BLOCK = 128     # triangle slots per sub-block
SB = 8          # sub-blocks per superblock
_DET_EPS = 1e-10

# ray component columns
(RC_OX, RC_OY, RC_OZ, RC_DX, RC_DY, RC_DZ, RC_TCAP, _RC_P0,
 RC_IVX, RC_IVY, RC_IVZ) = range(11)
RAY_COLS = 16
# triangle component rows
(TC_V0X, TC_V0Y, TC_V0Z, TC_E1X, TC_E1Y, TC_E1Z,
 TC_E2X, TC_E2Y, TC_E2Z, TC_VALID) = range(10)
# box columns
BX_LOX, BX_LOY, BX_LOZ, BX_HIX, BX_HIY, BX_HIZ = range(6)
# output columns
OC_T, OC_SLOT = range(2)


def _make_sb_kernel(any_hit: bool):
    def kernel(pair_tile, pair_sb, first_pair,
               ray_ref,                        # [TILE, 16]
               tri_ref,                        # [1, 16, SB*BLOCK]
               box_ref,                        # [1, 8, 8]
               prior_ref,                      # [TILE, 8]
               out_ref):                       # [TILE, 8]
        i = pl.program_id(0)

        @pl.when(first_pair[i] == 1)
        def _init():
            # first visit of this tile *within this window*: seed the
            # VMEM accumulator from the previous window's best (or the
            # caller's t_cap/-1 initialization on the first window).
            out_ref[:, :] = prior_ref[:, :]

        def rcol(c):
            return ray_ref[:, c][:, None]

        rox, roy, roz = rcol(RC_OX), rcol(RC_OY), rcol(RC_OZ)
        rdx, rdy, rdz = rcol(RC_DX), rcol(RC_DY), rcol(RC_DZ)
        ivx, ivy, ivz = rcol(RC_IVX), rcol(RC_IVY), rcol(RC_IVZ)

        best0 = out_ref[:, OC_T]                               # [TILE]
        slot0 = jax.lax.bitcast_convert_type(out_ref[:, OC_SLOT],
                                             jnp.int32)

        # ---- in-kernel block cull: slab test vs the 8 block AABBs ----
        def brow(c):
            return box_ref[0, :, c][None, :]                   # [1, 8]

        t0x = (brow(BX_LOX) - rox) * ivx                       # [TILE, 8]
        t1x = (brow(BX_HIX) - rox) * ivx
        t0y = (brow(BX_LOY) - roy) * ivy
        t1y = (brow(BX_HIY) - roy) * ivy
        t0z = (brow(BX_LOZ) - roz) * ivz
        t1z = (brow(BX_HIZ) - roz) * ivz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        # per-ray pruning against the running best (ordered-traversal
        # analog: rays that already found a closer hit skip the block)
        hitb = (tf >= jnp.maximum(tn, 0.0)) & (tn < best0[:, None])
        if any_hit:
            hitb = hitb & (slot0 < 0)[:, None]  # shadowed lanes retire

        base_slot = pair_sb[i] * (SB * BLOCK)

        for k in range(SB):
            nk = jnp.sum(hitb[:, k].astype(jnp.int32))  # scalar reduce

            @pl.when(nk > 0)
            def _mt(k=k):
                def trow(c):
                    return tri_ref[0, c,
                                   k * BLOCK:(k + 1) * BLOCK][None, :]

                best = out_ref[:, OC_T]
                slot_best = jax.lax.bitcast_convert_type(
                    out_ref[:, OC_SLOT], jnp.int32)

                e1x, e1y, e1z = trow(TC_E1X), trow(TC_E1Y), trow(TC_E1Z)
                e2x, e2y, e2z = trow(TC_E2X), trow(TC_E2Y), trow(TC_E2Z)

                px = rdy * e2z - rdz * e2y
                py = rdz * e2x - rdx * e2z
                pz = rdx * e2y - rdy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv = 1.0 / jnp.where(jnp.abs(det) < _DET_EPS,
                                      _DET_EPS, det)

                sx = rox - trow(TC_V0X)
                sy = roy - trow(TC_V0Y)
                sz = roz - trow(TC_V0Z)
                uu = (sx * px + sy * py + sz * pz) * inv
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                vv = (rdx * qx + rdy * qy + rdz * qz) * inv
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv

                ok = ((jnp.abs(det) >= _DET_EPS)
                      & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                      & (tt > PZERO) & (trow(TC_VALID) > 0.5)
                      & hitb[:, k][:, None])
                tt = jnp.where(ok & (tt < best[:, None]), tt, INF_DIST)

                j = jnp.argmin(tt, axis=1)                     # [TILE]
                tj = jnp.min(tt, axis=1)
                better = tj < best

                best = jnp.where(better, tj, best)
                slot_best = jnp.where(better,
                                      base_slot + k * BLOCK + j,
                                      slot_best)

                colid = jax.lax.broadcasted_iota(jnp.int32, (TILE, 8), 1)
                out = jnp.where(colid == OC_T, best[:, None],
                                out_ref[:, :])
                out = jnp.where(
                    colid == OC_SLOT,
                    jax.lax.bitcast_convert_type(
                        slot_best, jnp.float32)[:, None],
                    out)
                out_ref[:, :] = out

    return kernel


@partial(jax.jit, static_argnames=("window", "any_hit"))
def pallas_sb_intersect_windowed(
    pair_tile,               # i32[L] pair list, tile-major; pad -> nt
    pair_sb,                 # i32[L] superblock ids (pad -> sentinel)
    n_real: jax.Array,       # i32[] number of real pairs
    rays,                    # f32[(nt+1)*TILE, 16]
    planes,                  # f32[nsb+1, 16, SB*BLOCK] (last = sentinel)
    boxes,                   # f32[nsb+1, 8, 8]
    window: int = 1024,
    any_hit: bool = False,
):
    """Exact pair execution: while_loop over fixed-size pair windows.

    Each window runs one ``pallas_call`` whose BlockSpec index maps pull
    the superblock planes/boxes straight out of HBM (contiguous DMAs,
    double-buffered by Mosaic); per-tile bests carry across windows via
    the prior-input/first-flag handoff, and tiles untouched in a window
    keep their carried values through the output aliasing.
    """
    n_rows = rays.shape[0]
    n_tiles_pad = n_rows // TILE - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(window,),
        in_specs=[
            pl.BlockSpec((TILE, RAY_COLS),
                         lambda i, pt, psb, fp: (pt[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, SB * BLOCK),
                         lambda i, pt, psb, fp: (psb[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 8),
                         lambda i, pt, psb, fp: (psb[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 8),
                         lambda i, pt, psb, fp: (pt[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE, 8),
            lambda i, pt, psb, fp: (pt[i], 0),
            memory_space=pltpu.VMEM),
    )

    # CPU (tests / virtual mesh) has no Mosaic — fall back to the
    # interpreter there; real TPU compiles the kernel.
    interpret = jax.default_backend() == "cpu"
    call = pl.pallas_call(
        _make_sb_kernel(any_hit),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, 8), jnp.float32),
        # prior (input 6 = 3 scalar-prefetch + rays + planes + boxes +
        # prior) aliases the output: tiles untouched by a window keep
        # their carried values in place, so the driver needs no merge.
        input_output_aliases={6: 0},
        interpret=interpret,
    )

    # initial best: t = t_cap (ray column 6), slot = -1
    colid = jnp.arange(8)[None, :]
    neg1 = jax.lax.bitcast_convert_type(
        jnp.full((n_rows,), -1, jnp.int32), jnp.float32)
    init_out = jnp.where(
        colid == OC_T, rays[:, RC_TCAP][:, None],
        jnp.where(colid == OC_SLOT, neg1[:, None], 0.0))

    def cond(state):
        start, out = state
        more = start < n_real
        if any_hit:
            # shadow queries retire once every real lane is shadowed
            slots = jax.lax.bitcast_convert_type(out[:, OC_SLOT],
                                                 jnp.int32)
            more = more & ~jnp.all(slots[:n_rows - TILE] >= 0)
        return more

    def body(state):
        start, out = state
        pt = jax.lax.dynamic_slice(pair_tile, (start,), (window,))
        psb = jax.lax.dynamic_slice(pair_sb, (start,), (window,))
        live = (start + jnp.arange(window, dtype=jnp.int32)) < n_real
        pt = jnp.where(live, pt, n_tiles_pad)
        fp = jnp.concatenate([
            jnp.ones((1,), jnp.int32),
            (pt[1:] != pt[:-1]).astype(jnp.int32)])
        out = call(pt, psb, fp, rays, planes, boxes, out)
        return start + window, out

    _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), init_out))
    return out
