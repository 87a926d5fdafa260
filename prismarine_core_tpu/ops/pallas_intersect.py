"""Pallas TPU kernel: dense (ray-tile x triangle-superblock) intersection
— the hot op of the framework.

Pointer-chasing BVH walks are latency-bound on TPU (every step is a
~4 B/lane random HBM gather); this kernel restructures intersection as
dense batched work: one 128-ray tile against one 8-block superblock
(1024 Morton-adjacent triangle slots) per grid step, everything in VMEM.

Scheduling (see accel/packet.py for the producer):

  * the caller culls rays at BLOCK granularity (ops/pallas_cull.py;
    superblock candidates and the per-pair 8-bit block masks fall out
    of one pass) and compacts (tile, superblock) pairs tile-major with
    one windowed packed scatter — the r1 pipeline's ~15M-element
    quad-list scatters were its hottest stage at 173 ms/query;
  * per grid step, BlockSpec index maps pull the superblock's triangle
    planes (one contiguous 64 KB DMA, double-buffered by Mosaic)
    straight from HBM via the scalar-prefetched pair list;
  * the kernel runs the dense 128x128 Möller–Trumbore ONLY for
    sub-blocks whose mask bit is set — `pl.when` on an SMEM scalar, the
    cheap form of TPU control flow (an earlier revision computed the
    mask in-kernel with vector->scalar reductions; the 8 pipeline syncs
    per step made it ~10x slower than the MT itself).

Layouts (all Mosaic-legal block shapes):
  rays   f32[(nt+1)*TILE, 16] — block (TILE, 16); component columns
         [ox oy oz dx dy dz t_cap pad ...]; rays land on sublanes.
  planes f32[nsb+1, 16, SB*BLOCK] — per-superblock SoA triangle
         components [v0xyz e1xyz e2xyz valid 0...]; triangles land on
         lanes, sub-block k occupying lanes [128k, 128k+128).  Row
         TC_VALID is 0 for padding slots; the trailing superblock is
         all-zero (the pair-padding sentinel).
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
# output columns
OC_T, OC_SLOT = range(2)


def _sb_kernel(pps, pair_tile, pair_sb, pair_mask, first_step,
               ray_ref,                        # [TILE, 16]
               *refs):                         # pps tri refs, prior,
                                               # out, run_tt, run_k
    tri_refs = refs[:pps]                      # each [1, 16, SB*BLOCK]
    prior_ref, out_ref, run_tt, run_k = refs[pps:]
    i = pl.program_id(0)

    @pl.when(first_step[i] == 1)
    def _init():
        # first visit of this tile *within this window*: seed the VMEM
        # accumulator from the previous window's best (or the caller's
        # t_cap/-1 initialization on the first window).
        out_ref[:, :] = prior_ref[:, :]

    def rcol(c):
        return ray_ref[:, c][:, None]

    rox, roy, roz = rcol(RC_OX), rcol(RC_OY), rcol(RC_OZ)
    rdx, rdy, rdz = rcol(RC_DX), rcol(RC_DY), rcol(RC_DZ)

    # DEFERRED-ARGMIN accumulation: each live sub-block folds its
    # candidate (t, j*SB+k) into a step-local [TILE, BLOCK] running min
    # with three elementwise ops; the expensive cross-lane argmin + the
    # accumulator merge run ONCE per STEP (= ``pps`` same-tile pairs)
    # instead of once per sub-block.  Strict < keeps tie-breaking
    # (lowest pair, then lowest k, then lowest lane) identical to the
    # sequential form, so results are bit-identical.
    run_tt[:, :] = jnp.full((TILE, BLOCK), INF_DIST, jnp.float32)
    run_k[:, :] = jnp.zeros((TILE, BLOCK), jnp.float32)

    any_mask = pair_mask[i * pps]
    for j in range(1, pps):
        any_mask = any_mask | pair_mask[i * pps + j]

    for j in range(pps):
        mask_j = pair_mask[i * pps + j]
        for k in range(SB):
            @pl.when((mask_j >> k) & 1 == 1)
            def _mt(j=j, k=k):
                def trow(c):
                    return tri_refs[j][0, c,
                                       k * BLOCK:(k + 1) * BLOCK][None, :]

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
                      & (tt > PZERO) & (trow(TC_VALID) > 0.5))
                tt = jnp.where(ok, tt, INF_DIST)

                better = tt < run_tt[:, :]
                run_k[:, :] = jnp.where(better,
                                        jnp.float32(j * SB + k),
                                        run_k[:, :])
                run_tt[:, :] = jnp.where(better, tt, run_tt[:, :])

    @pl.when(any_mask != 0)
    def _merge():
        rt = run_tt[:, :]
        best = out_ref[:, OC_T]
        slot_best = jax.lax.bitcast_convert_type(
            out_ref[:, OC_SLOT], jnp.int32)

        j = jnp.argmin(rt, axis=1)                         # [TILE]
        tj = jnp.min(rt, axis=1)
        better = tj < best

        onehot = (jax.lax.broadcasted_iota(jnp.int32, (TILE, BLOCK), 1)
                  == j[:, None])
        kj = jnp.sum(jnp.where(onehot, run_k[:, :], 0.0),
                     axis=1).astype(jnp.int32)             # [TILE]

        # decode (pair jj, sub-block kk) and select that pair's base
        # slot (scalar multipliers over vector predicates)
        jj = kj // SB
        kk = kj - jj * SB
        base = jnp.zeros_like(kj)
        for jx in range(pps):
            base = jnp.where(jj == jx,
                             pair_sb[i * pps + jx] * (SB * BLOCK), base)

        best = jnp.where(better, tj, best)
        slot_best = jnp.where(better,
                              base + kk * BLOCK + j,
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


@partial(jax.jit, static_argnames=("window", "pairs_per_step"))
def pallas_sb_intersect_windowed(
    pair_tile,               # i32[L] pair list, tile-major; pad -> nt
    pair_sb,                 # i32[L] superblock ids (pad -> sentinel)
    pair_mask,               # i32[L] 8-bit per-block masks (pad -> 0)
    n_real: jax.Array,       # i32[] number of real pairs
    rays,                    # f32[(nt+1)*TILE, 16]
    planes,                  # f32[nsb+1, 16, SB*BLOCK] (last = sentinel)
    window: int = 1024,
    prior=None,              # f32[(nt+1)*TILE, 8] carried bests (round 2+)
    pairs_per_step: int = 1,
):
    """Exact pair execution: while_loop over fixed-size pair windows.

    Each window runs one ``pallas_call`` whose BlockSpec index maps pull
    the superblock planes straight out of HBM (contiguous DMAs,
    double-buffered by Mosaic); per-tile bests carry across windows via
    the prior-input/first-flag handoff, and tiles untouched in a window
    keep their carried values through the output aliasing.  ``prior``
    seeds the accumulator from an earlier round's result instead of the
    t_cap/-1 initialization (the multi-round front-to-back query).

    ``pairs_per_step`` > 1 executes that many consecutive pairs per
    grid step (separate double-buffered plane inputs), amortizing the
    fixed per-step cost (measured 0.3-0.56 us/pair in round 3 — about
    a third of coherent kernel time).  REQUIRES the pair list to be
    tile-aligned: every aligned group of ``pairs_per_step`` pairs
    shares one tile (packet.py compacts with ``align=`` padding).
    """
    pps = pairs_per_step
    assert window % pps == 0
    n_rows = rays.shape[0]
    n_tiles_pad = n_rows // TILE - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(window // pps,),
        in_specs=[
            pl.BlockSpec((TILE, RAY_COLS),
                         lambda i, pt, psb, pm, fp: (pt[i * pps], 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, 16, SB * BLOCK),
                         (lambda j: lambda i, pt, psb, pm, fp:
                          (psb[i * pps + j], 0, 0))(j),
                         memory_space=pltpu.VMEM)
            for j in range(pps)
        ] + [
            pl.BlockSpec((TILE, 8),
                         lambda i, pt, psb, pm, fp: (pt[i * pps], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE, 8),
            lambda i, pt, psb, pm, fp: (pt[i * pps], 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TILE, BLOCK), jnp.float32),   # run_tt
            pltpu.VMEM((TILE, BLOCK), jnp.float32),   # run_k
        ],
    )

    # CPU (tests / virtual mesh) has no Mosaic — fall back to the
    # interpreter there; real TPU compiles the kernel.
    interpret = jax.default_backend() == "cpu"
    call = pl.pallas_call(
        partial(_sb_kernel, pps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, 8), jnp.float32),
        # prior (input 5+pps = 4 scalar-prefetch + rays + pps planes +
        # prior) aliases the output: tiles untouched by a window keep
        # their carried values in place, so the driver needs no merge.
        input_output_aliases={5 + pps: 0},
        interpret=interpret,
    )

    if prior is None:
        # initial best: t = t_cap (ray column 6), slot = -1
        colid = jnp.arange(8)[None, :]
        neg1 = jax.lax.bitcast_convert_type(
            jnp.full((n_rows,), -1, jnp.int32), jnp.float32)
        init_out = jnp.where(
            colid == OC_T, rays[:, RC_TCAP][:, None],
            jnp.where(colid == OC_SLOT, neg1[:, None], 0.0))
    else:
        init_out = prior

    def cond(state):
        # NOTE: deliberately no any-hit early-exit here — reading the
        # aliased ``out`` in the loop condition forces XLA to copy the
        # whole accumulator every window (~30 MB at 720p; measured 2x
        # slower shadow queries than closest-hit ones).
        start, _ = state
        return start < n_real

    def body(state):
        start, out = state
        pt = jax.lax.dynamic_slice(pair_tile, (start,), (window,))
        psb = jax.lax.dynamic_slice(pair_sb, (start,), (window,))
        pm = jax.lax.dynamic_slice(pair_mask, (start,), (window,))
        live = (start + jnp.arange(window, dtype=jnp.int32)) < n_real
        pt = jnp.where(live, pt, n_tiles_pad)
        pm = jnp.where(live, pm, 0)
        pt_s = pt[::pps]                 # tile of each STEP
        fp = jnp.concatenate([
            jnp.ones((1,), jnp.int32),
            (pt_s[1:] != pt_s[:-1]).astype(jnp.int32)])
        # the same planes array feeds every per-pair input slot; only
        # the index maps differ
        out = call(pt, psb, pm, fp, rays, *([planes] * pps), out)
        return start + window, out

    _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), init_out))
    return out
