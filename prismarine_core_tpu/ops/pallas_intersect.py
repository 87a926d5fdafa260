"""Pallas TPU kernel: dense (ray-tile x triangle-block) intersection.

The hot op of the framework.  The XLA packet path (accel/packet.py)
expresses the same math but materializes [tiles, 128, 128] intermediates
through HBM; this kernel keeps one 128-ray tile and one 128-triangle
block in VMEM per grid step and accumulates the per-tile closest hit
in-place, so HBM traffic is just the pair stream (~12 KB/step DMA,
pipelined by Pallas) instead of gigabytes of broadcast temporaries.

Layouts (all Mosaic-legal block shapes):
  rays   f32[(nt+1)*TILE, 8]  — block (TILE, 8); component columns
         [ox oy oz dx dy dz t_cap pad]; rays land on sublanes.
  tris   f32[nb, 16, BLOCK]   — block (1, 16, BLOCK); component rows
         [v0x v0y v0z e1x e1y e1z e2x e2y e2z valid 0...]; triangles
         land on lanes.
  out    f32[(nt+1)*TILE, 8]  — block (TILE, 8); columns
         [t slot u v 0...] (slot is an int32 BITCAST into the f32
         column; Mosaic has no int<->float converts on this path).
The hot math is [TILE, BLOCK] = [128, 128] f32, the exact VPU register
shape, written component-wise (the 128-wide generalization of the
reference's 2-wide packed Möller–Trumbore, ``vertex.glsl:117-189``).

Scheduling: the caller compacts the conservative tile/block overlap
matrix into a pair list sorted by tile.  `PrefetchScalarGridSpec` makes
the pair arrays available before each grid step so BlockSpec index_maps
DMA the right ray tile / triangle block (the guide's scalar-prefetch
pattern).  Pairs of the same tile are consecutive, so the output block
stays resident in VMEM across them; `first_pair` flags initialize it.

The grid is sequential on a TPU core — in-place accumulation across
grid steps is race-free by construction (the reference needs warp-level
atomics for the same job, ``ballotlib.glsl:106-132``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prismarine_core_tpu.utils.config import INF_DIST, PZERO

TILE = 128
BLOCK = 128
_DET_EPS = 1e-10

# ray component columns
RC_OX, RC_OY, RC_OZ, RC_DX, RC_DY, RC_DZ, RC_TCAP, _RC_PAD = range(8)
# triangle component rows
(TC_V0X, TC_V0Y, TC_V0Z, TC_E1X, TC_E1Y, TC_E1Z,
 TC_E2X, TC_E2Y, TC_E2Z, TC_VALID) = range(10)
# output columns
OC_T, OC_SLOT, OC_U, OC_V = range(4)


#: triangle blocks processed per grid step (one "superblock") — bigger
#: steps amortize the per-step grid/DMA overhead that dominated at one
#: block per step.
QUAD = 4


def _pair_kernel(pair_tile, pair_block, first_pair,
                 ray_ref,                             # [TILE, 8]
                 tri_ref,                             # [QUAD, 16, BLOCK]
                 prior_ref,                           # [TILE, 8]
                 out_ref):                            # [TILE, 8]
    i = pl.program_id(0)

    colid = jax.lax.broadcasted_iota(jnp.int32, (TILE, 8), 1)

    def set_cols(base, **cols):
        """Functional column update on a [TILE, 8] array (Mosaic has no
        scatter; a lane-mask select per column compiles cleanly)."""
        out = base
        for c, val in cols.items():
            out = jnp.where(colid == int(c), val[:, None], out)
        return out

    @pl.when(first_pair[i] == 1)
    def _init():
        # first visit of this tile *within this window*: seed the VMEM
        # accumulator from the previous window's best (or the caller's
        # t_cap/-1 initialization on the first window).
        out_ref[:, :] = prior_ref[:, :]

    # rays on sublanes, triangles on lanes: [TILE, BLOCK]
    def rcol(c):
        return ray_ref[:, c][:, None]

    rdx, rdy, rdz = rcol(RC_DX), rcol(RC_DY), rcol(RC_DZ)
    rox, roy, roz = rcol(RC_OX), rcol(RC_OY), rcol(RC_OZ)

    best = out_ref[:, OC_T]                                 # [TILE]
    slot_best = jax.lax.bitcast_convert_type(out_ref[:, OC_SLOT],
                                             jnp.int32)
    u_best = out_ref[:, OC_U]
    v_best = out_ref[:, OC_V]
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, BLOCK), 1)

    for q in range(QUAD):
        def trow(c):
            return tri_ref[q, c, :][None, :]

        e1x, e1y, e1z = trow(TC_E1X), trow(TC_E1Y), trow(TC_E1Z)
        e2x, e2y, e2z = trow(TC_E2X), trow(TC_E2Y), trow(TC_E2Z)

        px = rdy * e2z - rdz * e2y
        py = rdz * e2x - rdx * e2z
        pz = rdx * e2y - rdy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv = 1.0 / jnp.where(jnp.abs(det) < _DET_EPS, _DET_EPS, det)

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
        tt = jnp.where(ok & (tt < best[:, None]), tt, INF_DIST)

        j = jnp.argmin(tt, axis=1)                          # [TILE]
        tj = jnp.min(tt, axis=1)
        better = tj < best

        sel = cols == j[:, None]
        uj = jnp.sum(jnp.where(sel, uu, 0.0), axis=1)
        vj = jnp.sum(jnp.where(sel, vv, 0.0), axis=1)

        base = (pair_block[i] * QUAD + q) * BLOCK
        best = jnp.where(better, tj, best)
        slot_best = jnp.where(better, base + j, slot_best)
        u_best = jnp.where(better, uj, u_best)
        v_best = jnp.where(better, vj, v_best)

    out_ref[:, :] = set_cols(
        out_ref[:, :],
        **{str(OC_T): best,
           str(OC_SLOT): jax.lax.bitcast_convert_type(slot_best,
                                                      jnp.float32),
           str(OC_U): u_best,
           str(OC_V): v_best})


@partial(jax.jit, static_argnames=("window", "any_hit"))
def pallas_pair_intersect_windowed(
    pair_tile, pair_block,   # i32[L] full pair list, tile-major; padding
                             # pairs target tile nt (the dummy row);
                             # pair_block is in SUPERBLOCK (QUAD) units
    n_real: jax.Array,       # i32[] number of real pairs
    rays,                    # f32[(nt+1)*TILE, 8]
    tris,                    # f32[nb, 16, BLOCK], nb % QUAD == 0
    window: int = 4096,
    any_hit: bool = False,
):
    """Exact pair execution: while_loop over fixed-size pair windows,
    each one `pallas_call` over the window grid; per-tile bests carry
    across windows through the prior-input/first-flag handoff.  No pair
    budget, no dropped work — the while trip count adapts to the scene
    (total pairs / window) without recompilation.

    Returns f32[(nt+1)*TILE, 8] columns [t, slot(bitcast i32), u, v,..].
    """
    n_rows = rays.shape[0]
    n_tiles_pad = n_rows // TILE - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(window,),
        in_specs=[
            pl.BlockSpec((TILE, 8),
                         lambda i, pt, pb, fp: (pt[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QUAD, 16, BLOCK),
                         lambda i, pt, pb, fp: (pb[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 8),
                         lambda i, pt, pb, fp: (pt[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 8),
                               lambda i, pt, pb, fp: (pt[i], 0),
                               memory_space=pltpu.VMEM),
    )

    # CPU (tests / virtual mesh) has no Mosaic — fall back to the
    # interpreter there; real TPU compiles the kernel.
    interpret = jax.default_backend() == "cpu"
    call = pl.pallas_call(
        _pair_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, 8), jnp.float32),
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
        pb = jax.lax.dynamic_slice(pair_block, (start,), (window,))
        # mask pairs beyond the real count to the padding tile
        live = (start + jnp.arange(window, dtype=jnp.int32)) < n_real
        pt = jnp.where(live, pt, n_tiles_pad)
        fp = jnp.concatenate([
            jnp.ones((1,), jnp.int32),
            (pt[1:] != pt[:-1]).astype(jnp.int32)])
        res = call(pt, pb, fp, rays, tris, out)
        # output blocks of tiles NOT visited this window are undefined —
        # keep the carried values there.
        visited = jnp.zeros((n_tiles_pad + 1,), bool).at[pt].set(True)
        vrows = jnp.repeat(visited, TILE)[:, None]
        out = jnp.where(vrows, res, out)
        return start + window, out

    _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), init_out))
    return out
