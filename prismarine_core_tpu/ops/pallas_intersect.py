"""Pallas TPU kernel: dense (ray-tile x triangle-block-quad) intersection.

The hot op of the framework.  Pointer-chasing BVH walks are
latency-bound on TPU (every step is a ~4 B/lane random HBM gather); this
kernel restructures intersection as dense batched work: one 128-ray tile
against four 128-triangle blocks per grid step, everything in VMEM.

Layouts (all Mosaic-legal block shapes):
  rays   f32[(nt+1)*TILE, 8]  — block (TILE, 8); component columns
         [ox oy oz dx dy dz t_cap pad]; rays land on sublanes.
  tris   f32[window, 4, 16, BLOCK] — per-window *gathered* quads of
         blocks (XLA gathers 32 KB contiguous slices per quad at HBM
         bandwidth); component rows [v0xyz e1xyz e2xyz valid 0...];
         triangles land on lanes.
  out    f32[(nt+1)*TILE, 8]  — block (TILE, 8); columns
         [t slot u v 0...] (slot is an int32 BITCAST into the f32
         column; Mosaic has no int<->float converts on this path).

The hot math is [TILE, BLOCK] = [128, 128] f32 — the exact VPU register
shape — written component-wise (the 128-wide generalization of the
reference's 2-wide packed Möller–Trumbore, ``vertex.glsl:117-189``).

Scheduling: the caller culls blocks per ray (exactly), chunks each
tile's candidate list into quads, and streams quads tile-major.
`PrefetchScalarGridSpec` provides per-step tile ids / block ids /
first-of-tile flags; pairs of the same tile are consecutive, so the
output block stays VMEM-resident and accumulates the running closest
hit across steps (sequential grid => race-free, no atomics — the
reference needs warp-aggregated atomics for the same job,
``ballotlib.glsl:106-132``).  Windows of quads execute inside a
while_loop so cost adapts to the scene without recompilation.
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
QUAD = 4
_DET_EPS = 1e-10

# ray component columns
RC_OX, RC_OY, RC_OZ, RC_DX, RC_DY, RC_DZ, RC_TCAP, _RC_PAD = range(8)
# triangle component rows
(TC_V0X, TC_V0Y, TC_V0Z, TC_E1X, TC_E1Y, TC_E1Z,
 TC_E2X, TC_E2Y, TC_E2Z, TC_VALID) = range(10)
# output columns
OC_T, OC_SLOT, OC_U, OC_V = range(4)


def _quad_kernel(pair_tile, b0, b1, b2, b3, first_pair,
                 ray_ref,                             # [TILE, 8]
                 tri_ref,                             # [1, QUAD, 16, BLOCK]
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
    bases = (b0, b1, b2, b3)

    for q in range(QUAD):
        def trow(c):
            return tri_ref[0, q, c, :][None, :]

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

        base = bases[q][i] * BLOCK
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
def pallas_quad_intersect_windowed(
    quad_tile,               # i32[L] quad list, tile-major; pad -> nt
    quad_blocks,             # i32[L, QUAD] block ids (pad -> sentinel)
    n_real: jax.Array,       # i32[] number of real quads
    rays,                    # f32[(nt+1)*TILE, 8]
    planes,                  # f32[nb+1, 16, BLOCK] (last = sentinel)
    window: int = 2048,
    any_hit: bool = False,
):
    """Exact quad execution: while_loop over fixed-size quad windows.

    Each window gathers its quads' triangle planes (contiguous 8 KB
    slices — HBM-bandwidth friendly) into a [window, 4, 16, BLOCK]
    stream the kernel consumes one step at a time; per-tile bests carry
    across windows via the prior-input/first-flag handoff, and tiles
    untouched in a window are merged back from the carry.
    """
    n_rows = rays.shape[0]
    n_tiles_pad = n_rows // TILE - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(window,),
        in_specs=[
            pl.BlockSpec((TILE, 8),
                         lambda i, pt, b0, b1, b2, b3, fp: (pt[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QUAD, 16, BLOCK),
                         lambda i, pt, b0, b1, b2, b3, fp: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 8),
                         lambda i, pt, b0, b1, b2, b3, fp: (pt[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE, 8),
            lambda i, pt, b0, b1, b2, b3, fp: (pt[i], 0),
            memory_space=pltpu.VMEM),
    )

    # CPU (tests / virtual mesh) has no Mosaic — fall back to the
    # interpreter there; real TPU compiles the kernel.
    interpret = jax.default_backend() == "cpu"
    call = pl.pallas_call(
        _quad_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, 8), jnp.float32),
        # prior (input 8 = 6 scalar-prefetch + rays + tris + prior)
        # aliases the output: tiles untouched by a window keep their
        # carried values in place, so the driver needs no merge pass.
        input_output_aliases={8: 0},
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
        pt = jax.lax.dynamic_slice(quad_tile, (start,), (window,))
        qb = jax.lax.dynamic_slice(quad_blocks, (start, 0),
                                   (window, QUAD))
        live = (start + jnp.arange(window, dtype=jnp.int32)) < n_real
        pt = jnp.where(live, pt, n_tiles_pad)
        fp = jnp.concatenate([
            jnp.ones((1,), jnp.int32),
            (pt[1:] != pt[:-1]).astype(jnp.int32)])
        tris_w = planes[qb]          # [window, QUAD, 16, BLOCK] gather
        out = call(pt, qb[:, 0], qb[:, 1], qb[:, 2], qb[:, 3], fp,
                   rays, tris_w, out)
        return start + window, out

    _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), init_out))
    return out
