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
         [t slot u v 0...] (slot stored as f32 — exact below 2^24).
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


def _pair_kernel(pair_tile, pair_block, first_pair, pair_base_f,
                 ray_ref,                             # [TILE, 8]
                 tri_ref,                             # [1, 16, BLOCK]
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
        tcap = ray_ref[:, RC_TCAP]
        out_ref[:, :] = set_cols(
            jnp.zeros((TILE, 8), jnp.float32),
            **{str(OC_T): tcap,
               str(OC_SLOT): jnp.full((TILE,), -1.0, jnp.float32)})

    # rays on sublanes, triangles on lanes: [TILE, BLOCK]
    def rcol(c):
        return ray_ref[:, c][:, None]

    def trow(c):
        return tri_ref[0, c, :][None, :]

    rdx, rdy, rdz = rcol(RC_DX), rcol(RC_DY), rcol(RC_DZ)
    e1x, e1y, e1z = trow(TC_E1X), trow(TC_E1Y), trow(TC_E1Z)
    e2x, e2y, e2z = trow(TC_E2X), trow(TC_E2Y), trow(TC_E2Z)

    px = rdy * e2z - rdz * e2y
    py = rdz * e2x - rdx * e2z
    pz = rdx * e2y - rdy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = 1.0 / jnp.where(jnp.abs(det) < _DET_EPS, _DET_EPS, det)

    sx = rcol(RC_OX) - trow(TC_V0X)
    sy = rcol(RC_OY) - trow(TC_V0Y)
    sz = rcol(RC_OZ) - trow(TC_V0Z)
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

    best = out_ref[:, OC_T]                                 # [TILE]
    tt = jnp.where(tt < best[:, None], tt, INF_DIST)
    j = jnp.argmin(tt, axis=1)                              # [TILE]
    tj = jnp.min(tt, axis=1)
    better = tj < best

    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, BLOCK), 1)
    sel = cols == j[:, None]
    uj = jnp.sum(jnp.where(sel, uu, 0.0), axis=1)
    vj = jnp.sum(jnp.where(sel, vv, 0.0), axis=1)
    # argmin as float without any int->float convert (Mosaic rejects
    # sitofp): select from a float iota.
    colsf = jax.lax.broadcasted_iota(jnp.float32, (TILE, BLOCK), 1)
    jf = jnp.sum(jnp.where(sel, colsf, 0.0), axis=1)

    base = pair_base_f[i]  # float block base, precomputed by the caller
    out = out_ref[:, :]
    out_ref[:, :] = set_cols(
        out,
        **{str(OC_T): jnp.where(better, tj, best),
           str(OC_SLOT): jnp.where(better, base + jf, out[:, OC_SLOT]),
           str(OC_U): jnp.where(better, uj, out[:, OC_U]),
           str(OC_V): jnp.where(better, vj, out[:, OC_V])})


@partial(jax.jit, static_argnames=("n_pairs",))
def pallas_pair_intersect(
    pair_tile, pair_block, first_pair,   # i32[P] (pairs sorted by tile)
    rays,                                # f32[(nt+1)*TILE, 8]
    tris,                                # f32[nb, 16, BLOCK]
    n_pairs: int,
):
    """Run the pair kernel; returns f32[(nt+1)*TILE, 8] output columns
    [t, slot, u, v, ...] (slot == -1 for miss, else a float slot id)."""
    n_rows = rays.shape[0]
    pair_base_f = (pair_block * BLOCK).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec((TILE, 8),
                         lambda i, pt, pb, fp, bf: (pt[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, BLOCK),
                         lambda i, pt, pb, fp, bf: (pb[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 8),
                               lambda i, pt, pb, fp, bf: (pt[i], 0),
                               memory_space=pltpu.VMEM),
    )

    # CPU (tests / virtual mesh) has no Mosaic — fall back to the
    # interpreter there; real TPU compiles the kernel.
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        _pair_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, 8), jnp.float32),
        interpret=interpret,
    )(pair_tile, pair_block, first_pair, pair_base_f, rays, tris)
