"""Stackless BVH traversal on TPU vector lanes.

Replaces ``ShadersSDK/raytracing/directTraverse.comp`` (511 LoC: per-ray
state machine, 8-entry shared-memory stack + global spill, baked-hit
sort/dedup).  The TPU formulation: every ray holds one ``node`` pointer;
one bulk `lax.while_loop` steps all rays together (masked lanes), each
step doing a gathered AABB slab test plus — for rays parked at a leaf —
a K-wide Möller–Trumbore test against the leaf's reordered triangles.
The skip-link layout (accel/lbvh.py) removes the stack entirely, which is
what the reference's own `esc` escape-index logic approximates
(``directTraverse.comp:377,429``).

Differentiability (SURVEY.md §7 stage 6, "detached visibility"): reverse
mode cannot pass through `lax.while_loop`, so the traversal runs entirely
on `stop_gradient` inputs and yields only the *discrete* hit triangle id;
(t, u, v) are then re-evaluated differentiably for that one triangle from
the live soup vertices.  Gradients flow to vertex positions / ray origin
/ direction through the re-evaluation; the BVH structure itself is
detached (its boxes are built from the same vertices but only gate
visibility, which has zero a.e. derivative anyway).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from prismarine_core_tpu.accel.lbvh import BVH
from prismarine_core_tpu.models.geometry import TriangleSoup
from prismarine_core_tpu.ops.intersect import Hit, moller_trumbore
from prismarine_core_tpu.utils.config import INF_DIST, PZERO


def _traverse(bvh: BVH, o, d, t_cap, any_hit: bool):
    """Core skip-link walk (non-differentiable; call on detached inputs).

    Returns (t, slot, u, v): ``slot`` indexes the BVH's reordered
    triangle arrays (-1 = miss).  ``t_cap``: f32[R] far limit (e.g.
    shadow-ray light distance) — doubles as the pruning bound.
    ``any_hit``: lanes retire at the first accepted hit (shadow query).
    """
    r = o.shape[0]
    n = bvh.n_nodes
    first_leaf = bvh.first_leaf
    k = bvh.leaf_size

    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                            jnp.where(d < 0, -1e-12, 1e-12), d)

    def cond(state):
        node = state[0]
        return jnp.any(node < n)

    def body(state):
        node, bt, bslot, bu, bv = state
        active = node < n
        ni = jnp.minimum(node, n - 1)

        lo = bvh.lo[ni]
        hi = bvh.hi[ni]
        t0 = (lo - o) * inv_d
        t1 = (hi - o) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        box_hit = (tf >= jnp.maximum(tn, PZERO)) & (tn < bt) & active

        is_leaf = ni >= first_leaf
        leaf = jnp.maximum(ni - first_leaf, 0)

        # K-wide triangle test for lanes parked at an intersected leaf.
        slot = leaf[:, None] * k + jnp.arange(k, dtype=jnp.int32)[None, :]
        tt, tu, tv, ok = moller_trumbore(
            o[:, None, :], d[:, None, :],
            bvh.tv0[slot], bvh.tv1[slot], bvh.tv2[slot])
        ok = ok & (bvh.orig[slot] >= 0) & (is_leaf & box_hit)[:, None]
        tt = jnp.where(ok & (tt < bt[:, None]), tt, INF_DIST)
        j = jnp.argmin(tt, axis=1)
        rows = jnp.arange(r)
        tj = tt[rows, j]
        better = tj < bt
        bt = jnp.where(better, tj, bt)
        bslot = jnp.where(better, slot[rows, j], bslot)
        bu = jnp.where(better, tu[rows, j], bu)
        bv = jnp.where(better, tv[rows, j], bv)

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, 2 * ni + 1, bvh.skip[ni])
        if any_hit:
            nxt = jnp.where(bslot >= 0, n, nxt)  # early out on first hit
        node = jnp.where(active, nxt, node)
        return node, bt, bslot, bu, bv

    init = (
        jnp.zeros((r,), jnp.int32),
        t_cap.astype(jnp.float32),
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
    )
    _, bt, bslot, bu, bv = jax.lax.while_loop(cond, body, init)
    return bt, bslot, bu, bv


def intersect_closest_bvh(bvh: BVH, soup: TriangleSoup, o, d) -> Hit:
    """Closest hit via BVH; differentiable w.r.t. soup vertices, o, d."""
    sg = jax.lax.stop_gradient
    _, slot, _, _ = _traverse(
        sg(bvh), sg(o), sg(d),
        jnp.full((o.shape[0],), INF_DIST), any_hit=False)
    tri = jnp.where(slot >= 0, bvh.orig[jnp.maximum(slot, 0)], -1)
    tri = sg(tri)

    # Differentiable re-evaluation of the chosen triangle (detached id).
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


def occluded_bvh(bvh: BVH, soup: TriangleSoup, o, d, t_max):
    """Any-hit query with early lane termination (binary visibility is
    detached, matching the reference's hard shadows)."""
    sg = jax.lax.stop_gradient
    _, slot, _, _ = _traverse(sg(bvh), sg(o), sg(d), sg(t_max),
                              any_hit=True)
    return slot >= 0
