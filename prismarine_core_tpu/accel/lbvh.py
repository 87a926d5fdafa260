"""Morton-ordered complete-tree BVH: the TPU-native acceleration structure.

Replaces the reference's entire GPU HLBVH pipeline —
minmax reduction (``hlbvh/minmax.comp``), Morton emit
(``hlbvh/aabbmaker.comp``), 8-pass radix sort (``radix/*``, ``Radix.hpp``),
Karras LBVH emit with a ≤256-iteration host loop
(``hlbvh/build-new.comp``, ``TriangleHierarchy.inl:304-314``), leaf link
(``child-link.comp``) and atomic-flag refit (``refit.comp``) — with four
fully-vectorized XLA steps and **zero host synchronization**:

1. scene bounds: one ``jnp.min/max`` (vs 32-workgroup shared-memory tree
   reduction + CPU union);
2. Morton codes + ``lax.sort`` of (code, index) (vs hand-rolled radix);
3. leaf AABBs by reshape-reduction over K-triangle leaves;
4. internal AABBs by log2(L) level-order reshape reductions (vs
   atomicCompSwap visit flags).

The hierarchy itself is *implicit*: leaves are the sorted triangle order
chopped into K-sized runs, and internal node i has children 2i+1 / 2i+2
in a heap layout (a median-split over Morton order).  Structure arrays
(skip links) depend only on the tree depth, so they are compile-time
constants — the traversal needs no per-ray stack at all, which is the
right shape for TPU vector lanes (the reference instead spills an 8-entry
shared-memory stack to a global buffer, ``directTraverse.comp:40-70``).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from prismarine_core_tpu.models.geometry import TriangleSoup
from prismarine_core_tpu.ops.morton import morton30, quantize_unit

#: padding AABB placed "at infinity" — always misses the slab test.
EMPTY_BOX = 1.0e30


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BVH:
    """Heap-ordered complete binary BVH over Morton-sorted triangles.

    N = 2L-1 nodes for L = 2^depth leaves of ``leaf_size`` triangles.
    Leaves occupy heap slots [L-1, 2L-1); leaf j covers reordered
    triangle slots [j*K, (j+1)*K).
    """

    lo: jax.Array       # f32[N,3] node AABB min
    hi: jax.Array       # f32[N,3] node AABB max
    skip: jax.Array     # i32[N] preorder escape link; N == "done"
    tv0: jax.Array      # f32[L*K,3] reordered triangle vertices
    tv1: jax.Array
    tv2: jax.Array
    orig: jax.Array     # i32[L*K] slot -> original triangle id (-1 pad)

    @property
    def n_nodes(self) -> int:
        return self.lo.shape[0]

    @property
    def n_leaves(self) -> int:
        return (self.n_nodes + 1) // 2

    @property
    def leaf_size(self) -> int:
        return self.tv0.shape[0] // self.n_leaves

    @property
    def first_leaf(self) -> int:
        return self.n_leaves - 1


@lru_cache(maxsize=None)
def _skip_links(depth: int) -> np.ndarray:
    """Static escape links for the heap-indexed complete tree.

    skip(left child)  = its right sibling
    skip(right child) = skip(parent)
    skip(root)        = N  (the done sentinel)

    Built level-by-level with vectorized slices; cached per depth since it
    is pure structure (independent of scene content).
    """
    n = 2 ** (depth + 1) - 1
    skip = np.full(n, n, np.int32)
    for d in range(depth):
        idx = np.arange(2 ** d - 1, 2 ** (d + 1) - 1)
        skip[2 * idx + 1] = (2 * idx + 2).astype(np.int32)
        skip[2 * idx + 2] = skip[idx]
    return skip


def _tree_depth(n_tris: int, leaf_size: int) -> int:
    n_leaves_needed = max(-(-n_tris // leaf_size), 1)
    depth = max(int(np.ceil(np.log2(n_leaves_needed))), 0)
    # Keep total slots (n_leaves * leaf_size) a multiple of 512 so the
    # packet/Pallas block view (accel/packet.py: BLOCK=128, superblocks
    # of 4 blocks) aligns with the slot arrays without re-padding.
    min_depth = max(int(np.ceil(np.log2(512 / leaf_size))), 0)
    return max(depth, min_depth)


@partial(jax.jit, static_argnames=("leaf_size",))
def build_bvh(soup: TriangleSoup, leaf_size: int = 4) -> BVH:
    """Build the BVH from a (padded) triangle soup. Fully jittable: one
    XLA program, no host round-trips (the reference needs 4+ CPU syncs
    per rebuild, ``TriangleHierarchy.inl:209-314``)."""
    assert leaf_size & (leaf_size - 1) == 0, \
        "leaf_size must be a power of two (slot/block alignment)"
    t = soup.capacity
    depth = _tree_depth(t, leaf_size)
    n_leaves = 2 ** depth
    n_slots = n_leaves * leaf_size
    n_nodes = 2 * n_leaves - 1

    # 1. scene bounds over valid triangle centroids.
    centroid = (soup.v0 + soup.v1 + soup.v2) / 3.0
    big = jnp.float32(EMPTY_BOX)
    vmask = soup.valid[:, None]
    cmin = jnp.min(jnp.where(vmask, centroid, big), axis=0)
    cmax = jnp.max(jnp.where(vmask, centroid, -big), axis=0)
    extent = jnp.maximum(cmax - cmin, 1e-6)

    # 2. Morton codes (invalid tris get the max key so they sort last),
    #    then a single stable lax.sort of (code, index) replaces the
    #    reference's 8x256-way radix sort (Radix.hpp:57-69).
    unit = (centroid - cmin) / extent
    codes = morton30(quantize_unit(unit))
    codes = jnp.where(soup.valid, codes, jnp.uint32(0xFFFFFFFF))
    order = jnp.arange(t, dtype=jnp.int32)
    _, order = jax.lax.sort((codes, order), num_keys=1, is_stable=True)

    # 3. reorder triangles into leaf slots (pad with degenerate zeros).
    def scatter_pad(src):
        out = jnp.zeros((n_slots, 3), src.dtype)
        return out.at[: min(t, n_slots)].set(src[order][:n_slots])

    tv0 = scatter_pad(soup.v0)
    tv1 = scatter_pad(soup.v1)
    tv2 = scatter_pad(soup.v2)
    orig = jnp.full((n_slots,), -1, jnp.int32)
    sorted_valid = soup.valid[order][:n_slots]
    orig = orig.at[: min(t, n_slots)].set(
        jnp.where(sorted_valid, order[:n_slots], -1))

    # Degenerate-at-origin padding would produce huge leaf boxes; mask
    # invalid slots to the *inverted* box (lo=+big, hi=-big), the neutral
    # element of AABB union, so empty slots vanish from reductions.
    slot_valid = orig >= 0
    svm = slot_valid[:, None]
    slo = jnp.where(svm, jnp.minimum(jnp.minimum(tv0, tv1), tv2), big)
    shi = jnp.where(svm, jnp.maximum(jnp.maximum(tv0, tv1), tv2), -big)

    # leaf AABBs: reshape-reduction over K slots per leaf.
    leaf_lo = slo.reshape(n_leaves, leaf_size, 3).min(axis=1)
    leaf_hi = shi.reshape(n_leaves, leaf_size, 3).max(axis=1)

    # 4. internal AABBs bottom-up, one vectorized union per level
    #    (log2 L steps; replaces refit.comp's atomic visit flags).
    lo = jnp.full((n_nodes, 3), big, jnp.float32)
    hi = jnp.full((n_nodes, 3), -big, jnp.float32)
    lo = lo.at[n_leaves - 1:].set(leaf_lo)
    hi = hi.at[n_leaves - 1:].set(leaf_hi)
    for d in range(depth - 1, -1, -1):
        lo_c = lo[2 ** (d + 1) - 1: 2 ** (d + 2) - 1]
        hi_c = hi[2 ** (d + 1) - 1: 2 ** (d + 2) - 1]
        lo = lo.at[2 ** d - 1: 2 ** (d + 1) - 1].set(
            lo_c.reshape(-1, 2, 3).min(axis=1))
        hi = hi.at[2 ** d - 1: 2 ** (d + 1) - 1].set(
            hi_c.reshape(-1, 2, 3).max(axis=1))

    # Inverted (empty) boxes would *pass* the slab test; convert them to a
    # point box at +big, which always fails it.
    empty = (lo > hi).any(axis=-1, keepdims=True)
    lo = jnp.where(empty, big, lo)
    hi = jnp.where(empty, big, hi)

    return BVH(
        lo=lo, hi=hi,
        skip=jnp.asarray(_skip_links(depth)),
        tv0=tv0, tv1=tv1, tv2=tv2, orig=orig,
    )
