"""Model-parallel intersection: shard the REAL (Pallas packet) intersector.

The r1 build could only shard the toy brute-force path; this module
shards the production intersector's *block ranges* over the mesh's
``model`` axis (SURVEY.md §7 stage 7, option (b)): each model shard owns
a contiguous superblock range of the Morton-sorted triangle slots —
planes, block/superblock AABBs and slot->triangle ids all split on their
leading axis — runs the full local query (dense superblock cull, pair
compaction, block masks, Pallas kernel), and the per-ray closest hits
min-reduce across ``model`` with one ``all_gather`` (rays stay sharded
over ``data``).  The reference has no distributed capability at all
(SURVEY.md §2: single GL context); the closest analog being replaced is
its single-GPU buffer traffic (``Pipeline.inl:325-359``).

Scene memory scales: the packet planes (the largest per-scene structure,
64 KB/superblock) are divided ``mp`` ways.  The triangle soup used for
the differentiable hit re-evaluation stays replicated (one gather per
ray); sharding it too would turn the re-eval into a collective gather
and is left for the multi-host big-scene path.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from prismarine_core_tpu.accel.lbvh import BVH, EMPTY_BOX
from prismarine_core_tpu.accel.packet import (
    SB, PacketSet, _run_packet_pallas, build_packet_set)
from prismarine_core_tpu.models.geometry import TriangleSoup
from prismarine_core_tpu.ops.intersect import Hit, moller_trumbore
from prismarine_core_tpu.utils.config import INF_DIST

try:  # jax >= 0.4.35 exposes it at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedPackets:
    """PacketSet arrays re-laid out for 'model'-axis sharding.

    All arrays lead with the superblock axis (padded to a multiple of
    the model-parallel degree); ``planes`` carries NO sentinel row —
    each shard appends its own locally.
    """

    planes: jax.Array    # f32[nsb, 16, SB*BLOCK]
    sb_lo: jax.Array     # f32[nsb, 3]
    sb_hi: jax.Array     # f32[nsb, 3]
    block_lo: jax.Array  # f32[nsb, SB, 3]
    block_hi: jax.Array  # f32[nsb, SB, 3]
    orig: jax.Array      # i32[nsb, SB*BLOCK] slot -> global triangle id
    root_lo: jax.Array   # f32[3]
    root_hi: jax.Array   # f32[3]

    @property
    def n_superblocks(self) -> int:
        return self.planes.shape[0]


def build_sharded_packets(bvh: BVH, mp: int) -> ShardedPackets:
    """Global PacketSet -> shard-friendly layout, nsb padded to mp."""
    ps = build_packet_set(bvh)
    nsb = ps.n_superblocks
    nsb_pad = -(-nsb // mp) * mp
    pad = nsb_pad - nsb
    big = jnp.float32(EMPTY_BOX)

    planes = ps.planes[:-1]                      # strip global sentinel
    block_lo = ps.block_lo.reshape(nsb, SB, 3)
    block_hi = ps.block_hi.reshape(nsb, SB, 3)
    orig = ps.slot_orig.reshape(nsb, -1)
    sb_lo, sb_hi = ps.sb_lo, ps.sb_hi
    if pad:
        planes = jnp.concatenate(
            [planes, jnp.zeros((pad,) + planes.shape[1:], jnp.float32)])
        block_lo = jnp.concatenate(
            [block_lo, jnp.full((pad, SB, 3), big)])
        block_hi = jnp.concatenate(
            [block_hi, jnp.full((pad, SB, 3), big)])
        sb_lo = jnp.concatenate([sb_lo, jnp.full((pad, 3), big)])
        sb_hi = jnp.concatenate([sb_hi, jnp.full((pad, 3), big)])
        orig = jnp.concatenate(
            [orig, jnp.full((pad, orig.shape[1]), -1, jnp.int32)])
    return ShardedPackets(planes=planes, sb_lo=sb_lo, sb_hi=sb_hi,
                          block_lo=block_lo, block_hi=block_hi,
                          orig=orig, root_lo=bvh.lo[0], root_hi=bvh.hi[0])


def shard_packets(sp: ShardedPackets, mesh: Mesh) -> ShardedPackets:
    """Place the packet arrays on the mesh: superblock axis over
    'model', root box replicated."""
    model = NamedSharding(mesh, P("model"))
    repl = NamedSharding(mesh, P())
    return ShardedPackets(
        planes=jax.device_put(sp.planes, model),
        sb_lo=jax.device_put(sp.sb_lo, model),
        sb_hi=jax.device_put(sp.sb_hi, model),
        block_lo=jax.device_put(sp.block_lo, model),
        block_hi=jax.device_put(sp.block_hi, model),
        orig=jax.device_put(sp.orig, model),
        root_lo=jax.device_put(sp.root_lo, repl),
        root_hi=jax.device_put(sp.root_hi, repl),
    )


def _local_query(sp_local: ShardedPackets, o, d, t_cap, any_hit: bool):
    """One shard's query against its local superblock range; returns
    (t, global triangle id) per local ray."""
    nsb_l = sp_local.planes.shape[0]
    planes = jnp.concatenate(
        [sp_local.planes,
         jnp.zeros((1,) + sp_local.planes.shape[1:], jnp.float32)])
    ps = PacketSet(
        block_lo=sp_local.block_lo.reshape(nsb_l * SB, 3),
        block_hi=sp_local.block_hi.reshape(nsb_l * SB, 3),
        sb_lo=sp_local.sb_lo, sb_hi=sp_local.sb_hi,
        planes=planes,
        slot_orig=sp_local.orig.reshape(-1),
    )
    t, slot, _ = _run_packet_pallas(sp_local.root_lo, sp_local.root_hi,
                                    ps, o, d, t_cap, any_hit=any_hit)
    tri = jnp.where(slot >= 0, ps.slot_orig[jnp.maximum(slot, 0)], -1)
    return t, tri


def make_sharded_query(mesh: Mesh, any_hit: bool = False):
    """shard_map-wrapped closest-hit/any-hit query: rays over 'data',
    superblock ranges over 'model', one all_gather('model') min-reduce.

    Returns fn(sp_sharded, o, d, t_cap) -> (t, tri) with o/d/t_cap
    sharded over 'data' and results likewise.
    """
    packs_spec = ShardedPackets(
        planes=P("model"), sb_lo=P("model"), sb_hi=P("model"),
        block_lo=P("model"), block_hi=P("model"), orig=P("model"),
        root_lo=P(), root_hi=P())

    def local_fn(sp_local, o, d, t_cap):
        t, tri = _local_query(sp_local, o, d, t_cap, any_hit)
        ts = jax.lax.all_gather(t, "model")        # [mp, r_local]
        tris = jax.lax.all_gather(tri, "model")
        # min-reduce over shards; on ties the lowest shard index wins
        # (deterministic); misses carry t == t_cap and tri == -1
        k = jnp.argmin(ts, axis=0)
        t = jnp.take_along_axis(ts, k[None], 0)[0]
        tri = jnp.take_along_axis(tris, k[None], 0)[0]
        return t, tri

    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(packs_spec, P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )


@partial(jax.jit, static_argnames=("mesh",))
def _noop(mesh):  # pragma: no cover
    pass


def sharded_intersect_closest(mesh: Mesh, sp: ShardedPackets,
                              soup: TriangleSoup, o, d,
                              t_cap=None) -> Hit:
    """Closest hit over the sharded scene; differentiable via the usual
    detached-id re-evaluation against the (replicated) soup."""
    sg = jax.lax.stop_gradient
    if t_cap is None:
        t_cap = jnp.full((o.shape[0],), INF_DIST)
    query = make_sharded_query(mesh, any_hit=False)
    _, tri = query(sg(sp), sg(o), sg(d), sg(t_cap))
    tri = sg(tri)
    trix = jnp.maximum(tri, 0)
    t, u, v, _ = moller_trumbore(
        o, d, soup.v0[trix], soup.v1[trix], soup.v2[trix])
    hitm = tri >= 0
    return Hit(t=jnp.where(hitm, t, INF_DIST), tri=tri,
               u=jnp.where(hitm, u, 0.0), v=jnp.where(hitm, v, 0.0))


def sharded_occluded(mesh: Mesh, sp: ShardedPackets, o, d, t_max):
    sg = jax.lax.stop_gradient
    query = make_sharded_query(mesh, any_hit=True)
    _, tri = query(sg(sp), sg(o), sg(d), sg(t_max))
    return tri >= 0
