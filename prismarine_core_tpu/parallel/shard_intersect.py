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

Scene memory scales: the packet planes (the largest per-scene
structure, 64 KB/superblock), the slot->triangle maps AND the triangle
vertices used for the differentiable hit re-evaluation are all divided
``mp`` ways.  Each model shard re-evaluates t/u/v for its own winning
slots against its LOCAL vertex shard *before* the min-reduce, and the
reduce carries the (t, u, v, tri) payload alongside the key — so no
replicated TriangleSoup gather remains anywhere in the query
(SURVEY.md §7 hard-part 6; the r2 build still gathered from a
replicated soup after the reduce).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from prismarine_core_tpu.accel.lbvh import BVH, EMPTY_BOX
from prismarine_core_tpu.accel.packet import (
    SB, PacketSet, _run_packet_pallas, build_packet_set)
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
    #: Morton-sorted triangle vertices for the differentiable re-eval,
    #: sharded like the planes (DIFFERENTIABLE leaves — unlike planes,
    #: which the query consumes under stop_gradient)
    tv0: jax.Array       # f32[nsb, SB*BLOCK, 3]
    tv1: jax.Array       # f32[nsb, SB*BLOCK, 3]
    tv2: jax.Array       # f32[nsb, SB*BLOCK, 3]
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
    spb = orig.shape[1]                          # slots per superblock

    def slots_per_sb(tv):                        # [S,3] -> [nsb,spb,3]
        s = tv.shape[0]
        want = nsb * spb
        if want > s:
            tv = jnp.concatenate(
                [tv, jnp.zeros((want - s, 3), tv.dtype)])
        return tv[:want].reshape(nsb, spb, 3)

    tv0 = slots_per_sb(bvh.tv0)
    tv1 = slots_per_sb(bvh.tv1)
    tv2 = slots_per_sb(bvh.tv2)
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
        zpad = jnp.zeros((pad, spb, 3), jnp.float32)
        tv0 = jnp.concatenate([tv0, zpad])
        tv1 = jnp.concatenate([tv1, zpad])
        tv2 = jnp.concatenate([tv2, zpad])
    return ShardedPackets(planes=planes, sb_lo=sb_lo, sb_hi=sb_hi,
                          block_lo=block_lo, block_hi=block_hi,
                          orig=orig, tv0=tv0, tv1=tv1, tv2=tv2,
                          root_lo=bvh.lo[0], root_hi=bvh.hi[0])


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
        tv0=jax.device_put(sp.tv0, model),
        tv1=jax.device_put(sp.tv1, model),
        tv2=jax.device_put(sp.tv2, model),
        root_lo=jax.device_put(sp.root_lo, repl),
        root_hi=jax.device_put(sp.root_hi, repl),
    )


def _local_query(sp_local: ShardedPackets, o, d, t_cap, any_hit: bool):
    """One shard's query against its local superblock range.

    Returns (t_key, t, u, v, tri): ``t_key`` is the detached kernel
    distance (the reduce key); t/u/v re-evaluate the winning slot
    against the shard's LOCAL vertex arrays, differentiably — no
    replicated soup anywhere.
    """
    nsb_l = sp_local.planes.shape[0]
    sg = jax.lax.stop_gradient
    planes = jnp.concatenate(
        [sg(sp_local.planes),
         jnp.zeros((1,) + sp_local.planes.shape[1:], jnp.float32)])
    ps = PacketSet(
        block_lo=sg(sp_local.block_lo).reshape(nsb_l * SB, 3),
        block_hi=sg(sp_local.block_hi).reshape(nsb_l * SB, 3),
        sb_lo=sg(sp_local.sb_lo), sb_hi=sg(sp_local.sb_hi),
        planes=planes,
        slot_orig=sp_local.orig.reshape(-1),
    )
    t_key, slot, _ = _run_packet_pallas(
        sg(sp_local.root_lo), sg(sp_local.root_hi),
        ps, sg(o), sg(d), sg(t_cap), any_hit=any_hit)
    slot = sg(slot)
    tri = jnp.where(slot >= 0, ps.slot_orig[jnp.maximum(slot, 0)], -1)
    # differentiable re-eval against the local vertex shard
    six = jnp.maximum(slot, 0)
    tvs = sp_local.tv0.reshape(-1, 3), sp_local.tv1.reshape(-1, 3), \
        sp_local.tv2.reshape(-1, 3)
    t, u, v, _ = moller_trumbore(o, d, tvs[0][six], tvs[1][six],
                                 tvs[2][six])
    hitm = tri >= 0
    t = jnp.where(hitm, t, INF_DIST)
    u = jnp.where(hitm, u, 0.0)
    v = jnp.where(hitm, v, 0.0)
    return t_key, t, u, v, tri


def make_sharded_query(mesh: Mesh, any_hit: bool = False):
    """shard_map-wrapped closest-hit/any-hit query: rays over 'data',
    superblock ranges over 'model', one all_gather('model') min-reduce.

    Returns fn(sp_sharded, o, d, t_cap) -> (t, u, v, tri) with
    o/d/t_cap sharded over 'data' and results likewise; t/u/v are
    differentiable w.r.t. the vertex shards and the rays.
    """
    packs_spec = ShardedPackets(
        planes=P("model"), sb_lo=P("model"), sb_hi=P("model"),
        block_lo=P("model"), block_hi=P("model"), orig=P("model"),
        tv0=P("model"), tv1=P("model"), tv2=P("model"),
        root_lo=P(), root_hi=P())

    def local_fn(sp_local, o, d, t_cap):
        t_key, t, u, v, tri = _local_query(sp_local, o, d, t_cap,
                                           any_hit)
        keys = jax.lax.all_gather(jax.lax.stop_gradient(t_key), "model")
        ts = jax.lax.all_gather(t, "model")        # [mp, r_local]
        us = jax.lax.all_gather(u, "model")
        vs = jax.lax.all_gather(v, "model")
        tris = jax.lax.all_gather(tri, "model")
        # min-reduce over shards; on ties the lowest shard index wins
        # (deterministic); misses carry t_key == t_cap and tri == -1
        k = jnp.argmin(keys, axis=0)[None]
        pick = lambda a: jnp.take_along_axis(a, k, 0)[0]  # noqa: E731
        return pick(ts), pick(us), pick(vs), pick(tris)

    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(packs_spec, P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data"), P("data")),
        check_vma=False,
    )


def constrain_packets(sp: ShardedPackets, mesh: Mesh) -> ShardedPackets:
    """`with_sharding_constraint` counterpart of ``shard_packets`` for
    packets built INSIDE a jitted computation (e.g. the train step's
    per-iteration rebuild): superblock axis over 'model', roots
    replicated."""
    def c(x, spec):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec))

    return ShardedPackets(
        planes=c(sp.planes, P("model")),
        sb_lo=c(sp.sb_lo, P("model")),
        sb_hi=c(sp.sb_hi, P("model")),
        block_lo=c(sp.block_lo, P("model")),
        block_hi=c(sp.block_hi, P("model")),
        orig=c(sp.orig, P("model")),
        tv0=c(sp.tv0, P("model")),
        tv1=c(sp.tv1, P("model")),
        tv2=c(sp.tv2, P("model")),
        root_lo=c(sp.root_lo, P()),
        root_hi=c(sp.root_hi, P()),
    )


def distribute_scene(scene, mesh: Mesh):
    """Scene -> mesh-distributed Scene for ``intersector='pallas_sharded'``.

    The packet structures (planes, AABBs, slot maps, re-eval vertices)
    shard over 'model'; everything else (materials, lights, textures,
    the attribute soup used for shading interpolation) replicates.
    Per-device intersection memory is ~1/mp of the single-device
    PacketSet (tests/test_parallel.py asserts it via
    ``addressable_shards``).
    """
    mp = mesh.shape["model"]
    sp = shard_packets(build_sharded_packets(scene.bvh, mp), mesh)
    repl = NamedSharding(mesh, P())
    scene = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl),
        dataclasses.replace(scene, packets=None, bvh=None))
    return dataclasses.replace(scene, packets=sp, bvh=None)


def sharded_intersect_closest(mesh: Mesh, sp: ShardedPackets, o, d,
                              t_cap=None) -> Hit:
    """Closest hit over the sharded scene — differentiable: each model
    shard re-evaluates its own winners locally (no replicated soup)."""
    if t_cap is None:
        t_cap = jnp.full((o.shape[0],), INF_DIST)
    query = make_sharded_query(mesh, any_hit=False)
    t, u, v, tri = query(sp, o, d, t_cap)
    return Hit(t=t, tri=tri, u=u, v=v)


def sharded_occluded(mesh: Mesh, sp: ShardedPackets, o, d, t_max):
    sg = jax.lax.stop_gradient
    query = make_sharded_query(mesh, any_hit=True)
    _, _, _, tri = query(sg(sp), sg(o), sg(d), sg(t_max))
    return tri >= 0
