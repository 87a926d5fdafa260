"""Unit tests for intersection kernels vs brute-force numpy math."""

import jax.numpy as jnp
import numpy as np
import pytest

from prismarine_core_tpu.models.geometry import TriangleSoup, make_box
from prismarine_core_tpu.ops.intersect import (
    intersect_aabb, intersect_closest_brute, intersect_sphere,
    moller_trumbore, occluded_brute)
from prismarine_core_tpu.utils.config import INF_DIST


def test_moller_trumbore_single_hit():
    v0 = jnp.array([0.0, 0.0, 0.0])
    v1 = jnp.array([1.0, 0.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])
    o = jnp.array([0.2, 0.2, 1.0])
    d = jnp.array([0.0, 0.0, -1.0])
    t, u, v, ok = moller_trumbore(o, d, v0, v1, v2)
    assert bool(ok)
    np.testing.assert_allclose(float(t), 1.0, rtol=1e-6)
    np.testing.assert_allclose([float(u), float(v)], [0.2, 0.2], rtol=1e-5)


def test_moller_trumbore_double_sided():
    v0 = jnp.array([0.0, 0.0, 0.0])
    v1 = jnp.array([1.0, 0.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])
    o = jnp.array([0.2, 0.2, -1.0])
    d = jnp.array([0.0, 0.0, 1.0])
    t, u, v, ok = moller_trumbore(o, d, v0, v1, v2)
    assert bool(ok)
    np.testing.assert_allclose(float(t), 1.0, rtol=1e-6)


def test_moller_trumbore_miss():
    v0 = jnp.array([0.0, 0.0, 0.0])
    v1 = jnp.array([1.0, 0.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])
    o = jnp.array([2.0, 2.0, 1.0])
    d = jnp.array([0.0, 0.0, -1.0])
    t, _, _, ok = moller_trumbore(o, d, v0, v1, v2)
    assert not bool(ok)
    assert float(t) == INF_DIST


@pytest.mark.parametrize("capacity", [12, 100])
def test_closest_brute_vs_numpy(capacity):
    rng = np.random.default_rng(0)
    verts, faces, mids = make_box((-1, -1, -1), (1, 1, 1))
    soup = TriangleSoup.from_arrays(verts, faces, mat_ids=mids,
                                    capacity=capacity)
    n_rays = 64
    o = rng.normal(size=(n_rays, 3)).astype(np.float32) * 3.0
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    hit = intersect_closest_brute(soup, jnp.asarray(o), jnp.asarray(d),
                                  block=16)

    # numpy brute force over the same 12 triangles
    v0 = np.asarray(soup.v0)[:12]
    v1 = np.asarray(soup.v1)[:12]
    v2 = np.asarray(soup.v2)[:12]
    for i in range(n_rays):
        e1, e2 = v1 - v0, v2 - v0
        p = np.cross(np.broadcast_to(d[i], e2.shape), e2)
        det = np.sum(e1 * p, -1)
        inv = 1.0 / np.where(np.abs(det) < 1e-10, 1e-10, det)
        s = o[i] - v0
        u = np.sum(s * p, -1) * inv
        q = np.cross(s, e1)
        vv = np.sum(d[i] * q, -1) * inv
        t = np.sum(e2 * q, -1) * inv
        ok = ((np.abs(det) >= 1e-10) & (u >= 0) & (vv >= 0)
              & (u + vv <= 1) & (t > 0.0005))
        t = np.where(ok, t, INF_DIST)
        j = int(np.argmin(t))
        if t[j] >= INF_DIST:
            assert int(hit.tri[i]) == -1
        else:
            assert int(hit.tri[i]) == j
            np.testing.assert_allclose(float(hit.t[i]), t[j], rtol=1e-4)


def test_occluded_brute():
    verts, faces, mids = make_box((-1, -1, -1), (1, 1, 1))
    soup = TriangleSoup.from_arrays(verts, faces, mat_ids=mids)
    o = jnp.array([[0.0, 0.0, 5.0], [0.0, 5.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t_max = jnp.array([100.0, 100.0])
    occ = occluded_brute(soup, o, d, t_max, block=16)
    assert bool(occ[0])       # through the box
    assert not bool(occ[1])   # above the box
    # beyond t_max -> not occluded
    occ2 = occluded_brute(soup, o, d, jnp.array([1.0, 1.0]), block=16)
    assert not bool(occ2[0])


def test_aabb_slab():
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    lo = jnp.array([[-1.0, -1.0, -1.0]])
    hi = jnp.array([[1.0, 1.0, 1.0]])
    tn, hitm = intersect_aabb(o, inv, lo, hi)
    assert bool(hitm[0])
    np.testing.assert_allclose(float(tn[0]), 4.0, rtol=1e-5)
    # ray starting inside
    tn2, h2 = intersect_aabb(jnp.zeros((1, 3)), inv, lo, hi)
    assert bool(h2[0])


def test_sphere():
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t = intersect_sphere(o, d, jnp.zeros(3), 1.0)
    np.testing.assert_allclose(float(t[0]), 4.0, rtol=1e-5)
    # inside sphere -> far hit
    t2 = intersect_sphere(jnp.zeros((1, 3)), d, jnp.zeros(3), 1.0)
    np.testing.assert_allclose(float(t2[0]), 1.0, rtol=1e-5)
    # miss
    t3 = intersect_sphere(o + 10.0, d, jnp.zeros(3), 1.0)
    assert float(t3[0]) == INF_DIST
