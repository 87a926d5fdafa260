"""Gradient correctness: autodiff vs central finite differences.

BASELINE.json config 4: albedo + vertex-position (+ light) gradients must
allclose finite differences.  Uses fixed sample arrays so the estimator
is deterministic and FD is exact up to O(eps^2) — except where a
parameter crosses a discrete threshold (branch coin / visibility), which
the detached-visibility estimator intentionally ignores; the scenes and
epsilons here are chosen away from such thresholds.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prismarine_core_tpu.models.camera import Camera
from prismarine_core_tpu.models.scene import make_cornell_scene
from prismarine_core_tpu.ops.sampling import make_sample_arrays
from prismarine_core_tpu.render.integrator import render_with_samples
from prismarine_core_tpu.utils.config import RenderConfig

CAM = Camera.look_at(eye=(0.0, 0.0, 3.4), target=(0.0, 0.0, 0.0),
                     fov_y_deg=50.0)
CFG = RenderConfig(width=24, height=24, spp=1, max_bounces=2,
                   intersector="bvh")


def _setup(seed=0):
    scene = make_cornell_scene()
    cam_s, bounce_s = make_sample_arrays(
        jax.random.key(seed), CFG.n_rays, CFG.max_bounces)
    return scene, cam_s, bounce_s


def _loss_through(scene, cam_s, bounce_s, rebuild_bvh=False):
    """Scalar image functional. Weighted sum (not plain sum) so
    per-parameter gradients differ."""
    w = jnp.linspace(0.5, 1.5, CFG.n_pixels * 3).reshape(
        CFG.height, CFG.width, 3)

    def f(scene):
        if rebuild_bvh:
            scene = scene.with_bvh()
        img = render_with_samples(scene, CAM, CFG, cam_s, bounce_s)
        return jnp.sum(img * w)

    return f


@pytest.mark.parametrize("param", ["diffuse", "light_color", "emissive"])
def test_grad_matches_fd_linear_params(param):
    """Albedo / light / emissive gradients (no visibility dependence)."""
    scene, cam_s, bounce_s = _setup()
    f = _loss_through(scene, cam_s, bounce_s)

    if param == "diffuse":
        get = lambda s: s.materials.diffuse
        put = lambda s, x: dataclasses.replace(
            s, materials=dataclasses.replace(s.materials, diffuse=x))
    elif param == "light_color":
        get = lambda s: s.lights.color
        put = lambda s, x: dataclasses.replace(
            s, lights=dataclasses.replace(s.lights, color=x))
    else:
        get = lambda s: s.materials.emissive
        put = lambda s, x: dataclasses.replace(
            s, materials=dataclasses.replace(s.materials, emissive=x))

    x0 = get(scene)
    g = jax.grad(lambda x: f(put(scene, x)))(x0)
    g = np.asarray(g)

    rng = np.random.default_rng(0)
    # Probe RGB channels only: the alpha channel feeds the stochastic
    # pass-through *coin*, a discrete decision whose true derivative the
    # detached estimator defines as 0 (FD instead jumps when eps crosses
    # a coin threshold).
    idxs = [(int(rng.integers(0, x0.shape[0])),
             int(rng.integers(0, min(3, x0.shape[1]))))
            for _ in range(6)]
    eps = 1e-2
    for idx in idxs:
        xp = x0.at[idx].add(eps)
        xm = x0.at[idx].add(-eps)
        fd = (float(f(put(scene, xp))) - float(f(put(scene, xm)))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=1e-3,
                                   err_msg=f"{param}[{idx}]")


def test_grad_matches_fd_vertices():
    """Vertex-position gradients through the (fixed-BVH) hit re-eval.

    The BVH is built once from the base geometry and kept fixed across
    the FD probes (eps is far below the node-box slack), isolating the
    differentiable t/u/v path exactly as autodiff sees it."""
    scene, cam_s, bounce_s = _setup()
    f = _loss_through(scene, cam_s, bounce_s)

    put = lambda s, x: dataclasses.replace(
        s, triangles=dataclasses.replace(s.triangles, v0=x))
    x0 = scene.triangles.v0
    g = np.asarray(jax.grad(lambda x: f(put(scene, x)))(x0))

    # Systematic sweep with a quantified match rate: probe every
    # candidate coordinate with non-negligible autodiff gradient (up to
    # a cap), classify each against central FD, and require a high
    # match rate.  The FD loss accumulates the weighted image in f64
    # outside jit — the f32 sum (~300) would otherwise quantize away
    # eps-sized changes and dominate the FD with rounding noise.
    # Silhouette-edge crossings make FD and the detached estimator
    # legitimately disagree on a minority of coordinates
    # (interior-derivative vs the distributional derivative); the rate
    # bounds how often that happens at this eps.
    w64 = np.linspace(0.5, 1.5, CFG.n_pixels * 3).reshape(
        CFG.height, CFG.width, 3)

    @jax.jit
    def _img(x):
        return render_with_samples(put(scene, x), CAM, CFG, cam_s,
                                   bounce_s)

    def f64(x):
        return float((np.asarray(_img(x), np.float64) * w64).sum())

    # Classify each coordinate by FD eps-consistency: where central FD
    # agrees across two epsilons the loss is locally smooth and autodiff
    # MUST match; where FD explodes/varies with eps a silhouette crossed
    # within +-eps — the detached estimator's known zero-measure blind
    # spot (addressed separately by the edge-aware estimator and its
    # tests).  Smooth points must match at >=90%; discontinuities are
    # counted and bounded, not silently skipped.
    eps = 5e-4
    rng = np.random.default_rng(1)
    cand = rng.permutation(int(scene.triangles.num_valid()))
    probed = smooth = matched = 0
    mismatches = []
    for tri in cand:
        if probed >= 40:
            break
        for axis in range(3):
            idx = (int(tri), axis)
            if abs(g[idx]) < 1e-2:
                continue
            probed += 1

            def fd_at(e):
                return (f64(x0.at[idx].add(e))
                        - f64(x0.at[idx].add(-e))) / (2 * e)

            fd1 = fd_at(eps)
            fd2 = fd_at(eps / 4)
            if abs(fd1 - fd2) > 0.1 * (abs(fd1) + abs(fd2)) + 1e-2:
                continue  # discontinuity crossing within +-eps
            smooth += 1
            rel = abs(g[idx] - fd2) / (abs(fd2) + 1e-2)
            if rel < 0.10:
                matched += 1
            else:
                mismatches.append((idx, float(g[idx]), fd2))
    assert probed >= 20, f"only {probed} coordinates had |g| >= 1e-2"
    assert smooth >= 15, (
        f"only {smooth}/{probed} coordinates were FD-smooth")
    rate = matched / smooth
    assert rate >= 0.9, (
        f"smooth-point FD match rate {matched}/{smooth} = {rate:.2f} "
        f"< 0.9; mismatches: {mismatches[:5]}")


def test_grad_camera_params():
    """Gradients w.r.t. camera eye (novel vs reference)."""
    scene, cam_s, bounce_s = _setup()

    def f(eye):
        cam = Camera(eye=eye, target=CAM.target, up=CAM.up,
                     fov_y=CAM.fov_y)
        img = render_with_samples(scene, cam, CFG, cam_s, bounce_s)
        return jnp.sum(img)

    g = jax.grad(f)(CAM.eye)
    assert bool(jnp.isfinite(g).all())
    assert bool((jnp.abs(g) > 0).any())
