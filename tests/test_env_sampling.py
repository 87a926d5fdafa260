"""Environment importance sampling (cfg.env_nee) tests.

The reference's env() is only a miss-shading hook
(``ShadersSDK/public/environment.glsl:21-66``); this build adds filtered
(bilinear) lookup plus NEE toward the envmap's bright texels with
balance-heuristic MIS.  Verified here:

1. sample_env_direction's pdf is self-consistent with env_pdf;
2. importance-sampled Monte Carlo integrates the map to the same total
   as direct texel quadrature (the estimator is correctly normalized);
3. on a sun-disc HDR sky, env NEE cuts image variance at matched spp
   while preserving the mean (unbiasedness of the MIS combination).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from prismarine_core_tpu.models.camera import Camera
from prismarine_core_tpu.models.geometry import TriangleSoup, make_quad
from prismarine_core_tpu.models.lights import SphereLights
from prismarine_core_tpu.models.materials import MaterialTable
from prismarine_core_tpu.models.procedural import make_sky_environment
from prismarine_core_tpu.models.scene import Scene
from prismarine_core_tpu.models.textures import (
    Environment, env_pdf, sample_env_direction)
from prismarine_core_tpu.ops.sampling import make_sample_arrays
from prismarine_core_tpu.render.integrator import render_with_samples
from prismarine_core_tpu.utils.config import RenderConfig


def _sun_env(resolution=32):
    return make_sky_environment(resolution=resolution,
                                sun_dir=(0.3, 0.8, 0.2))


def test_env_sample_pdf_consistency():
    env = _sun_env()
    key = jax.random.key(3)
    u = jax.random.uniform(key, (4096, 2))
    d, pdf = sample_env_direction(env, u[:, 0], u[:, 1])
    # directions are unit
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(d, axis=-1)), 1.0, atol=1e-5)
    pdf_back = env_pdf(env, d)
    # texel-boundary jitter can land a handful of samples one texel
    # over; the bulk must map back to the same pdf
    ratio = np.asarray(pdf_back / pdf)
    frac_exact = np.mean(np.abs(ratio - 1.0) < 1e-3)
    assert frac_exact > 0.97, f"only {frac_exact:.1%} pdf-consistent"


def test_env_importance_integration_matches_quadrature():
    """E[lum(d)/pdf(d)] over the sampling distribution == integral of
    the map's luminance over the sphere (texel quadrature)."""
    env = _sun_env()
    h, w, _ = env.image.shape
    lum_w = jnp.asarray([0.2126, 0.7152, 0.0722])
    lum_img = np.asarray((env.image * env.scale) @ lum_w)
    theta = (np.arange(h) + 0.5) / h * np.pi
    d_omega = (2.0 * np.pi / w) * (np.pi / h) * np.sin(theta)[:, None]
    quadrature = float((lum_img * d_omega).sum())

    key = jax.random.key(11)
    u = jax.random.uniform(key, (200_000, 2))
    d, pdf = sample_env_direction(env, u[:, 0], u[:, 1])
    lum_s = (env.sample(d) @ lum_w)
    est = float(jnp.mean(lum_s / pdf))
    # bilinear filtering vs nearest quadrature costs a little accuracy
    assert abs(est - quadrature) / quadrature < 0.05, (
        f"MC {est:.4f} vs quadrature {quadrature:.4f}")


def _ground_scene():
    """A diffuse ground quad lit only by the HDR sun sky (no sphere
    lights): the worst case for naive BSDF sampling."""
    q = make_quad((-8, 0, -8), (8, 0, -8), (8, 0, 8), (-8, 0, 8),
                  mat_id=0)
    tris = TriangleSoup.from_arrays(q[0], q[1], mat_ids=q[2])
    mats = MaterialTable.build([{"diffuse": (0.8, 0.7, 0.6)}])
    lights = SphereLights.single(center=(0, 60.0, 0), radius=0.1,
                                 color=(0.0, 0.0, 0.0))
    return Scene.assemble(tris, mats, lights,
                          _sun_env(), build_bvh=False)


def test_env_nee_variance_drop_and_unbiasedness():
    scene = _ground_scene()
    cam = Camera.look_at(eye=(0.0, 3.0, 6.0), target=(0.0, 0.0, 0.0),
                         fov_y_deg=45.0)
    base = RenderConfig(width=24, height=24, spp=1, max_bounces=2,
                        intersector="brute", direct_light=False)
    seeds = range(10)

    def run(cfg):
        imgs = []
        for s in seeds:
            cam_s, bounce_s = make_sample_arrays(
                jax.random.key(s), cfg.n_rays, cfg.max_bounces)
            imgs.append(np.asarray(
                render_with_samples(scene, cam, cfg, cam_s, bounce_s)))
        return np.stack(imgs)

    off = run(base)
    on = run(dataclasses.replace(base, env_nee=True))

    # restrict to ground pixels (sky pixels are deterministic lookups)
    ground = off.mean(axis=(0, 3)) > 0.0
    ground &= on.var(axis=0).mean(-1) + off.var(axis=0).mean(-1) > 0
    v_off = float(off.var(axis=0).mean(-1)[ground].mean())
    v_on = float(on.var(axis=0).mean(-1)[ground].mean())
    assert v_on < v_off / 3.0, (
        f"env NEE variance {v_on:.5f} not <1/3 of naive {v_off:.5f}")

    m_off = float(off.mean())
    m_on = float(on.mean())
    # unbiasedness: means agree within combined noise (the naive
    # estimator is noisy; use a generous but meaningful bound)
    sem = off.mean(axis=(1, 2, 3)).std() / np.sqrt(len(off)) \
        + on.mean(axis=(1, 2, 3)).std() / np.sqrt(len(on))
    assert abs(m_on - m_off) < max(5 * sem, 0.05 * m_off), (
        f"means diverge: on={m_on:.4f} off={m_off:.4f} sem={sem:.4f}")


def test_bilinear_env_interpolates_between_texels():
    """A two-texel-wide map must interpolate smoothly in direction."""
    img = np.zeros((1, 4, 3), np.float32)
    img[0, 0] = 1.0
    env = Environment.from_image(img)
    # sweep phi across the texel centers: values must hit intermediate
    # levels (nearest lookup would be piecewise-constant {0, 1})
    phis = jnp.linspace(-jnp.pi, jnp.pi, 64, endpoint=False)
    d = jnp.stack([jnp.cos(phis), jnp.zeros_like(phis),
                   jnp.sin(phis)], axis=-1)
    vals = np.asarray(env.sample(d))[:, 0]
    assert ((vals > 0.2) & (vals < 0.8)).sum() >= 8, (
        "no intermediate values — lookup is not filtered")
    assert vals.max() > 0.9 and vals.min() < 0.1
