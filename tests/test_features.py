"""Feature tests: interlacing, bump mapping, textures, checkpointing,
profiling, DOF/360 cameras."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from prismarine_core_tpu.models.camera import Camera, generate_rays
from prismarine_core_tpu.models.scene import make_cornell_scene
from prismarine_core_tpu.models.textures import TextureStack, sample_bilinear
from prismarine_core_tpu.render.integrator import interlace_mask, render
from prismarine_core_tpu.render.pipeline import ProgressiveRenderer
from prismarine_core_tpu.utils.config import RenderConfig

CAM = Camera.look_at(eye=(0, 0, 3.4), target=(0, 0, 0), fov_y_deg=50)


def test_interlace_mask():
    cfg = RenderConfig(width=4, height=4)
    m0 = np.asarray(interlace_mask(cfg, 0))
    m1 = np.asarray(interlace_mask(cfg, 1))
    assert (m0 ^ m1).all()           # complementary
    assert m0.sum() == 8


def test_interlaced_render_covers_all_pixels():
    cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=2,
                       interlace=True)
    r = ProgressiveRenderer(make_cornell_scene(), CAM, cfg)
    img1 = np.asarray(r.step())      # half the pixels
    m0 = np.asarray(interlace_mask(cfg, 0))
    assert (img1[~m0] == 0).all()
    img2 = np.asarray(r.step())      # other half filled in
    # both parities now contribute (cornell has legitimately black
    # pixels — env is black — so compare parity coverage, not totals)
    assert (img2 * ~m0[..., None]).sum() > 0
    assert (img2 * m0[..., None]).sum() > 0


def test_texture_sampling_and_textured_render():
    # checkerboard texture
    tex = np.zeros((8, 8, 4), np.float32)
    tex[::2, ::2] = 1.0
    tex[1::2, 1::2] = 1.0
    tex[..., 3] = 1.0
    stack = TextureStack.from_images([tex], resolution=8)
    uv = jnp.asarray([[0.06, 0.06], [0.19, 0.06]])
    c = np.asarray(sample_bilinear(stack, jnp.asarray([0, 0]), uv))
    assert c[0, 0] > 0.5 and c[1, 0] < 0.5

    scene = make_cornell_scene()
    mats = dataclasses.replace(
        scene.materials,
        tex_diffuse=scene.materials.tex_diffuse.at[0].set(0))
    scene = dataclasses.replace(scene, materials=mats,
                                textures=stack)
    cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=1)
    img = np.asarray(render(scene, CAM, cfg, jax.random.key(0)))
    assert np.isfinite(img).all()


def test_bump_mapping_changes_shading():
    scene = make_cornell_scene()
    # cornell has degenerate UVs (no tangent space) — give triangles a
    # planar parameterization so normal mapping has something to act on
    t = scene.triangles
    tris = dataclasses.replace(
        t,
        t0=t.v0[:, :2] * 0.5 + 0.5,
        t1=t.v1[:, :2] * 0.5 + 0.5,
        t2=t.v2[:, :2] * 0.5 + 0.5,
    )
    scene = dataclasses.replace(scene, triangles=tris)
    cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=2)
    base = np.asarray(render(scene, CAM, cfg, jax.random.key(0)))

    rng = np.random.default_rng(0)
    bump = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    bump[..., 2] = 1.0
    stack = TextureStack.from_images([bump], resolution=8)
    mats = dataclasses.replace(
        scene.materials,
        tex_bump=scene.materials.tex_bump.at[0].set(0))
    scene2 = dataclasses.replace(scene, materials=mats, textures=stack)
    bumped = np.asarray(render(scene2, CAM, cfg, jax.random.key(0)))
    assert np.isfinite(bumped).all()
    assert np.abs(bumped - base).max() > 1e-3   # shading changed


def test_dof_and_360_cameras():
    cfg = RenderConfig(width=8, height=8, spp=1, dof=True)
    cam_s = jax.random.uniform(jax.random.key(0), (64, 4))
    o, d = generate_rays(CAM, cfg, cam_s)
    assert np.asarray(o).std(axis=0).max() > 0  # lens offsets vary
    cfg2 = RenderConfig(width=8, height=8, spp=1, camera_360=True)
    o2, d2 = generate_rays(CAM, cfg2, cam_s)
    # 360 directions cover both hemispheres
    assert float(np.asarray(d2)[:, 2].min()) < -0.5
    assert float(np.asarray(d2)[:, 2].max()) > 0.5


def test_checkpoint_roundtrip(tmp_path):
    from prismarine_core_tpu.utils.checkpoint import (
        load_renderer, save_renderer)
    cfg = RenderConfig(width=8, height=8, spp=1, max_bounces=1)
    r = ProgressiveRenderer(make_cornell_scene(), CAM, cfg)
    r.step()
    r.step()
    img = r.snapshot()
    save_renderer(str(tmp_path / "ck"), r)

    r2 = ProgressiveRenderer(make_cornell_scene(), CAM, cfg)
    load_renderer(str(tmp_path / "ck"), r2)
    assert r2._n_frames == 2
    np.testing.assert_allclose(r2.snapshot(), img, rtol=1e-6)
    # continued stepping matches (same key state)
    a = np.asarray(r.step())
    b = np.asarray(r2.step())
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_profiling_harness():
    from prismarine_core_tpu.utils.profiling import StageTimers, time_fn
    timers = StageTimers()
    x = jnp.ones((128, 128))
    with timers.stage("matmul", sync=None):
        y = x @ x
    jax.block_until_ready(y)
    assert "matmul" in timers.report()
    dt = time_fn(lambda a: a @ a, x, warmup=1, iters=2)
    assert dt >= 0
