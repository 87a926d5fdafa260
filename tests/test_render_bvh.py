"""BVH-intersected renders must match brute-force renders exactly-ish."""

import jax
import numpy as np

from prismarine_core_tpu.models.camera import Camera
from prismarine_core_tpu.models.scene import make_cornell_scene
from prismarine_core_tpu.ops.sampling import make_sample_arrays
from prismarine_core_tpu.render.integrator import render_with_samples
from prismarine_core_tpu.utils.config import RenderConfig

CAM = Camera.look_at(eye=(0.0, 0.0, 3.4), target=(0.0, 0.0, 0.0),
                     fov_y_deg=50.0)


def test_bvh_render_matches_brute():
    scene = make_cornell_scene()
    cfg_bvh = RenderConfig(width=32, height=32, spp=1, max_bounces=3,
                           intersector="bvh")
    cfg_brt = cfg_bvh.replace(intersector="brute")
    cam_s, bounce_s = make_sample_arrays(
        jax.random.key(7), cfg_bvh.n_rays, cfg_bvh.max_bounces)
    img_b = np.asarray(render_with_samples(scene, CAM, cfg_bvh,
                                           cam_s, bounce_s))
    img_r = np.asarray(render_with_samples(scene, CAM, cfg_brt,
                                           cam_s, bounce_s))
    diff = np.abs(img_b - img_r)
    assert (diff.max(axis=-1) > 1e-3).mean() < 0.005
    assert img_b.mean() > 1e-2


def test_bvh_render_gradients():
    scene = make_cornell_scene()
    cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=2,
                       intersector="bvh")
    cam_s, bounce_s = make_sample_arrays(
        jax.random.key(3), cfg.n_rays, cfg.max_bounces)

    def loss(diffuse):
        import dataclasses
        mats = dataclasses.replace(scene.materials, diffuse=diffuse)
        s2 = dataclasses.replace(scene, materials=mats)
        img = render_with_samples(s2, CAM, cfg, cam_s, bounce_s)
        return img.sum()

    g = jax.grad(loss)(scene.materials.diffuse)
    assert bool(jax.numpy.isfinite(g).all())
    assert bool((jax.numpy.abs(g) > 0).any())
