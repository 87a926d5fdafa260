"""Light-transport equivalence tests.

1. Stochastic-alpha vs layered compositing: the reference composites
   translucent hit *chains* deterministically per ray
   (``directTraverse.comp:116-250``, ``rayshading.comp:60-116``); this
   build replaces the chain with a single closest hit + an alpha coin
   (pass-through with probability 1-alpha).  The two agree in
   expectation — proven here on a 3-layer scene against the closed-form
   layered composite.

2. Motion-blur sample lock (``SAMPLES_LOCK``, ``sampler.comp:84-90``):
   the progressive accumulator with a lock becomes a rolling average
   that tracks scene changes; without it, history dominates.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from prismarine_core_tpu.models.camera import Camera
from prismarine_core_tpu.models.geometry import TriangleSoup, make_quad, merge_meshes
from prismarine_core_tpu.models.lights import SphereLights
from prismarine_core_tpu.models.materials import MaterialTable
from prismarine_core_tpu.models.scene import Scene
from prismarine_core_tpu.models.textures import Environment
from prismarine_core_tpu.ops.sampling import make_sample_arrays
from prismarine_core_tpu.render.integrator import render_with_samples
from prismarine_core_tpu.render.pipeline import ProgressiveRenderer
from prismarine_core_tpu.utils.config import RenderConfig


def _layer_scene(a1=0.4, a2=0.7, e1=0.8, e2=0.5, e_bg=1.2):
    """Three small 45-degree-tilted quads along -z: two translucent
    emissive layers and an opaque emissive backdrop.  Black diffuse
    kills the diffuse branch, env is black, NEE off, and the tilt sends
    the (unavoidable ~9%-probability) specular branch off sideways into
    empty space, so the only light is layer emission and the expected
    radiance equals the layered composite

        E[L] = e1 + (1-a1) * (e2 + (1-a2) * e_bg).
    """
    h = 0.55          # quad half-size: reflected rays exit the stack

    def tilted(zc, mid):
        # plane through (0,0,zc) with normal (0, s, s): spans x and the
        # in-plane axis t = (0, c, -c)
        c = np.sqrt(0.5)
        corners = []
        for sx, st in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
            corners.append((sx * h, st * h * c, zc - st * h * c))
        return make_quad(*corners, mat_id=mid)

    q1 = tilted(0.0, 0)
    q2 = tilted(-1.2, 1)
    bg = tilted(-2.4, 2)
    verts, faces, mids = merge_meshes([q1, q2, bg])
    tris = TriangleSoup.from_arrays(verts, faces, mat_ids=mids)
    mats = MaterialTable.build([
        {"diffuse": (0, 0, 0), "alpha": a1, "emissive": (e1, e1, e1)},
        {"diffuse": (0, 0, 0), "alpha": a2, "emissive": (e2, e2, e2)},
        {"diffuse": (0, 0, 0), "alpha": 1.0,
         "emissive": (e_bg, e_bg, e_bg)},
    ])
    lights = SphereLights.single(center=(0, 0, 50.0), radius=0.1,
                                 color=(0.0, 0.0, 0.0))
    return Scene.assemble(tris, mats, lights,
                          Environment.constant((0.0, 0.0, 0.0)))


def test_stochastic_alpha_matches_layered_compositing():
    a1, a2, e1, e2, e_bg = 0.4, 0.7, 0.8, 0.5, 1.2
    scene = _layer_scene(a1, a2, e1, e2, e_bg)
    expected = e1 + (1 - a1) * (e2 + (1 - a2) * e_bg)

    cfg = RenderConfig(width=16, height=16, spp=4, max_bounces=4,
                       direct_light=False)
    cam = Camera.look_at(eye=(0.0, 0.0, 3.0), target=(0.0, 0.0, 0.0),
                         fov_y_deg=5.0)
    vals = []
    for seed in range(12):
        cam_s, bounce_s = make_sample_arrays(jax.random.key(seed),
                                             cfg.n_rays, cfg.max_bounces)
        img = render_with_samples(scene, cam, cfg, cam_s, bounce_s)
        vals.append(np.asarray(img)[..., 0].ravel())
    samples = np.concatenate(vals)          # 12 * 256 * (spp-avg of 4)
    mean = samples.mean()
    stderr = samples.std() / np.sqrt(len(samples))
    assert abs(mean - expected) < max(4 * stderr, 0.02), (
        f"stochastic alpha mean {mean:.4f} != layered composite "
        f"{expected:.4f} (4*stderr={4*stderr:.4f})")


def test_per_path_variance_is_bounded():
    """Sanity: the alpha coin's variance exists (it is a Monte-Carlo
    estimator, not the reference's per-ray deterministic composite) but
    single-sample values stay within the physically possible range."""
    scene = _layer_scene()
    cfg = RenderConfig(width=8, height=8, spp=1, max_bounces=4,
                       direct_light=False)
    cam = Camera.look_at(eye=(0.0, 0.0, 3.0), target=(0.0, 0.0, 0.0),
                         fov_y_deg=5.0)
    cam_s, bounce_s = make_sample_arrays(jax.random.key(0), cfg.n_rays,
                                         cfg.max_bounces)
    img = np.asarray(render_with_samples(scene, cam, cfg, cam_s,
                                         bounce_s))
    assert img.min() >= 0.8 - 1e-5          # at least e1
    assert img.max() <= 0.8 + 0.5 + 1.2 + 1e-5


def test_samples_lock_rolling_average():
    """With samples_lock=N the accumulator tracks scene changes (rolling
    average, sampler.comp:84-90 MOTION_BLUR path); without it, history
    dominates and the image barely moves."""
    bright = _layer_scene(e_bg=1.2)
    dark = _layer_scene(e_bg=0.0, e1=0.0, e2=0.0)
    cam = Camera.look_at(eye=(0.0, 0.0, 3.0), target=(0.0, 0.0, 0.0),
                         fov_y_deg=5.0)

    def run(samples_lock):
        cfg = RenderConfig(width=8, height=8, spp=2, max_bounces=4,
                           direct_light=False,
                           samples_lock=samples_lock)
        r = ProgressiveRenderer(bright, cam, cfg, seed=0)
        r.render_frames(12)
        r.scene = dark                       # animate: lights go out
        return float(np.asarray(r.render_frames(4)).mean())

    locked = run(4)
    unlocked = run(0)
    # bright steady-state mean ~1.33; lock=4 decays by (3/4)^4 ~ 0.32x
    # after 4 dark frames, while the cumulative average retains 12/16.
    assert locked < 0.55, f"locked average should track change: {locked}"
    assert unlocked > 0.9, (
        f"unlocked average should retain history: {unlocked}")


def test_coherent_bounce_sampling_unbiased():
    """Coherent path tracing (cfg.coherent_bounce_sampling): block-
    correlated bounce samples must leave per-pixel expectations
    unchanged — the frame-averaged image converges to the independent
    estimator's mean."""
    from prismarine_core_tpu.models.scene import make_cornell_scene
    from prismarine_core_tpu.ops.sampling import (
        make_coherent_sample_arrays, make_sample_arrays)

    scene = make_cornell_scene()
    cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=3,
                       intersector="bvh")
    cam = Camera.look_at(eye=(0.0, 0.0, 3.4), target=(0.0, 0.0, 0.0),
                         fov_y_deg=50.0)

    def avg(maker, n=24):
        acc = None
        for s in range(n):
            cam_s, bounce_s = maker(jax.random.key(s))
            img = render_with_samples(scene, cam, cfg, cam_s, bounce_s)
            acc = img if acc is None else acc + img
        return np.asarray(acc) / n

    ind = avg(lambda k: make_sample_arrays(k, cfg.n_rays,
                                           cfg.max_bounces))
    coh = avg(lambda k: make_coherent_sample_arrays(k, cfg,
                                                    block=(4, 4)))
    # means agree within Monte-Carlo noise of 24 frames
    d = abs(float(ind.mean()) - float(coh.mean()))
    assert d < 0.05 * float(ind.mean()) + 0.01, (
        f"coherent sampling shifted the mean: {ind.mean():.4f} vs "
        f"{coh.mean():.4f}")


def test_russian_roulette_unbiased():
    """cfg.rr_start_bounce: stochastic termination with 1/q reweighting
    must leave per-pixel expectations unchanged (unbiased), while
    killing a measurable fraction of deep-bounce lanes."""
    import dataclasses

    from prismarine_core_tpu.models.scene import make_cornell_scene
    from prismarine_core_tpu.ops.sampling import make_sample_arrays
    from prismarine_core_tpu.render.integrator import render_with_samples

    scene = make_cornell_scene()
    cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=4,
                       intersector="bvh")
    rr = dataclasses.replace(cfg, rr_start_bounce=2)
    cam = Camera.look_at(eye=(0.0, 0.0, 3.4), target=(0.0, 0.0, 0.0),
                         fov_y_deg=50.0)

    def avg(c, n=24):
        acc = stats_acc = None
        for s in range(n):
            cam_s, bounce_s = make_sample_arrays(jax.random.key(s),
                                                 c.n_rays, c.max_bounces)
            img, stats = render_with_samples(scene, cam, c, cam_s,
                                             bounce_s, with_stats=True)
            acc = img if acc is None else acc + img
            stats = np.asarray(stats)
            stats_acc = stats if stats_acc is None else stats_acc + stats
        return np.asarray(acc) / n, stats_acc / n

    ref, ref_stats = avg(cfg)
    img, rr_stats = avg(rr)
    assert np.isfinite(img).all()
    d = abs(float(ref.mean()) - float(img.mean()))
    assert d < 0.05 * float(ref.mean()) + 0.01, (
        f"RR shifted the mean: {ref.mean():.4f} vs {img.mean():.4f}")
    # deep bounces must actually lose lanes: entering-lane count at the
    # last bounce drops under RR (column 0 = lanes entering the bounce)
    assert rr_stats[-1, 0] < 0.9 * ref_stats[-1, 0], (
        f"RR killed no lanes: {rr_stats[-1, 0]} vs {ref_stats[-1, 0]}")
