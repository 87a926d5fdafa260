"""Benchmark: rays/s on the sponza-class hall scene (720p, 4 bounces).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md) — vs_baseline is the
ratio against a fixed reference-class figure of 100 Mrays/s (interactive
RX-Vega-class wavefront tracing at 720p, the reference's demonstrated
config), so the number is comparable across rounds.

Ray accounting: every bounce issues one closest-hit and one shadow
(any-hit) query per lane, so rays = n_rays * bounces * 2.
"""

from __future__ import annotations

import json
import sys
import time

import jax

REFERENCE_CLASS_RAYS_PER_S = 100e6


def main():
    import numpy as np

    from prismarine_core_tpu.models.camera import Camera
    from prismarine_core_tpu.models.procedural import make_hall_scene
    from prismarine_core_tpu.ops.sampling import make_sample_arrays
    from prismarine_core_tpu.render.integrator import render_with_samples
    from prismarine_core_tpu.utils.config import RenderConfig

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    width, height = 1280, 720
    cfg = RenderConfig(width=width, height=height, spp=1, max_bounces=4,
                       intersector="pallas", bvh_leaf_size=4)
    print(f"[bench] devices={jax.devices()}", file=sys.stderr)
    scene = make_hall_scene(target_tris=n_tris)
    scene = jax.device_put(scene)
    print(f"[bench] scene tris={int(scene.triangles.num_valid())} "
          f"bvh nodes={scene.bvh.n_nodes}", file=sys.stderr)
    camera = Camera.look_at(eye=(-10.0, 2.2, 0.0), target=(6.0, 1.6, 0.0),
                            fov_y_deg=60.0)

    cam_s, bounce_s = make_sample_arrays(
        jax.random.key(0), cfg.n_rays, cfg.max_bounces)

    def frame(key):
        return render_with_samples(scene, camera, cfg, cam_s, bounce_s)

    t0 = time.perf_counter()
    img = jax.block_until_ready(frame(jax.random.key(0)))
    compile_s = time.perf_counter() - t0
    print(f"[bench] first frame (incl. compile): {compile_s:.1f}s; "
          f"image mean={float(img.mean()):.4f}", file=sys.stderr)
    assert bool(jax.numpy.isfinite(img).all()), "non-finite image"

    n_frames = 3
    t0 = time.perf_counter()
    for i in range(n_frames):
        img = frame(jax.random.key(i))
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / n_frames

    rays = cfg.n_rays * cfg.max_bounces * 2
    rays_per_s = rays / dt
    print(f"[bench] {dt*1e3:.1f} ms/frame -> {rays_per_s/1e6:.2f} Mrays/s",
          file=sys.stderr)

    print(json.dumps({
        "metric": "rays_per_second_sponza_class_720p_4bounce",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / REFERENCE_CLASS_RAYS_PER_S,
    }))


if __name__ == "__main__":
    main()
