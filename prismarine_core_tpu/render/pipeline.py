"""Renderer facade with progressive accumulation.

The analog of the reference's ``psm::Pipeline`` host class + sampler.comp:
holds the scene/camera/config, renders frames, and blends each new frame
into a progressive accumulator (``sampler.comp:82-95``), which resets on
camera movement (``Controller``, ``Application.hpp:128-173``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from prismarine_core_tpu.models.camera import Camera
from prismarine_core_tpu.models.scene import Scene
from prismarine_core_tpu.render.integrator import render
from prismarine_core_tpu.utils.config import RenderConfig


class ProgressiveRenderer:
    """Stateful host-side facade (the only mutable object in the stack)."""

    def __init__(self, scene: Scene, camera: Camera, cfg: RenderConfig,
                 seed: int = 0):
        self.scene = scene
        self.cfg = cfg
        self._camera = camera
        self._key = jax.random.key(seed)
        # weighted accumulation: with interlacing each checkerboard
        # parity collects its own per-pixel weight (sampler.comp:82-95)
        self._accum = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
        self._weight = jnp.zeros((cfg.height, cfg.width, 1), jnp.float32)
        self._n_frames = 0

    # -- camera control (resets accumulation like the reference) ----------

    @property
    def camera(self) -> Camera:
        return self._camera

    @camera.setter
    def camera(self, cam: Camera) -> None:
        self._camera = cam
        self.clear()

    def clear(self) -> None:
        self._accum = jnp.zeros_like(self._accum)
        self._weight = jnp.zeros_like(self._weight)
        self._n_frames = 0

    # -- rendering --------------------------------------------------------

    def step(self) -> jax.Array:
        """Render one frame and fold it into the running average.
        Returns the current accumulated image."""
        from prismarine_core_tpu.render.integrator import interlace_mask
        self._key, sub = jax.random.split(self._key)
        stage = self._n_frames
        frame = render(self.scene, self._camera, self.cfg, sub,
                       interlace_stage=stage)
        if self.cfg.interlace:
            w = interlace_mask(self.cfg, stage)[..., None]
            w = w.astype(jnp.float32)
        else:
            w = jnp.ones_like(self._weight)
        self._accum = self._accum + frame
        self._weight = self._weight + w
        if self.cfg.samples_lock > 0:
            # motion-blur sample lock (sampler.comp:84-90): clamp the
            # accumulated weight to SAMPLES_LOCK-1 after the blend so
            # the average becomes rolling (old frames decay) instead of
            # cumulative; exact analog of xsample.w = min(next, LOCK-1)
            # in sum/weight form.
            lock = float(self.cfg.samples_lock - 1)
            scale = jnp.minimum(lock / jnp.maximum(self._weight, 1e-6),
                                1.0)
            self._accum = self._accum * scale
            self._weight = self._weight * scale
        self._n_frames += 1
        return self._accum / jnp.maximum(self._weight, 1.0)

    def render_frames(self, n: int) -> jax.Array:
        for _ in range(n):
            img = self.step()
        return img

    @property
    def sample_count(self) -> int:
        return self._n_frames * self.cfg.spp

    def snapshot(self) -> np.ndarray:
        """Host copy of the HDR accumulator (``snapRawHdr`` analog,
        ``Pipeline.hpp:120``)."""
        return np.asarray(self._accum
                          / jnp.maximum(self._weight, 1.0))

    def set_exposure_scene(self, scene: Scene) -> None:
        self.scene = scene
        self.clear()

    def rebuild_bvh(self) -> None:
        """Per-frame rebuild path for animated geometry
        (``markDirty(); build()``, ``Viewer.cpp:296-297``)."""
        self.scene = dataclasses.replace(
            self.scene).with_bvh(self.cfg.bvh_leaf_size)

    def refit_bvh(self) -> None:
        """Per-frame REFIT path for deforming geometry: re-union AABBs
        over the frozen topology (``refit.comp``) — much cheaper than
        rebuild_bvh when only vertices moved."""
        self.scene = dataclasses.replace(self.scene).with_refit()
