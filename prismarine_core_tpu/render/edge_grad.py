"""Edge-sampled visibility (boundary) gradients for primary rays.

The detached-visibility estimator (``accel/traverse.py``) differentiates
the *interior* term of the rendering integral only: the discrete hit id
is frozen, so a silhouette sweeping across pixels has an identically-zero
derivative.  This module adds the missing *boundary* term — the north
star of BASELINE.json ("reparameterized/edge-aware gradients",
SURVEY.md §7 hard-part 3; the CUDA/GLSL reference has no differentiable
rendering at all, so there is no reference file to cite for parity).

Method (edge sampling, re-derived TPU-first):

  dI_j/dtheta = interior (autodiff through detached visibility)
              + sum_edges  INT_edge (L^- - L^+) (n_perp . dm/dtheta) dl

where the integral runs over the *screen-space projection* of every
triangle edge, ``m`` is the (differentiable) screen position of an edge
point, ``n_perp`` a unit normal of the projected edge, and ``L^+/-`` the
radiance just off either side.  Three TPU-friendly design choices:

1. **No silhouette detection.**  All ``3T`` soup edges are candidates;
   for interior (shared, front-facing) or fully-occluded edges the two
   offset rays land on the same surface, so ``L^- - L^+`` ~ 0 and the
   contribution vanishes automatically.  This removes the reference-less
   adjacency analysis entirely and keeps every shape static.
2. **Length-proportional importance sampling** with a fixed budget ``B``:
   one cumsum over stop-gradiented screen lengths, ``B`` stratified
   inverse-CDF draws (``searchsorted``), so cost is O(B) radiance pairs
   regardless of edge count — no data-dependent shapes.
3. **Value-zero gradient attachment**: each sample contributes
   ``w * (phi - stop_grad(phi))`` with ``w = sg[(L^- - L^+) * total/B]``
   and ``phi = n_perp . m(theta)``; the forward image is bit-identical
   to the primal render while reverse mode accumulates the boundary
   term into vertex (and camera) gradients.

Both offset rays share one path-sample row, so the radiance difference
is a *correlated* estimate — interior edges cancel exactly, not just in
expectation.

Limitations (documented divergences): pinhole perspective only (no DOF /
360 reparameterization), primary visibility only (secondary/shadow
silhouettes still use the detached estimator), edges crossing the
near plane are skipped.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from prismarine_core_tpu.models.camera import Camera
from prismarine_core_tpu.models.scene import Scene
from prismarine_core_tpu.utils import math as pm
from prismarine_core_tpu.utils.config import (
    RenderConfig, SAMPLES_PER_BOUNCE)

sg = jax.lax.stop_gradient

#: screen-space half-offset (pixels) between the two side rays.  Any
#: delta > projection round-off works geometrically (the projected edge
#: is exactly straight); small keeps L^+/- representative of the limit.
EDGE_DELTA_PX = 0.03

_NEAR = 1e-4


def project_to_screen(camera: Camera, cfg: RenderConfig, p: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
    """Perspective-project world points f32[...,3] to continuous pixel
    coordinates f32[...,2] (origin top-left, +y down — the exact inverse
    of ``generate_rays``'s pinhole branch).  Also returns the camera-z
    f32[...] for near-plane masking."""
    fwd, right, cup = camera.basis()
    rel = p - camera.eye
    z = jnp.einsum("...k,k->...", rel, fwd)
    x = jnp.einsum("...k,k->...", rel, right)
    y = jnp.einsum("...k,k->...", rel, cup)
    zs = jnp.where(jnp.abs(z) < _NEAR, _NEAR, z)
    tan_half = jnp.tan(camera.fov_y * 0.5)
    aspect = cfg.width / cfg.height
    sx = x / (zs * tan_half * aspect)
    sy = y / (zs * tan_half)
    px = (sx + 1.0) * 0.5 * cfg.width
    py = (1.0 - sy) * 0.5 * cfg.height
    return jnp.stack([px, py], axis=-1), z


def rays_through_screen(camera: Camera, cfg: RenderConfig, s: jax.Array
                        ) -> Tuple[jax.Array, jax.Array]:
    """Pinhole rays through arbitrary float pixel coords s f32[N,2]."""
    u = s[:, 0] / cfg.width
    v = s[:, 1] / cfg.height
    fwd, right, cup = camera.basis()
    tan_half = jnp.tan(camera.fov_y * 0.5)
    aspect = cfg.width / cfg.height
    sx = (u * 2.0 - 1.0) * tan_half * aspect
    sy = (1.0 - v * 2.0) * tan_half
    d = pm.normalize(fwd + sx[:, None] * right + sy[:, None] * cup)
    o = jnp.broadcast_to(camera.eye, d.shape)
    return o, d


def make_edge_sample_arrays(key: jax.Array, n_edge_samples: int,
                            max_bounces: int):
    """Uniforms for one boundary-term evaluation:
    (edge_u f32[B] stratified in [0,1), bounce f32[max_bounces,B,8])."""
    k1, k2 = jax.random.split(key)
    strata = (jnp.arange(n_edge_samples, dtype=jnp.float32)
              + jax.random.uniform(k1, (n_edge_samples,)))
    edge_u = strata / n_edge_samples
    bounce = jax.random.uniform(
        k2, (max_bounces, n_edge_samples, SAMPLES_PER_BOUNCE))
    return edge_u, bounce


def edge_boundary_image(scene: Scene, camera: Camera, cfg: RenderConfig,
                        edge_u: jax.Array, bounce_samples: jax.Array,
                        delta_px: float = EDGE_DELTA_PX) -> jax.Array:
    """Value-zero f32[H,W,3] image carrying the boundary-term gradient.

    Add it to any primal render of the same (scene, camera, cfg): the
    sum's value is unchanged; its reverse-mode gradient gains the
    silhouette term.  ``edge_u``: f32[B] stratified uniforms selecting
    points on the global edge-length CDF; ``bounce_samples``:
    f32[bounces,B,8] path uniforms shared by both side rays.
    """
    assert not cfg.camera_360 and not cfg.dof, (
        "boundary term supports the pinhole perspective camera only")
    from prismarine_core_tpu.render.integrator import trace_radiance

    soup = scene.triangles
    B = edge_u.shape[0]

    # --- all 3T directed edges of the soup -------------------------------
    ea = jnp.concatenate([soup.v0, soup.v1, soup.v2], axis=0)   # [3T,3]
    eb = jnp.concatenate([soup.v1, soup.v2, soup.v0], axis=0)
    evalid = jnp.concatenate([soup.valid] * 3, axis=0)

    sa, za = project_to_screen(camera, cfg, ea)                 # [3T,2]
    sb, zb = project_to_screen(camera, cfg, eb)
    in_front = (za > _NEAR) & (zb > _NEAR)

    # screen AABB vs image overlap (pad by 1px for the offset rays)
    lo = jnp.minimum(sa, sb)
    hi = jnp.maximum(sa, sb)
    on_screen = ((hi[:, 0] > -1.0) & (lo[:, 0] < cfg.width + 1.0)
                 & (hi[:, 1] > -1.0) & (lo[:, 1] < cfg.height + 1.0))
    use = evalid & in_front & on_screen

    seg = sb - sa
    length = jnp.linalg.norm(seg, axis=-1)                      # [3T]
    w_len = sg(jnp.where(use, length, 0.0))

    # --- length-proportional stratified draws ----------------------------
    cdf = jnp.cumsum(w_len)
    total = cdf[-1]
    targets = edge_u * total                                    # [B]
    idx = jnp.searchsorted(cdf, targets, side="right")
    idx = jnp.clip(idx, 0, w_len.shape[0] - 1)
    prev = jnp.where(idx > 0, cdf[jnp.maximum(idx - 1, 0)], 0.0)
    lsel = jnp.maximum(w_len[idx], 1e-12)
    frac = sg(jnp.clip((targets - prev) / lsel, 0.0, 1.0))      # [B]

    # differentiable screen position of each sampled edge point
    m = sa[idx] + frac[:, None] * seg[idx]                      # [B,2]
    e_hat = sg(seg[idx] / lsel[:, None])
    n_perp = jnp.stack([-e_hat[:, 1], e_hat[:, 0]], axis=-1)    # [B,2]

    # --- radiance just off both sides (fully detached) -------------------
    m_sg = sg(m)
    s_plus = m_sg + delta_px * n_perp
    s_minus = m_sg - delta_px * n_perp
    scene_sg = sg(scene)
    cam_sg = sg(camera)
    o_p, d_p = rays_through_screen(cam_sg, cfg, s_plus)
    o_m, d_m = rays_through_screen(cam_sg, cfg, s_minus)
    bs = sg(bounce_samples)
    L_p = trace_radiance(scene_sg, cfg, o_p, d_p, bs)           # [B,3]
    L_m = trace_radiance(scene_sg, cfg, o_m, d_m, bs)

    # --- assemble + splat ------------------------------------------------
    pix = jnp.floor(m_sg).astype(jnp.int32)
    in_img = ((pix[:, 0] >= 0) & (pix[:, 0] < cfg.width)
              & (pix[:, 1] >= 0) & (pix[:, 1] < cfg.height)
              & (total > 0.0) & (w_len[idx] > 0.0))
    weight = sg((L_m - L_p) * (total / B)
                * in_img[:, None].astype(jnp.float32))          # [B,3]

    phi = jnp.einsum("bk,bk->b", n_perp, m)                     # [B]
    contrib = weight * (phi - sg(phi))[:, None]                 # [B,3]

    flat = jnp.zeros((cfg.height * cfg.width, 3), jnp.float32)
    lin = jnp.clip(pix[:, 1], 0, cfg.height - 1) * cfg.width \
        + jnp.clip(pix[:, 0], 0, cfg.width - 1)
    flat = flat.at[lin].add(contrib, mode="drop")
    return flat.reshape(cfg.height, cfg.width, 3)


@partial(jax.jit, static_argnames=("cfg",))
def render_with_edge_gradients(scene: Scene, camera: Camera,
                               cfg: RenderConfig, cam_samples,
                               bounce_samples, edge_u,
                               edge_bounce_samples):
    """Primal render + boundary-gradient attachment.

    Forward value == ``render_with_samples(...)`` exactly; reverse mode
    additionally differentiates silhouette motion w.r.t. vertex
    positions and camera parameters."""
    from prismarine_core_tpu.render.integrator import render_with_samples
    img = render_with_samples(scene, camera, cfg, cam_samples,
                              bounce_samples)
    img = img + edge_boundary_image(scene, camera, cfg, edge_u,
                                    edge_bounce_samples)
    return img
