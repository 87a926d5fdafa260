"""Independent numpy CPU path tracer — the correctness oracle.

The reference repo ships *no* test infrastructure (SURVEY.md §4); this
module is the oracle the new framework is validated against.  It
implements the same light-transport spec as render/integrator.py but as
deliberately *different* code: per-ray Python loops, numpy vectorization
only over triangles, no JAX.  Both consume identical explicit uniform
sample arrays (ops/sampling.py layout), so a correct implementation pair
matches sample-for-sample, not just statistically.

Keep this file boring and obviously-correct; never import jax here.
"""

from __future__ import annotations

import numpy as np

INF = 10000.0
PZERO = 0.0005
GAP = 2.0 * PZERO
_DET_EPS = 1e-10
_SQRT_THIRD = 0.57735026


# -- scene snapshot (host copies of the device pytrees) -------------------

class SceneData:
    """Plain-numpy copy of a Scene pytree."""

    def __init__(self, scene):
        t = scene.triangles
        self.v0 = np.asarray(t.v0, np.float32)
        self.v1 = np.asarray(t.v1, np.float32)
        self.v2 = np.asarray(t.v2, np.float32)
        self.n0 = np.asarray(t.n0, np.float32)
        self.n1 = np.asarray(t.n1, np.float32)
        self.n2 = np.asarray(t.n2, np.float32)
        self.t0 = np.asarray(t.t0, np.float32)
        self.t1 = np.asarray(t.t1, np.float32)
        self.t2 = np.asarray(t.t2, np.float32)
        self.mat_id = np.asarray(t.mat_id)
        self.valid = np.asarray(t.valid)
        m = scene.materials
        self.diffuse = np.asarray(m.diffuse, np.float32)
        self.specular = np.asarray(m.specular, np.float32)
        self.emissive = np.asarray(m.emissive, np.float32)
        self.transmission = np.asarray(m.transmission, np.float32)
        self.ior = np.asarray(m.ior, np.float32)
        self.tex_diffuse = np.asarray(m.tex_diffuse)
        self.light_center = np.asarray(scene.lights.center, np.float32)
        self.light_radius = np.asarray(scene.lights.radius, np.float32)
        self.light_color = np.asarray(scene.lights.color, np.float32)
        self.env_image = np.asarray(scene.environment.image, np.float32)
        self.env_scale = np.asarray(scene.environment.scale, np.float32)


def _normalize(v):
    return v / max(float(np.linalg.norm(v)), 1e-30)


def _intersect_all(sd: SceneData, o, d):
    """Möller–Trumbore of one ray against every triangle (vectorized over
    triangles).  Returns (t, tri, u, v); tri=-1 on miss."""
    e1 = sd.v1 - sd.v0
    e2 = sd.v2 - sd.v0
    p = np.cross(np.broadcast_to(d, e2.shape), e2)
    det = np.sum(e1 * p, axis=-1)
    inv = 1.0 / np.where(np.abs(det) < _DET_EPS, _DET_EPS, det)
    s = o - sd.v0
    u = np.sum(s * p, axis=-1) * inv
    q = np.cross(s, e1)
    v = np.sum(np.broadcast_to(d, q.shape) * q, axis=-1) * inv
    t = np.sum(e2 * q, axis=-1) * inv
    ok = ((np.abs(det) >= _DET_EPS) & (u >= 0) & (v >= 0)
          & (u + v <= 1.0) & (t > PZERO) & sd.valid)
    t = np.where(ok, t, INF).astype(np.float32)
    tri = int(np.argmin(t))
    if t[tri] >= INF:
        return INF, -1, 0.0, 0.0
    return float(t[tri]), tri, float(u[tri]), float(v[tri])


def _occluded(sd: SceneData, o, d, t_max):
    e1 = sd.v1 - sd.v0
    e2 = sd.v2 - sd.v0
    p = np.cross(np.broadcast_to(d, e2.shape), e2)
    det = np.sum(e1 * p, axis=-1)
    inv = 1.0 / np.where(np.abs(det) < _DET_EPS, _DET_EPS, det)
    s = o - sd.v0
    u = np.sum(s * p, axis=-1) * inv
    q = np.cross(s, e1)
    v = np.sum(np.broadcast_to(d, q.shape) * q, axis=-1) * inv
    t = np.sum(e2 * q, axis=-1) * inv
    ok = ((np.abs(det) >= _DET_EPS) & (u >= 0) & (v >= 0)
          & (u + v <= 1.0) & (t > PZERO) & sd.valid & (t < t_max))
    return bool(np.any(ok))


def _intersect_sphere(o, d, center, radius):
    to = o - center
    b = 2.0 * float(np.dot(to, d))
    c = float(np.dot(to, to)) - radius * radius
    disc = b * b - 4.0 * c
    if disc <= 0.0:
        return INF
    sq = float(np.sqrt(disc))
    t1 = 0.5 * (-b - sq)
    t2 = 0.5 * (-b + sq)
    mn, mx = min(t1, t2), max(t1, t2)
    if mx < 0.0:
        return INF
    return mn if mn >= 0.0 else mx


def _env(sd: SceneData, d):
    h, w, _ = sd.env_image.shape
    u = np.arctan2(d[2], d[0]) / (2 * np.pi) + 0.5
    v = 0.5 - np.arcsin(np.clip(d[1], -1, 1)) / np.pi
    x = min(int(u * w), w - 1)
    y = min(int(v * h), h - 1)
    return sd.env_image[y, x] * sd.env_scale


def _cosine_hemisphere(n, u1, u2):
    up = np.sqrt(u1)
    over = np.sqrt(max(1.0 - u1, 0.0))
    around = 2.0 * np.pi * u2
    if abs(n[0]) < _SQRT_THIRD:
        perp0 = np.array([1.0, 0.0, 0.0])
    elif abs(n[1]) < _SQRT_THIRD:
        perp0 = np.array([0.0, 1.0, 0.0])
    else:
        perp0 = np.array([0.0, 0.0, 1.0])
    t = _normalize(np.cross(n, perp0))
    b = np.cross(n, t)
    return _normalize(n * up + t * np.cos(around) * over
                      + b * np.sin(around) * over)


def _uniform_sphere(u1, u2):
    up = u1 * 2.0 - 1.0
    over = np.sqrt(max(1.0 - up * up, 0.0))
    around = u2 * 2.0 * np.pi
    return np.array([up, np.cos(around) * over, np.sin(around) * over])


def _light_weight(ldir, n, radius, dist):
    c = np.clip(float(np.dot(ldir, n)) * 2.0 * (radius / max(dist, 1e-6)) ** 2,
                0.0, 1.0)
    return 1.0 - np.sqrt(1.0 - c)


# -- the tracer ------------------------------------------------------------

def trace_ray(sd: SceneData, o, d, bounce_samples, cfg) -> np.ndarray:
    """Path-trace one ray. bounce_samples: f32[B, 10] (ops/sampling
    slots; 8+ are the env-NEE uniforms, unused here — the oracle models
    the reference's transport, which has no env importance sampling)."""
    beta = np.ones(3, np.float32)
    radiance = np.zeros(3, np.float32)
    o = np.array(o, np.float32)
    d = np.array(d, np.float32)

    for b in range(bounce_samples.shape[0]):
        u = bounce_samples[b]
        t, tri, bu, bv = _intersect_all(sd, o, d)
        if tri < 0:
            radiance += beta * _env(sd, d)
            break
        w = 1.0 - bu - bv
        p = o + t * d
        ns = _normalize(w * sd.n0[tri] + bu * sd.n1[tri] + bv * sd.n2[tri])
        n = ns if np.dot(ns, d) < 0 else -ns

        mat = sd.mat_id[tri]
        albedo = sd.diffuse[mat, :3].copy()
        alpha = float(sd.diffuse[mat, 3])
        roughness = float(sd.specular[mat, 1])
        metallic = float(sd.specular[mat, 2])
        emissive = sd.emissive[mat, :3]

        radiance += beta * emissive

        cosmag = np.clip(abs(float(np.dot(d, n))) ** (cfg.ior - 1.0), 0, 1)
        dielectric = (1.0 - cosmag) * np.ones(3) + cosmag * 0.05 * np.ones(3)
        sc = dielectric + (albedo - dielectric) * np.sqrt(
            np.clip(metallic, 0, 1))
        spca = float(np.clip(np.linalg.norm(sc), 0.0, 1.0))

        prom = 1.0 - alpha
        pass_through = u[0] < prom
        choose_spec = (not pass_through) and (u[1] < spca)
        choose_diff = (not pass_through) and (not choose_spec)

        cos_dir = _cosine_hemisphere(n, u[2], u[3])
        if pass_through:
            # refraction through the interface (identity when ior == 1)
            entering = float(np.dot(d, ns)) < 0.0
            m_ior = float(sd.ior[mat])
            eta = 1.0 / m_ior if entering else m_ior
            cosi = float(np.dot(n, d))
            k = 1.0 - eta * eta * (1.0 - cosi * cosi)
            if k < 0.0:
                new_d = d - 2.0 * float(np.dot(d, n)) * n   # TIR mirror
            else:
                new_d = eta * d - (eta * cosi + np.sqrt(k)) * n
                new_d = _normalize(new_d)
            tr = sd.transmission[mat, :3]
            branch = tr if (tr > 0).any() else np.ones(3)
        elif choose_spec:
            refl = d - 2.0 * float(np.dot(d, n)) * n
            gloss = np.clip(roughness * u[4], 0.0, 1.0)
            new_d = _normalize(refl + (cos_dir - refl) * gloss)
            branch = np.clip(sc / max(spca, 1e-6), 0.0, 1.0)
        else:
            new_d = cos_dir
            branch = albedo

        # NEE from the diffuse branch, one uniformly chosen light.
        n_lights = len(sd.light_center)
        if cfg.direct_light and choose_diff and n_lights > 0:
            li = min(int(u[7] * n_lights), n_lights - 1)
            center = sd.light_center[li]
            radius = float(sd.light_radius[li])
            lcolor = sd.light_color[li] * n_lights
            pt = center + radius * _uniform_sphere(u[5], u[6])
            ldir = _normalize(pt - p)
            dist = float(np.linalg.norm(center - p))
            weight = _light_weight(ldir, n, radius, dist)
            so = p + ldir * GAP
            t_light = _intersect_sphere(so, ldir, center, radius + GAP)
            if (t_light < INF and np.dot(ns, ldir) >= 0
                    and not _occluded(sd, so, ldir, t_light)):
                radiance += (beta * albedo * weight * lcolor)

        beta = beta * branch
        o = p + new_d * GAP
        d = new_d
        if np.linalg.norm(beta) <= cfg.min_throughput:
            break

    return radiance


def generate_camera_rays(camera, cfg, cam_samples):
    """Primary rays matching models/camera.generate_rays (perspective only)."""
    eye = np.asarray(camera.eye, np.float32)
    target = np.asarray(camera.target, np.float32)
    up = np.asarray(camera.up, np.float32)
    fov_y = float(camera.fov_y)

    fwd = _normalize(target - eye)
    right = _normalize(np.cross(fwd, _normalize(up)))
    cup = np.cross(right, fwd)

    w, h, spp = cfg.width, cfg.height, cfg.spp
    n = spp * h * w
    pix = np.arange(n) % (h * w)
    px = (pix % w).astype(np.float32)
    py = (pix // w).astype(np.float32)
    jit = np.clip(cam_samples[:, 0:2], 1e-5, 1 - 1e-5)
    u = (px + jit[:, 0]) / w
    v = (py + jit[:, 1]) / h
    tan_half = np.tan(fov_y * 0.5)
    aspect = w / h
    sx = (u * 2 - 1) * tan_half * aspect
    sy = (1 - v * 2) * tan_half
    d = (fwd[None, :] + sx[:, None] * right[None, :]
         + sy[:, None] * cup[None, :])
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(eye, d.shape)
    return o.astype(np.float32), d.astype(np.float32)


def render_reference(scene, camera, cfg, cam_samples, bounce_samples):
    """Full-frame oracle render. Same signature semantics as
    render_with_samples; returns f32[H,W,3]."""
    sd = SceneData(scene)
    cam_samples = np.asarray(cam_samples, np.float32)
    bounce_samples = np.asarray(bounce_samples, np.float32)
    o, d = generate_camera_rays(camera, cfg, cam_samples)
    n = o.shape[0]
    out = np.zeros((n, 3), np.float32)
    for i in range(n):
        out[i] = trace_ray(sd, o[i], d[i], bounce_samples[:, i, :], cfg)
    img = out.reshape(cfg.spp, cfg.height, cfg.width, 3)
    return img.mean(axis=0)
