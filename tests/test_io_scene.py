"""OBJ/MTL loader, image IO, procedural scenes, progressive pipeline, CLI."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from prismarine_core_tpu.models.obj_loader import load_obj
from prismarine_core_tpu.utils.image import load_hdr, save_hdr, save_png


def _write_obj(tmp_path):
    (tmp_path / "mat.mtl").write_text(textwrap.dedent("""\
        newmtl red
        Kd 0.8 0.1 0.1
        Ns 50
        d 0.9
        newmtl blue
        Kd 0.1 0.1 0.8
        Ke 1.0 1.0 0.0
    """))
    (tmp_path / "tri.obj").write_text(textwrap.dedent("""\
        mtllib mat.mtl
        v 0 0 0
        v 1 0 0
        v 1 1 0
        v 0 1 0
        vn 0 0 1
        vt 0 0
        vt 1 0
        vt 1 1
        vt 0 1
        usemtl red
        f 1/1/1 2/2/1 3/3/1 4/4/1
        usemtl blue
        f -4 -3 -2
    """))
    return tmp_path / "tri.obj"


def test_load_obj(tmp_path):
    soup, mats, texs = load_obj(str(_write_obj(tmp_path)), scale=2.0)
    # quad -> 2 tris (fan) + 1 tri = 3
    assert int(soup.num_valid()) == 3
    assert mats.count == 2
    np.testing.assert_allclose(np.asarray(mats.diffuse[0, :3]),
                               [0.8, 0.1, 0.1], rtol=1e-6)
    np.testing.assert_allclose(float(mats.diffuse[0, 3]), 0.9)
    np.testing.assert_allclose(np.asarray(mats.emissive[1, :3]),
                               [1.0, 1.0, 0.0])
    # scale applied
    assert float(np.asarray(soup.v1)[0].max()) == 2.0
    # normals from vn
    np.testing.assert_allclose(np.asarray(soup.n0)[0], [0, 0, 1])


def test_load_obj_no_faces(tmp_path):
    p = tmp_path / "empty.obj"
    p.write_text("v 0 0 0\n")
    with pytest.raises(ValueError, match="no faces"):
        load_obj(str(p))


def test_load_reference_cow():
    path = "/root/reference/Resources/toys/Cow.obj"
    if not os.path.exists(path):
        pytest.skip("reference assets not mounted")
    soup, mats, _ = load_obj(path)
    assert int(soup.num_valid()) >= 1700


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 50, (16, 20, 3)).astype(np.float32)
    img[0, 0] = 0.0
    p = str(tmp_path / "x.hdr")
    save_hdr(p, img)
    back = load_hdr(p)
    assert back.shape == img.shape
    # RGBE shares one exponent across channels: absolute error is bounded
    # by (pixel max) / 256 per channel.
    # (2^exp can be up to 2x the pixel max, and the mantissa truncates.)
    bound = img.max(axis=-1, keepdims=True) / 128.0 + 1e-6
    assert (np.abs(back - img) <= bound).all()


def test_png(tmp_path):
    img = np.zeros((8, 8, 3), np.float32)
    img[:, :, 0] = 2.0  # clamps
    p = str(tmp_path / "x.png")
    save_png(p, img)
    from PIL import Image
    arr = np.asarray(Image.open(p))
    assert arr[0, 0, 0] == 255 and arr[0, 0, 1] == 0


def test_procedural_hall():
    from prismarine_core_tpu.models.procedural import make_hall_scene
    scene = make_hall_scene(target_tris=2000, build_bvh=False)
    n = int(scene.triangles.num_valid())
    assert 1000 <= n <= 4000


def test_progressive_pipeline():
    import jax

    from prismarine_core_tpu.models.camera import Camera
    from prismarine_core_tpu.models.scene import make_cornell_scene
    from prismarine_core_tpu.render.pipeline import ProgressiveRenderer
    from prismarine_core_tpu.utils.config import RenderConfig

    cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=2)
    cam = Camera.look_at(eye=(0, 0, 3.4), target=(0, 0, 0))
    r = ProgressiveRenderer(make_cornell_scene(), cam, cfg)
    img1 = np.asarray(r.step())
    img4 = np.asarray(r.render_frames(3))
    assert r.sample_count == 4
    assert img4.shape == (16, 16, 3)
    # progressive accumulation reduces variance vs single frame
    assert np.isfinite(img4).all()
    r.camera = Camera.look_at(eye=(0, 0, 3.0), target=(0, 0, 0))
    assert r.sample_count == 0  # reset on camera move


def test_cli(tmp_path):
    out = tmp_path / "r.png"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from prismarine_core_tpu.cli import main; import sys;"
         f"sys.exit(main(['--scene','cornell','--res','16x16',"
         f"'--frames','2','--depth','2','--out',r'{out}']))"],
        capture_output=True, text=True, env=env, timeout=600,
        cwd="/root/repo")
    assert res.returncode == 0, res.stderr[-2000:]
    assert out.exists()
    assert (tmp_path / "r.hdr").exists()
    assert (tmp_path / "r.npy").exists()


def test_native_obj_matches_python(tmp_path):
    """Native C++ parser must agree with the pure-Python path."""
    from prismarine_core_tpu.native import get_lib
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    p = str(_write_obj(tmp_path))
    sn, mn, _ = load_obj(p, scale=2.0, use_native=True)
    sp, mp, _ = load_obj(p, scale=2.0, use_native=False)
    assert int(sn.num_valid()) == int(sp.num_valid())
    np.testing.assert_allclose(np.asarray(sn.v0), np.asarray(sp.v0))
    np.testing.assert_allclose(np.asarray(sn.v1), np.asarray(sp.v1))
    np.testing.assert_allclose(np.asarray(sn.t0), np.asarray(sp.t0))
    np.testing.assert_array_equal(np.asarray(sn.mat_id),
                                  np.asarray(sp.mat_id))
    np.testing.assert_allclose(np.asarray(mn.diffuse),
                               np.asarray(mp.diffuse))


def test_native_obj_cow():
    from prismarine_core_tpu.native import get_lib
    path = "/root/reference/Resources/toys/Cow.obj"
    if get_lib() is None or not os.path.exists(path):
        pytest.skip("native or assets unavailable")
    sn, _, _ = load_obj(path, use_native=True)
    sp, _, _ = load_obj(path, use_native=False)
    assert int(sn.num_valid()) == int(sp.num_valid())
    np.testing.assert_allclose(np.asarray(sn.v0), np.asarray(sp.v0),
                               rtol=1e-6)
