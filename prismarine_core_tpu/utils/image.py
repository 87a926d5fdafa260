"""Image output: tonemapped PNG + Radiance HDR (.hdr) + raw .npy.

The reference snapshots its float accumulator to EXR via FreeImage
(``Application.hpp:324-343``); this environment has no EXR codec, so the
HDR path writes Radiance RGBE (.hdr) — same purpose (lossless-ish float
radiance dump), self-contained writer.
"""

from __future__ import annotations

import numpy as np


def tonemap(img: np.ndarray, exposure: float = 1.0,
            gamma: float = 2.2) -> np.ndarray:
    """Simple exposure + gamma to 8-bit (the blit shader clamps to LDR,
    ``render.frag:33-36``; we add gamma since we skip GL's sRGB path)."""
    x = np.clip(np.asarray(img, np.float32) * exposure, 0.0, 1.0)
    x = x ** (1.0 / gamma)
    return (x * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, img: np.ndarray, exposure: float = 1.0) -> None:
    from PIL import Image
    Image.fromarray(tonemap(img, exposure)).save(path)


def save_hdr(path: str, img: np.ndarray) -> None:
    """Write Radiance RGBE (.hdr), flat (non-RLE) scanlines."""
    img = np.asarray(img, np.float32)
    h, w, _ = img.shape
    maxc = np.maximum(img.max(axis=-1), 1e-32)
    exp = np.ceil(np.log2(maxc)).astype(np.int32)
    mant = img / (2.0 ** exp[..., None])
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(mant * 256.0, 0, 255).astype(np.uint8)
    rgbe[..., 3] = (exp + 128).astype(np.uint8)
    zero = maxc < 1e-30
    rgbe[zero] = 0
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def load_hdr(path: str) -> np.ndarray:
    """Read back flat RGBE written by save_hdr (round-trip testing)."""
    with open(path, "rb") as f:
        data = f.read()
    # find resolution line
    idx = data.index(b"\n\n") + 2
    nl = data.index(b"\n", idx)
    dims = data[idx:nl].split()
    h, w = int(dims[1]), int(dims[3])
    rgbe = np.frombuffer(data[nl + 1:], np.uint8).reshape(h, w, 4)
    exp = rgbe[..., 3].astype(np.int32) - 128
    img = rgbe[..., :3].astype(np.float32) / 256.0 * (2.0 ** exp[..., None])
    img[rgbe[..., 3] == 0] = 0.0
    return img


def save_npy(path: str, img: np.ndarray) -> None:
    np.save(path, np.asarray(img, np.float32))
