"""Pianoroll image summaries (SURVEY C19/§5.5: the reference writes pianoroll
image summaries to TensorBoard; here they land as PNGs in the run dir).

Pure-numpy rendering + PIL encoding (no matplotlib figure machinery in the
training path)."""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

# distinct RGB per track (drums, piano, guitar, bass, strings order for LPD-5)
_TRACK_COLORS = np.array([
    [230, 60, 60],     # red
    [60, 120, 230],    # blue
    [60, 200, 90],     # green
    [240, 180, 40],    # yellow
    [170, 80, 220],    # purple
    [80, 220, 220],    # cyan
    [240, 120, 180],   # pink
    [160, 160, 160],   # grey
], dtype=np.uint8)


def render_pianoroll(roll: np.ndarray, scale: int = 2) -> np.ndarray:
    """(T, K, D) or (T, D) binary -> RGB image (D*scale, T*scale, 3), pitch
    axis upward, one color per track (overlaps blend additively)."""
    roll = np.asarray(roll)
    if roll.ndim == 2:
        roll = roll[:, None, :]
    t, k, d = roll.shape
    img = np.zeros((d, t, 3), np.uint16)
    for ki in range(k):
        color = _TRACK_COLORS[ki % len(_TRACK_COLORS)]
        mask = roll[:, ki, :].T.astype(bool)           # (D, T)
        img[mask] += color
    img = np.clip(img, 0, 255).astype(np.uint8)
    img = img[::-1]                                     # low pitch at bottom
    if scale > 1:
        img = np.repeat(np.repeat(img, scale, axis=0), scale, axis=1)
    return img


def encode_png(img: np.ndarray) -> bytes:
    """RGB uint8 (H, W, 3) -> PNG bytes (in-memory; feeds the TensorBoard
    image summaries in utils/tb.py)."""
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.asarray(img)).save(buf, format="PNG")
    return buf.getvalue()


def save_pianoroll_png(roll: np.ndarray, path: str, scale: int = 2) -> str:
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(render_pianoroll(roll, scale)).save(path)
    return path


def save_sample_grid(rolls: np.ndarray, out_dir: str, prefix: str = "sample",
                     scale: int = 2) -> Sequence[str]:
    """One PNG per sample of a (N, T, K, D) batch."""
    paths = []
    for i, roll in enumerate(np.asarray(rolls)):
        paths.append(save_pianoroll_png(
            roll, os.path.join(out_dir, f"{prefix}_{i:03d}.png"), scale))
    return paths
