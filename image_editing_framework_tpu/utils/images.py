"""Image IO (reference: */utils/save_image.py)."""

from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np
from PIL import Image


def load_image(path: str, height: int, width: int) -> np.ndarray:
    """Open, convert to RGB, resize — the reference's input path
    (p2p/edit_real.py:123)."""
    img = Image.open(path).convert("RGB").resize((width, height))
    return np.asarray(img)


def save_img(img: np.ndarray, save_path: str) -> None:
    """Write-then-rename: the sweep's resume-by-output check treats an
    existing edit.png as done, so a SIGKILL mid-write must never leave a
    truncated PNG at the final name (same protocol as the serve spool)."""
    if img.ndim == 4:
        img = img[0]
    elif img.ndim != 3:
        raise ValueError("The dim of the picture is not right")
    tmp = save_path + ".tmp"
    Image.fromarray(np.asarray(img)).save(tmp, format="PNG")
    os.replace(tmp, save_path)


def save_images(img: np.ndarray, nrow: int = 1, ncol: Optional[int] = None,
                save_path: Optional[str] = None) -> None:
    """Save each image plus a grid sheet (reference save_images)."""
    batch = img.shape[0]
    if ncol is None:
        ncol = math.ceil(batch / nrow)
    os.makedirs(save_path, exist_ok=True)
    for i in range(batch):
        Image.fromarray(np.asarray(img[i])).save(
            os.path.join(save_path, f"{i + 1}.png")
        )
    # grid sheet without matplotlib: simple paste
    h, w = img.shape[1:3]
    sheet = Image.new("RGB", (ncol * w, nrow * h))
    for i in range(batch):
        r, c = divmod(i, ncol)
        sheet.paste(Image.fromarray(np.asarray(img[i])), (c * w, r * h))
    sheet.save(os.path.join(save_path, "total.png"))
