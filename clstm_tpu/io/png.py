"""PNG image I/O.

Reference: read_png/write_png in extras.{h,cc} (libpng, float grayscale;
≈L1-400, unverified). Host-side decode via PIL here; a native C++
libpng/threaded decoder (native/clstm_io.cc) is used by the dataset
prefetcher when built, with this as the fallback. Images are float32
grayscale in [0, 1].
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def read_png(fname: str) -> np.ndarray:
    """Read an image file as float32 grayscale [h, w] in [0, 1]."""
    with Image.open(fname) as im:
        g = im.convert("L")
        arr = np.asarray(g, dtype=np.float32) / 255.0
    return arr


def write_png(fname: str, img: np.ndarray) -> None:
    """Write a float [0, 1] (or uint8) grayscale array as PNG."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = np.clip(a, 0.0, 1.0)
        a = (a * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(a, mode="L").save(fname)
