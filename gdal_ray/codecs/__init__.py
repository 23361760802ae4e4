"""Image codec dispatch: fmt string → encode/decode.

``png`` is a real standard PNG (zlib). ``jpeg`` is the DCT stand-in
codec (see dct.py docstring — no libjpeg in this container).
"""

from __future__ import annotations

import numpy as np

from . import dct, png


def encode(img: np.ndarray, fmt: str, **kw) -> bytes:
    if fmt == "png":
        return png.encode(img, **kw)
    if fmt in ("jpeg", "jpg"):
        return dct.encode(img, **kw)
    raise ValueError(f"unknown image format {fmt!r}")


def decode(buf: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode by fmt, or sniff from magic bytes when fmt is None."""
    if fmt is None:
        if buf[:8] == b"\x89PNG\r\n\x1a\n":
            fmt = "png"
        elif buf[:4] == b"GRJ1":
            fmt = "jpeg"
        else:
            raise ValueError("unrecognized image magic")
    if fmt == "png":
        return png.decode(buf)
    if fmt in ("jpeg", "jpg"):
        return dct.decode(buf)
    raise ValueError(f"unknown image format {fmt!r}")


psnr = dct.psnr
