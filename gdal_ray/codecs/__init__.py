"""Image codec dispatch: fmt string → encode/decode.

``png`` is a real standard PNG (zlib). ``gtiff``/``tif`` is a real
GeoTIFF (gtiff.py, golden-checksum-verified against the reference's
autotest fixtures). ``jpeg`` is the DCT stand-in codec (see dct.py
docstring — no libjpeg in this container).
"""

from __future__ import annotations

import numpy as np

from . import dct, png


def encode(img: np.ndarray, fmt: str, **kw) -> bytes:
    if fmt == "png":
        return png.encode(img, **kw)
    if fmt in ("jpeg", "jpg"):
        return dct.encode(img, **kw)
    if fmt in ("gtiff", "tif", "tiff"):
        from . import gtiff
        return gtiff.encode_gtiff(img, **kw)
    raise ValueError(f"unknown image format {fmt!r}")


def decode(buf: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode by fmt, or sniff from magic bytes when fmt is None."""
    if fmt is None:
        if buf[:8] == b"\x89PNG\r\n\x1a\n":
            fmt = "png"
        elif buf[:4] == b"GRJ1" or buf[:2] == b"\xFF\xD8":
            fmt = "jpeg"
        elif buf[:2] in (b"II", b"MM"):
            fmt = "gtiff"
        else:
            raise ValueError("unrecognized image magic")
    if fmt == "png":
        return png.decode(buf)
    if fmt in ("jpeg", "jpg"):
        # magic dispatch: real JFIF streams (FFD8) go to the T.81
        # baseline decoder; the synthetic corpus's GRJ1 stand-in keeps
        # its vectorized path
        if buf[:2] == b"\xFF\xD8":
            from . import jpeg as real_jpeg
            return real_jpeg.decode(buf)
        return dct.decode(buf)
    if fmt in ("gtiff", "tif", "tiff"):
        from . import gtiff
        g = gtiff.decode_gtiff(buf)
        px = g.pixels
        return px if px.ndim == 3 else px[:, :, None]
    raise ValueError(f"unknown image format {fmt!r}")


psnr = dct.psnr
