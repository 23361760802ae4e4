"""Image codec dispatch: fmt string → encode/decode.

``png`` is a real standard PNG (zlib). ``gtiff``/``tif`` is a real
GeoTIFF (gtiff.py, golden-checksum-verified against the reference's
autotest fixtures). ``jpeg`` is the DCT stand-in codec (see dct.py
docstring — no libjpeg in this container).
"""

from __future__ import annotations

import numpy as np

from . import dct, png

_MAGIC_EXR = b"\x76\x2f\x31\x01"
_MAGIC_KTX2 = b"\xabKTX 20\xbb\r\n\x1a\n"

# user-extension surface (GDAL driver-manager analog,
# gcore/gdaldrivermanager.cpp): registered codecs are consulted before
# the built-ins; a magic-sniffer may claim un-tagged buffers
_CUSTOM: dict[str, tuple] = {}      # fmt -> (encode_fn, decode_fn)
_SNIFFERS: list = []                # [(predicate(bytes)->bool, fmt)]


def register_codec(fmt: str, encode_fn, decode_fn, sniffer=None) -> None:
    """Register a user image codec: encode_fn(img, **kw) -> bytes,
    decode_fn(bytes) -> ndarray; optional sniffer(buf) -> bool for
    magic-based dispatch when fmt is unknown."""
    if not callable(encode_fn) or not callable(decode_fn):
        raise TypeError("codec hooks must be callable")
    _CUSTOM[fmt] = (encode_fn, decode_fn)
    if sniffer is not None:
        _SNIFFERS.append((sniffer, fmt))


def encode(img: np.ndarray, fmt: str, **kw) -> bytes:
    if fmt in _CUSTOM:
        return _CUSTOM[fmt][0](img, **kw)
    if fmt == "png":
        return png.encode(img, **kw)
    if fmt in ("jpeg", "jpg"):
        return dct.encode(img, **kw)
    if fmt in ("gtiff", "tif", "tiff"):
        from . import gtiff
        return gtiff.encode_gtiff(img, **kw)
    if fmt in ("pnm", "pgm", "ppm"):
        from . import pnm
        return pnm.encode_pnm(img, **kw)
    if fmt == "bmp":
        from . import bmp
        return bmp.encode_bmp(img, **kw)
    if fmt == "webp":
        from . import webp
        return webp.encode_webp(img, **kw)
    if fmt in ("netcdf", "nc"):
        from . import netcdf
        return netcdf.encode_netcdf(img, **kw)
    raise ValueError(f"unknown image format {fmt!r}")


def decode(buf: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode by fmt, or sniff from magic bytes when fmt is None."""
    if fmt is None:
        for sniff, f in _SNIFFERS:
            if sniff(buf):
                fmt = f
                break
    if fmt in _CUSTOM:
        return _CUSTOM[fmt][1](buf)
    if fmt is None:
        if buf[:8] == b"\x89PNG\r\n\x1a\n":
            fmt = "png"
        elif buf[:4] == b"GRJ1" or buf[:2] == b"\xFF\xD8":
            fmt = "jpeg"
        elif buf[:2] in (b"II", b"MM"):
            fmt = "gtiff"
        elif buf[:2] == b"BM":
            fmt = "bmp"
        elif buf[:1] == b"P" and buf[1:2] in b"23456":
            fmt = "pnm"
        elif buf[:4] == b"RIFF" and buf[8:12] == b"WEBP":
            fmt = "webp"
        elif buf[:3] == b"CDF" and buf[3:4] in (b"\x01", b"\x02", b"\x05"):
            fmt = "netcdf"
        elif buf[:4] == b"GIF8":
            fmt = "gif"
        elif buf[:12] == b"\x00\x00\x00\x0cjP  \r\n\x87\n" or \
                buf[:4] == b"\xff\x4f\xff\x51":
            fmt = "jp2"
        elif buf[:4] == _MAGIC_EXR:
            fmt = "exr"
        elif buf[:12] == _MAGIC_KTX2:
            fmt = "ktx2"
        elif len(buf) >= 16 and buf[4:8] == b"ftyp":
            fmt = "heif"
        elif b"GRIB" in buf[:8192]:
            # degrib/NDFD .bin wrappers put text before the first
            # message; the GRIB reader scans for the magic itself
            fmt = "grib"
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
    if fmt in ("pnm", "pgm", "ppm"):
        from . import pnm
        return pnm.decode_pnm(buf)
    if fmt == "bmp":
        from . import bmp
        px, _pal = bmp.decode_bmp(buf)
        return px
    if fmt == "webp":
        from . import webp
        return webp.decode_webp(buf)
    if fmt in ("jp2", "j2k", "jpeg2000"):
        from . import jp2
        px, _gt, _nd, _meta = jp2.decode_jp2(buf)
        return px if px.ndim == 3 else px[:, :, None]
    if fmt in ("netcdf", "nc"):
        from . import netcdf
        px, _gt, _nd, _meta = netcdf.decode_netcdf(buf)
        return px
    if fmt in ("grib", "grb", "grb2", "grib2"):
        from . import grib2
        px, _gt, _nd, _meta = grib2.decode_grib2(buf)
        return px if px.ndim >= 2 else px[:, :, None]
    if fmt == "gif":
        from . import gif
        idx, _pal, _tr = gif.decode_gif(buf)
        return idx                      # palette-index band, like BMP
    if fmt == "exr":
        from . import exr
        px, _gt, _nd, _meta = exr.read_exr(buf)
        return px if px.ndim == 3 else px[:, :, None]
    if fmt == "ktx2":
        from . import ktx2
        px, _gt, _nd, _meta = ktx2.read_ktx2(buf)
        if px.size == 0:
            raise ValueError(
                f"KTX2 payload needs the {_meta.get('codec')} transcoder")
        return px if px.ndim == 3 else px[:, :, None]
    if fmt in ("heif", "heic", "avif"):
        import os
        import tempfile
        from . import heif as _heif
        # the heif reader is path-based; spill to a temp twin
        with tempfile.NamedTemporaryFile(suffix=".heif",
                                         delete=False) as tf:
            tf.write(buf)
            name = tf.name
        try:
            px, _gt, _nd, _meta = _heif.read_heif(name)
        finally:
            os.unlink(name)
        if px.size == 0:
            raise ValueError(
                f"HEIF payload needs the {_meta.get('codec')} decoder")
        return px if px.ndim == 3 else px[:, :, None]
    raise ValueError(f"unknown image format {fmt!r}")


psnr = dct.psnr
