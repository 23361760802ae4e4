"""KTX2 (Khronos texture container) reader.

Parses the published KTX 2.0 layout: 12-byte magic, header
(vkFormat, typeSize, pixelWidth/Height/Depth, layerCount, faceCount,
levelCount, supercompressionScheme), the DFD/KVD/SGD section index,
and the per-level byte ranges.  Key/value data (4-byte aligned
``length,key\\0value`` entries) lands in ``meta``.  Uncompressed
R8/RG8/RGB8/RGBA8 UNORM/SRGB payloads (supercompression NONE or
ZLIB) decode to pixels; BasisLZ/ETC1S and UASTC textures — which the
reference driver (frmts/basisu_ktx2) transcodes through libbasisu —
are exposed metadata-only with ``meta['codec']`` naming the missing
transcoder, mirroring how the HEIF reader handles HEVC/AV1 payloads.

Mip levels beyond the base land in ``meta['overviews']`` as
(width, height) descriptors."""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["read_ktx2", "identify_ktx2"]

_MAGIC = b"\xabKTX 20\xbb\r\n\x1a\n"

# VkFormat → (bands, dtype); UNORM and SRGB 8-bit families
_VK_RAW = {
    9: (1, np.uint8), 15: (1, np.uint8),     # R8_UNORM / R8_SRGB
    16: (2, np.uint8), 22: (2, np.uint8),    # R8G8
    23: (3, np.uint8), 29: (3, np.uint8),    # R8G8B8
    37: (4, np.uint8), 43: (4, np.uint8),    # R8G8B8A8
    70: (1, np.dtype("<u2")),                # R16_UNORM
}


def identify_ktx2(head: bytes) -> bool:
    return head[:12] == _MAGIC


def read_ktx2(path_or_bytes):
    buf = path_or_bytes if isinstance(path_or_bytes,
                                      (bytes, bytearray)) else \
        open(path_or_bytes, "rb").read()
    if not identify_ktx2(buf):
        raise ValueError("not a KTX2 file")
    (vk_format, type_size, w, h, depth, layers, faces, levels,
     scheme) = struct.unpack_from("<9I", buf, 12)
    (dfd_off, dfd_len, kvd_off, kvd_len) = struct.unpack_from(
        "<4I", buf, 48)
    sgd_off, sgd_len = struct.unpack_from("<2Q", buf, 64)
    n_levels = max(1, levels)
    level_index = []
    p = 80
    for _ in range(n_levels):
        off, ln, uln = struct.unpack_from("<3Q", buf, p)
        p += 24
        level_index.append((off, ln, uln))

    meta: dict = {"driver": "KTX2", "width": int(w), "height": int(h),
                  "levels": n_levels, "faces": int(faces),
                  "layers": int(layers), "vk_format": int(vk_format)}
    # key/value data
    p = kvd_off
    end = kvd_off + kvd_len
    while p + 4 <= end:
        ln = struct.unpack_from("<I", buf, p)[0]
        p += 4
        entry = buf[p:p + ln]
        if b"\x00" in entry:
            k, _, v = entry.partition(b"\x00")
            meta[k.decode("utf-8", "replace")] = \
                v.rstrip(b"\x00").decode("utf-8", "replace")
        p += (ln + 3) & ~3

    if n_levels > 1:
        meta["overviews"] = [(max(1, w >> k), max(1, h >> k))
                             for k in range(1, n_levels)]

    if scheme == 1 or vk_format == 0:
        meta["codec"] = "basislz-etc1s" if scheme == 1 else "uastc"
        return np.zeros((0, 0), dtype=np.uint8), None, None, meta
    if scheme not in (0, 3):
        raise ValueError(f"KTX2: supercompression scheme {scheme} "
                         "not supported")
    if vk_format not in _VK_RAW:
        meta["codec"] = f"vkFormat {vk_format}"
        return np.zeros((0, 0), dtype=np.uint8), None, None, meta

    bands, dt = _VK_RAW[vk_format]
    off, ln, uln = level_index[0]
    data = buf[off:off + ln]
    if scheme == 3:
        data = zlib.decompress(data)
    need = w * h * bands * np.dtype(dt).itemsize
    if len(data) < need:
        raise ValueError("KTX2: truncated level data")
    px = np.frombuffer(data, dtype=dt, count=w * h * bands).reshape(
        h, w, bands)
    if bands == 1:
        px = px[:, :, 0]
    return px.copy(), None, None, meta
