"""AVI (RIFF) container codec for MJPEG video — pure struct.

Implements the public AVI 1.0 RIFF layout: hdrl LIST (avih main
header + one strl with strh/strf video stream headers), movi LIST of
``00dc`` compressed-frame chunks, idx1 index. The video codec is
MJPEG: each frame chunk is a standalone JFIF stream decoded by this
package's own T.81 decoder (codecs/jpeg.py) — so the multimodal video
stage's ``backend="real"`` (stages/multimodal.py) runs a genuinely
real decode path with zero external dependencies.

decode_avi returns the frame payloads still encoded (the stage
decides which frames to decode — frame-accurate sampling without
paying for every frame, the point of an indexed container).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_avi_mjpeg", "decode_avi"]


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi_mjpeg(frames: list[bytes], fps: float, w: int,
                     h: int) -> bytes:
    """JPEG frame payloads → AVI bytes (one 00dc chunk per frame +
    idx1)."""
    if fps <= 0:
        raise ValueError("fps must be positive")
    usec = int(round(1_000_000 / fps))
    maxbytes = max((len(f) for f in frames), default=0)
    avih = struct.pack("<14I", usec, maxbytes * int(np.ceil(fps)), 0,
                       0x10,                # AVIF_HASINDEX
                       len(frames), 0, 1, maxbytes, w, h, 0, 0, 0, 0)
    # scale/rate: frame period = scale/rate seconds; use (usec, 1e6)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh",
                       b"vids", b"MJPG", 0, 0, 0, 0,
                       usec, 1_000_000, 0, len(frames), maxbytes,
                       0xFFFFFFFF, 0, 0, 0, w, h)
    # BITMAPINFOHEADER
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)

    movi_body = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))       # offset from 'movi' tag
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)

    idx = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(frames[i]))
        for i, off in enumerate(offsets))
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(buf: bytes, pos: int, end: int):
    """Yield (fourcc, list_kind_or_None, body_start, body_size)."""
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        if cid == b"LIST":
            kind = buf[pos + 8:pos + 12]
            yield cid, kind, pos + 12, size - 4
        else:
            yield cid, None, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi(buf: bytes) -> dict:
    """AVI bytes → {"frames": [jpeg bytes, ...], "fps": float,
    "w": int, "h": int, "n_frames": int, "codec": fourcc}."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    fps, w, h, n_frames = 0.0, 0, 0, 0
    codec = b""
    frames: list[bytes] = []

    def scan(pos, end):
        nonlocal fps, w, h, n_frames, codec
        for cid, kind, bstart, bsize in _walk(buf, pos, end):
            if cid == b"LIST":
                if kind == b"movi":
                    for c2, _k2, s2, z2 in _walk(buf, bstart, bstart + bsize):
                        if c2[2:4] in (b"dc", b"db"):
                            frames.append(bytes(buf[s2:s2 + z2]))
                else:
                    scan(bstart, bstart + bsize)
            elif cid == b"avih":
                vals = struct.unpack_from("<14I", buf, bstart)
                if vals[0]:
                    fps = 1_000_000 / vals[0]
                n_frames = vals[4]
                w, h = vals[8], vals[9]
            elif cid == b"strh":
                typ, hdl = buf[bstart:bstart + 4], buf[bstart + 4:bstart + 8]
                if typ == b"vids":
                    codec = hdl
                    scale, rate = struct.unpack_from("<II", buf, bstart + 20)
                    if scale and rate:
                        fps = rate / scale
    scan(12, len(buf))
    return {"frames": frames, "fps": fps, "w": w, "h": h,
            "n_frames": n_frames or len(frames), "codec": codec.decode(
                "latin1")}
