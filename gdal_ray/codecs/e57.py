"""ASTM E57 embedded-2D-image reader.

E57 is a point-cloud interchange format; the reference's E57 driver
(frmts/e57/e57driver.cpp) exposes only the embedded 2-D preview
images (``images2D`` in the XML section) as rasters, which is what we
replicate.  The physical file is divided into fixed-size pages whose
last 4 bytes are a CRC32; every logical stream (the XML section, each
binary blob section) is read by skipping those trailing CRCs
(e57driver.cpp ConvertE57LogicalOffsetToPhysical, :72-86).  A binary
blob section carries a 16-byte header (8 reserved bytes + little-
endian uint64 logical length) before the payload (:718-724).

Header (48 bytes, e57driver.cpp Open :470-510): ``ASTM-E57`` magic,
u32 version major/minor, u64 physical file size, u64 XML physical
offset, u64 XML logical length, u64 page size (>= 1024, multiple of
4).  Images are ``vectorChild`` entries under ``e57Root.images2D``
with one of the four representation structures; ``jpegImage`` blobs
decode via the JPEG codec, ``pngImage`` via PNG, and an optional
``imageMask`` blob is a single-band PNG of matching size
(:610-700,744-780).  Metadata keys follow the driver's descriptor
table (:400-425); elements with no text are skipped (CPLGetXMLValue
returns the default for text-less elements, port/cpl_minixml.cpp
:1667-1681).
"""

from __future__ import annotations

import re
import struct
import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["read_e57"]

_EOP = 4  # CRC32 bytes at the end of every physical page
_SECTION_HEADER = 16  # binary blob section header size

# (xml path relative to the vectorChild, metadata item); {rep} is the
# representation element name — e57driver.cpp:404-425
_MD_DESCRIPTORS = [
    ("name", "NAME"),
    ("description", "DESCRIPTION"),
    ("sensorVendor", "SENSOR_VENDOR"),
    ("sensorModel", "SENSOR_MODEL"),
    ("sensorSerialNumber", "SENSOR_SERIAL_NUMBER"),
    ("associatedData3DGuid", "ASSOCIATED_DATA_3D_GUID"),
    ("acquisitionDateTime.dateTimeValue", "ACQUISITION_DATE_TIME"),
    ("pose.rotation.w", "POSE_ROTATION_W"),
    ("pose.rotation.x", "POSE_ROTATION_X"),
    ("pose.rotation.y", "POSE_ROTATION_Y"),
    ("pose.rotation.z", "POSE_ROTATION_Z"),
    ("pose.translation.x", "POSE_TRANSLATION_X"),
    ("pose.translation.y", "POSE_TRANSLATION_Y"),
    ("pose.translation.z", "POSE_TRANSLATION_Z"),
    ("{rep}.pixelWidth", "PIXEL_WIDTH"),
    ("{rep}.pixelHeight", "PIXEL_HEIGHT"),
    ("{rep}.focalLength", "FOCAL_LENGTH"),
    ("{rep}.principalPointX", "PRINCIPAL_POINT_X"),
    ("{rep}.principalPointY", "PRINCIPAL_POINT_Y"),
    ("{rep}.radius", "RADIUS"),
]

_REPRESENTATIONS = ("sphericalRepresentation", "pinholeRepresentation",
                    "cylindricalRepresentation",
                    "visualReferenceRepresentation")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find(el, dotted: str):
    """CPLGetXMLNode-style dotted-path lookup ignoring namespaces."""
    cur = el
    for part in dotted.split("."):
        nxt = None
        for child in cur:
            if _local(child.tag) == part:
                nxt = child
                break
        if nxt is None:
            return None
        cur = nxt
    return cur


def _text_value(el, dotted: str):
    """CPLGetXMLValue: the element's text, or None when absent/empty."""
    node = _find(el, dotted)
    if node is None or node.text is None:
        return None
    return node.text


def _logical_read(buf: bytes, base: int, length: int, page_size: int,
                  header: int = 0) -> bytes:
    """Read `length` logical bytes starting `header` logical bytes
    after physical offset `base`, skipping the 4-byte CRC at the end
    of every physical page (ConvertE57LogicalOffsetToPhysical)."""
    logical_page = page_size - _EOP
    out = bytearray()
    pos = header
    while len(out) < length:
        phys = base + pos + ((base % page_size) + pos) // logical_page * _EOP
        page_end = (phys // page_size + 1) * page_size - _EOP
        if phys >= len(buf):
            raise ValueError("E57: read past end of file")
        n = min(length - len(out), page_end - phys)
        out += buf[phys:phys + n]
        pos += n
    return bytes(out)


def _valid_section_offset(offset: int, page_size: int) -> bool:
    """A section cannot start in a page's last 3 bytes
    (IsValidPhysicalOffsetForBeginningOfSection)."""
    return (offset % page_size) < page_size - (_EOP - 1)


_STD_LUM_Q = np.array([  # ITU-T T.81 Table K.1 (libjpeg std_luminance)
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)


def jpeg_quality_estimate(buf: bytes):
    """Recover the libjpeg quality setting from the first DQT
    luminance table (inverse of jcparam.c jpeg_set_quality scaling:
    q<50 → scale=5000/q, else scale=200-2q; each entry
    (std*scale+50)/100 clamped to [1,255]).  Returns None when no
    quality reproduces the table exactly (the reference JPEG driver's
    JPEG_QUALITY guess behaves the same way)."""
    pos = 2
    table = None
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        if marker == 0xDB:
            seglen = struct.unpack(">H", buf[pos + 2:pos + 4])[0]
            p = pos + 4
            end = pos + 2 + seglen
            while p < end:
                pq, tq = buf[p] >> 4, buf[p] & 15
                p += 1
                vals = (np.frombuffer(buf[p:p + 64], dtype=np.uint8)
                        .astype(np.int64) if pq == 0 else
                        np.frombuffer(buf[p:p + 128], dtype=">u2")
                        .astype(np.int64))
                p += 64 if pq == 0 else 128
                if tq == 0:
                    table = vals
            if table is not None:
                break
            pos = end
        elif marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
        elif marker == 0xDA:
            break
        else:
            pos += 2 + struct.unpack(">H", buf[pos + 2:pos + 4])[0]
    if table is None:
        return None
    from .jpeg import _UNZZ  # zigzag→natural index table
    natural = table[np.asarray(_UNZZ)]
    for q in range(1, 101):
        scale = 5000 // q if q < 50 else 200 - 2 * q
        cand = np.clip((_STD_LUM_Q * scale + 50) // 100, 1, 255)
        if np.array_equal(cand, natural):
            return q
    return None


def read_e57(path: str, subdataset: str | None = None):
    """Open an E57 file → ``(pixels, geotransform, nodata, meta)``.

    One embedded image → its decoded pixels plus the driver's
    metadata keys in ``meta`` (``NAME``, ``POSE_*``,
    ``REPRESENTATION_TYPE``, …), ``meta['mask']`` when an imageMask
    blob is present, and ``meta['xml:E57']`` with the raw XML.
    Several images → empty pixels plus ``meta['subdatasets']``
    formatted like the reference (``E57:"path":name``).
    ``subdataset`` selects one image by name or 1-based index."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if len(buf) < 48 or buf[:8] != b"ASTM-E57":
        raise ValueError("not an E57 file")
    ver_major, ver_minor = struct.unpack("<II", buf[8:16])
    if ver_major != 1:
        raise ValueError(f"E57: unsupported version {ver_major}.{ver_minor}")
    phys_size, xml_off, xml_len, page_size = struct.unpack("<QQQQ",
                                                           buf[16:48])
    if page_size < 1024 or page_size > 1024 * 1024 or page_size % 4:
        raise ValueError(f"E57: invalid page size {page_size}")
    if xml_len > len(buf) or not _valid_section_offset(xml_off, page_size):
        raise ValueError("E57: invalid XML section offset")
    xml_bytes = _logical_read(buf, xml_off, xml_len, page_size)
    xml_text = xml_bytes.decode("utf-8", errors="replace")
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as exc:
        raise ValueError(f"E57: cannot parse XML: {exc}") from exc
    if _local(root.tag) != "e57Root":
        raise ValueError("E57: root element is not e57Root")

    images = []
    images2d = _find(root, "images2D")
    for child in (images2d if images2d is not None else ()):
        if _local(child.tag) != "vectorChild":
            continue
        rep = rep_name = None
        for cand in _REPRESENTATIONS:
            rep = _find(child, cand)
            if rep is not None:
                rep_name = cand
                break
        if rep is None:
            continue
        img = _find(rep, "jpegImage")
        driver = "JPEG"
        if img is None:
            img = _find(rep, "pngImage")
            driver = "PNG"
        if img is None:
            continue
        off, length = img.get("fileOffset"), img.get("length")
        if off is None or length is None:
            continue
        md = {"REPRESENTATION_TYPE": rep_name.replace("Representation", "")}
        for xml_path, key in _MD_DESCRIPTORS:
            val = _text_value(child, xml_path.replace("{rep}", rep_name))
            if val is not None:
                md[key] = val
        desc = {
            "driver": driver, "offset": int(off), "length": int(length),
            "width": int(_text_value(rep, "imageWidth") or 0),
            "height": int(_text_value(rep, "imageHeight") or 0),
            "md": md, "name": md.get("NAME"),
            "mask_offset": None, "mask_length": None,
        }
        mask = _find(rep, "imageMask")
        if mask is not None and mask.get("fileOffset") and mask.get("length"):
            desc["mask_offset"] = int(mask.get("fileOffset"))
            desc["mask_length"] = int(mask.get("length"))
        images.append(desc)

    meta: dict = {"driver": "E57", "xml:E57": xml_text}
    if not images:
        raise ValueError("E57: no 2D image found")

    if subdataset is not None:
        chosen = [d for i, d in enumerate(images)
                  if d["name"] == subdataset or str(i + 1) == subdataset]
        if not chosen:
            raise ValueError(f"E57: subdataset {subdataset!r} not found")
        images = chosen[:1]

    if len(images) > 1:
        meta["subdatasets"] = {}
        for i, d in enumerate(images):
            meta["subdatasets"][f"SUBDATASET_{i + 1}_NAME"] = \
                f'E57:"{path}":{d["name"] or i + 1}'
            meta["subdatasets"][f"SUBDATASET_{i + 1}_DESC"] = \
                f'Image {d["name"] or i + 1} ({d["width"]}x{d["height"]})'
        return np.zeros((0, 0), dtype=np.uint8), None, None, meta

    d = images[0]
    if not _valid_section_offset(d["offset"], page_size):
        raise ValueError(f"E57: invalid image offset {d['offset']}")
    blob = _logical_read(buf, d["offset"], d["length"], page_size,
                         header=_SECTION_HEADER)
    if d["driver"] == "JPEG":
        from .jpeg import decode as _djpeg
        px = _djpeg(blob)
        q = jpeg_quality_estimate(blob)
        if q is not None:
            meta["image_structure"] = {"JPEG_QUALITY": str(q)}
    else:
        from .png import decode as _dpng
        px = _dpng(blob)
    meta.update(d["md"])
    if d["mask_offset"] is not None and \
            _valid_section_offset(d["mask_offset"], page_size):
        mask_blob = _logical_read(buf, d["mask_offset"], d["mask_length"],
                                  page_size, header=_SECTION_HEADER)
        from .png import decode as _dpng
        mask_px = np.asarray(_dpng(mask_blob))
        if mask_px.ndim == 3 and mask_px.shape[2] == 1:
            mask_px = mask_px[..., 0]
        if mask_px.ndim == 2 and mask_px.shape[:2] == px.shape[:2]:
            meta["mask"] = mask_px
    return np.asarray(px), None, None, meta
