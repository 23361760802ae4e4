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


# ------------------------------------------------------------- writer
_CRC32C_TABLE = None


def _crc32c_table() -> "np.ndarray":
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        tbl = np.empty(256, dtype=np.uint32)
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            tbl[i] = c
        _CRC32C_TABLE = tbl
    return _CRC32C_TABLE


def _crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli, poly 0x1EDC6F41 reflected 0x82F63B78) —
    the per-page checksum the E57 format stores in the last 4 bytes
    of every physical page."""
    return int(_crc32c_rows(
        np.frombuffer(data, dtype=np.uint8)[None, :])[0])


def _crc32c_rows(rows: "np.ndarray") -> "np.ndarray":
    """CRC-32C of every row of a (pages, page_len) uint8 matrix —
    vectorized across pages (one table lookup per byte column), so
    packing an n-page file costs page_len numpy ops, not
    n·page_len Python steps."""
    tbl = _crc32c_table()
    crc = np.full(rows.shape[0], 0xFFFFFFFF, dtype=np.uint32)
    for j in range(rows.shape[1]):
        crc = tbl[(crc ^ rows[:, j]) & 0xFF] ^ (crc >> np.uint32(8))
    return crc ^ np.uint32(0xFFFFFFFF)


def _pack_pages(logical: bytes, page_size: int = 1024) -> bytes:
    """Pack a logical byte stream into physical pages, zero-padding
    the last page and appending the CRC-32C of each page's payload."""
    payload = page_size - _EOP
    n_pages = max(1, -(-len(logical) // payload))
    mat = np.zeros((n_pages, payload), dtype=np.uint8)
    flat = np.frombuffer(logical, dtype=np.uint8)
    mat.reshape(-1)[:len(flat)] = flat
    crcs = _crc32c_rows(mat)
    out = np.zeros((n_pages, page_size), dtype=np.uint8)
    out[:, :payload] = mat
    out[:, payload:] = crcs.astype("<u4").view(np.uint8).reshape(
        n_pages, _EOP)
    return out.tobytes()


def write_e57(path: str, pixels, *, name: str = "image",
              fmt: str = "png", page_size: int = 1024,
              jpeg_quality: int = 90) -> None:
    """Write a single-image E57 file the reference driver (and
    read_e57) can open: 48-byte header page, XML section at the next
    page boundary, one binary blob section (16-byte header + PNG or
    JPEG payload), every page CRC-32C-stamped."""
    import numpy as np
    px = np.asarray(pixels)
    h, w = px.shape[:2]
    if fmt == "png":
        from .png import encode as _enc
        blob = _enc(px)
    elif fmt == "jpeg":
        from .jpeg import encode as _enc
        blob = _enc(px, quality=jpeg_quality)
    else:
        raise ValueError(f"E57 writer: unsupported payload fmt {fmt!r}")
    tag = "jpegImage" if fmt == "jpeg" else "pngImage"

    payload = page_size - _EOP
    xml_phys = page_size  # XML section starts on page 1

    def _xml_for(blob_phys: int) -> bytes:
        return (f'<e57Root type="Structure" xmlns="http://www.astm.org'
                f'/COMMIT/E57/2010-e57-v1.0">\n'
                f'<images2D type="Vector" '
                f'allowHeterogeneousChildren="1">\n'
                f'<vectorChild type="Structure">\n'
                f'<name type="String"><![CDATA[{name}]]></name>\n'
                f'<visualReferenceRepresentation type="Structure">\n'
                f'<{tag} type="Blob" fileOffset="{blob_phys}" '
                f'length="{len(blob)}"/>\n'
                f'<imageHeight type="Integer">{h}</imageHeight>\n'
                f'<imageWidth type="Integer">{w}</imageWidth>\n'
                f'</visualReferenceRepresentation>\n'
                f'</vectorChild>\n</images2D>\n</e57Root>'
                ).encode("utf-8")

    # XML length varies with the blob offset digits: iterate to fix point
    blob_phys = 0
    for _ in range(4):
        xml = _xml_for(blob_phys)
        n_xml_pages = max(1, -(-len(xml) // payload))
        new_blob_phys = xml_phys + n_xml_pages * page_size
        if new_blob_phys == blob_phys:
            break
        blob_phys = new_blob_phys
    xml = _xml_for(blob_phys)

    blob_logical = b"\x00" * 8 + struct.pack("<Q", len(blob)) + blob
    blob_pages = _pack_pages(blob_logical, page_size)
    phys_size = blob_phys + len(blob_pages)

    header = (b"ASTM-E57" + struct.pack("<II", 1, 0)
              + struct.pack("<QQQQ", phys_size, xml_phys, len(xml),
                            page_size))
    with open(path, "wb") as fh:
        fh.write(_pack_pages(header, page_size))
        fh.write(_pack_pages(xml, page_size))
        fh.write(blob_pages)
