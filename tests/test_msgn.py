"""MSGN reader — synthetic MSG native archive built from the
reference's packed struct layouts (frmts/msgn/msg_basic_types.h)."""

import struct

import numpy as np
import pytest

from gdal_ray.codecs.msgn import read_msgn

NUM_CH = 12
RAD_OFFSET = 60134 + 700 + 326058 + 101


def _ph(name, value):
    # PH_DATA: 30-byte name ending in ": " + 50-byte value
    nm = (name[:28].ljust(28) + ": ").encode()
    return nm + value.ljust(50).encode()[:50]


def _ph_id(name, size, addr):
    return (name.ljust(30).encode()[:30]
            + str(size).ljust(16).encode()[:16]
            + str(addr).ljust(16).encode()[:16])


def _make_msgn(tmp_path, counts, selected, lines, cols):
    """counts: (lines, cols, nbands) uint16 10-bit values."""
    n_sel = len(selected)
    bytes_per_line = (cols * 10 + 7) // 8
    packet_length = bytes_per_line + 16 + 27 - 1
    packet_size = packet_length + 22 + 1
    interline = packet_size * n_sel

    header_off = 5000
    header_size = RAD_OFFSET + 101 + 2000
    data_off = header_off + header_size
    data_size = interline * lines
    trailer_off = data_off + data_size

    main = b""
    main += _ph("FormatName", "NATIVE")
    for nm in ("FormatDocumentName", "FormatDocumentMajorVersion",
               "FormatDocumentMinorVersion", "CreationDateTime",
               "CreatingCentre"):
        main += _ph(nm, "x")
    main += _ph_id("15Header", header_size, header_off)
    main += _ph_id("15Data", data_size, data_off)
    main += _ph_id("15Trailer", 100, trailer_off)
    main += _ph_id("unused1", 0, 0)
    main += _ph_id("unused2", 0, 0)
    main += bytes(1364)
    for i in range(19):
        main += _ph(f"tail{i}", "v")
    assert len(main) == 6 * 80 + 5 * 62 + 1364 + 19 * 80

    band_flags = "".join("X" if i in selected else "-"
                         for i in range(NUM_CH))
    sec = b""
    for nm in ("abid", "smod", "apxs", "avpa", "lscd", "lmap",
               "qdlc", "qdlp", "qqai"):
        sec += _ph(nm, "")
    sec += _ph("SelectedBandIDs", band_flags)
    sec += _ph("SouthLineSelectedRectangle", "1")
    sec += _ph("NorthLineSelectedRectangle", str(lines))
    sec += _ph("EastColumnSelectedRectangle", "1")
    sec += _ph("WestColumnSelectedRectangle", str(cols))

    buf = bytearray(trailer_off + 200)
    buf[:len(main)] = main
    buf[len(main):len(main) + len(sec)] = sec

    # image description record inside the 15Header section
    idr_off = RAD_OFFSET - 101 + header_off + 22 + 16 + 1
    struct.pack_into(">Bf", buf, idr_off, 1, 0.0)  # proj, lon SSP
    struct.pack_into(">iiffB", buf, idr_off + 5, 3712, 3712,
                     3.0, 3.0, 2)
    cal_off = idr_off + 101 + 72
    for i in range(NUM_CH):
        struct.pack_into(">dd", buf, cal_off + 16 * i,
                         0.02 + i * 0.001, -1.0)

    weights = (1 << np.arange(9, -1, -1)).astype(np.uint32)
    for y in range(lines):
        iy = lines - 1 - y  # storage index (bottom-up)
        for slot in range(n_sel):
            p = data_off + interline * iy + slot * packet_size
            # GP_PK_HEADER: packetLength at offset 18 (big-endian)
            struct.pack_into(">I", buf, p + 18, packet_length)
            sub = p + 22 + 16
            buf[sub + 17] = selected[slot] + 1  # channelId
            struct.pack_into(">I", buf, sub + 13, y + 1)  # line no
            buf[sub + 24] = 1  # lineValidity
            # pixel payload: value for column c is stored mirrored,
            # i.e. sample c corresponds to column cols-1-c
            vals = counts[iy, ::-1, slot].astype(np.uint32)
            bits = ((vals[:, None] & weights[None, :]) > 0).astype(
                np.uint8)
            packed = np.packbits(bits.reshape(-1))
            buf[sub + 27:sub + 27 + len(packed)] = packed.tobytes()
    p = str(tmp_path / "msg.nat")
    open(p, "wb").write(bytes(buf))
    return p


def test_visir_decode(tmp_path):
    rng = np.random.default_rng(12)
    lines, cols = 6, 11
    selected = [0, 3, 7]  # channels 1, 4, 8
    counts = rng.integers(0, 1024, (lines, cols, 3)).astype(np.uint16)
    p = _make_msgn(tmp_path, counts, selected, lines, cols)
    px, gt, nodata, meta = read_msgn(p)
    assert px.shape == (lines, cols, 3)
    assert np.array_equal(px, counts)
    assert meta["bands"] == ["band 01", "band 04", "band 08"]
    assert meta["calibration"][0][0] == pytest.approx(0.02)
    assert "+proj=geos" in meta["crs"]
    # geotransform: 3 km steps, south/east = 1 -> origin at the
    # reference's grid formula
    assert gt[1] == pytest.approx(3000.0)
    assert gt[5] == pytest.approx(-3000.0)
    assert gt[0] == pytest.approx(-3000.0 * (3712 / 2.0))
    assert gt[3] == pytest.approx(3000.0 * (3712 / 2.0 - 1 + 1.5))


def test_invalid_lines_are_nodata(tmp_path):
    rng = np.random.default_rng(13)
    lines, cols = 4, 8
    counts = rng.integers(1, 1024, (lines, cols, 1)).astype(np.uint16)
    p = _make_msgn(tmp_path, counts, [2], lines, cols)
    # corrupt validity of storage row 1
    data = bytearray(open(p, "rb").read())
    bytes_per_line = (cols * 10 + 7) // 8
    packet_size = bytes_per_line + 16 + 27 - 1 + 22 + 1
    header_off = 5000
    data_off = header_off + RAD_OFFSET + 101 + 2000
    sub = data_off + packet_size * 1 + 22 + 16
    data[sub + 24] = 0
    open(p, "wb").write(bytes(data))
    px, _, nd, _ = read_msgn(p)
    assert nd == 0
    assert np.all(px[1] == 0)  # invalid line zeroed
    assert np.array_equal(px[0], counts[0, :, 0])


def test_dispatch(tmp_path):
    from gdal_ray.sources.raster import read_raster
    counts = np.ones((3, 5, 1), dtype=np.uint16)
    p = _make_msgn(tmp_path, counts, [0], 3, 5)
    px, gt, nd, meta = read_raster(p)
    assert meta["driver"] == "MSGN"


def test_not_msgn():
    with pytest.raises(ValueError):
        read_msgn(__file__)
