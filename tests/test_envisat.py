"""ENVISAT reader — synthetic ASAR-like product following the
MPH/SPH/DSD layout (frmts/envisat/EnvisatFile.c,
envisatdataset.cpp:920-1020)."""

import numpy as np
import pytest

from gdal_ray.codecs.envisat import read_envisat

MPH_SIZE = 1247
DSD_SIZE = 280


def _dsd(name, typ, offset, size, num_dsr, dsr_size):
    text = (f'DS_NAME="{name:<28s}"\n'
            f"DS_TYPE={typ}\n"
            f'FILENAME=""\n'
            f"DS_OFFSET=+{offset:020d}<bytes>\n"
            f"DS_SIZE=+{size:020d}<bytes>\n"
            f"NUM_DSR=+{num_dsr:010d}\n"
            f"DSR_SIZE=+{dsr_size:010d}<bytes>\n")
    return text.ljust(DSD_SIZE, " ").encode()


def _product(tmp_path, data, data2=None, data_type="SWORD",
             sample_type="DETECTED", product="ASA_IMP_1PXDEF"):
    h, w = data.shape
    itemsize = 2
    prefix = 17
    dsr_size = prefix + itemsize * w
    n_dsd = 2 if data2 is not None else 1
    sph_head = (f"SPH_DESCRIPTOR=\"Image Mode Precision Image\"\n"
                f"LINE_LENGTH=+{w:06d}<samples>\n"
                f"DATA_TYPE={data_type}\n"
                f"SAMPLE_TYPE={sample_type}\n")
    sph_size = len(sph_head) + n_dsd * DSD_SIZE
    ds_offset = MPH_SIZE + sph_size
    mph = (f'PRODUCT="{product:<62s}"\n'
           f"SPH_SIZE=+{sph_size:010d}<bytes>\n"
           f"NUM_DSD=+{n_dsd:010d}\n"
           f"DSD_SIZE=+{DSD_SIZE:010d}<bytes>\n")
    mph = mph.ljust(MPH_SIZE, " ").encode()

    def recs(d):
        out = bytearray()
        for y in range(d.shape[0]):
            out += bytes(prefix)
            out += d[y].astype(">i2").tobytes()
        return bytes(out)

    body1 = recs(data)
    dsds = _dsd("MDS1", "M", ds_offset, len(body1), h, dsr_size)
    body2 = b""
    if data2 is not None:
        body2 = recs(data2)
        dsds += _dsd("MDS2", "M", ds_offset + len(body1), len(body2),
                     h, dsr_size)
    sph = (sph_head.encode() + dsds)
    assert len(sph) == sph_size
    p = str(tmp_path / "ASA_IMP_1P.N1")
    open(p, "wb").write(mph + sph + body1 + body2)
    return p


def test_sword_detected(tmp_path):
    rng = np.random.default_rng(5)
    d = rng.integers(-3000, 3000, (11, 23)).astype(np.int16)
    p = _product(tmp_path, d)
    px, gt, nd, meta = read_envisat(p)
    assert px.shape == (11, 23) and px.dtype == np.int16
    assert np.array_equal(px, d)
    assert meta["MPH_PRODUCT"].startswith("ASA_IMP_1P")
    assert meta["SPH_DATA_TYPE"] == "SWORD"
    assert meta["band_names"] == ["MDS1"]


def test_two_measurement_bands(tmp_path):
    rng = np.random.default_rng(6)
    d1 = rng.integers(-100, 100, (5, 9)).astype(np.int16)
    d2 = rng.integers(-100, 100, (5, 9)).astype(np.int16)
    p = _product(tmp_path, d1, data2=d2)
    px, _, _, meta = read_envisat(p)
    assert px.shape == (5, 9, 2)
    assert np.array_equal(px[:, :, 0], d1)
    assert np.array_equal(px[:, :, 1], d2)
    assert meta["band_names"] == ["MDS1", "MDS2"]


def test_complex_sword(tmp_path):
    # SAMPLE_TYPE=COMPLEX -> interleaved big-endian int16 I/Q
    rng = np.random.default_rng(7)
    h, w, prefix = 4, 6, 17
    iq = rng.integers(-500, 500, (h, w, 2)).astype(np.int16)
    dsr_size = prefix + 4 * w
    sph_head = ('SPH_DESCRIPTOR="SLC"\n'
                f"LINE_LENGTH=+{w:06d}<samples>\n"
                "DATA_TYPE=SWORD\n"
                "SAMPLE_TYPE=COMPLEX\n")
    sph_size = len(sph_head) + DSD_SIZE
    ds_offset = MPH_SIZE + sph_size
    mph = (f'PRODUCT="{"ASA_IMS_1PXDEF":<62s}"\n'
           f"SPH_SIZE=+{sph_size:010d}<bytes>\n"
           "NUM_DSD=+0000000001\n"
           f"DSD_SIZE=+{DSD_SIZE:010d}<bytes>\n").ljust(
        MPH_SIZE, " ").encode()
    body = bytearray()
    for y in range(h):
        body += bytes(prefix) + iq[y].reshape(-1).astype(
            ">i2").tobytes()
    sph = sph_head.encode() + _dsd("MDS1", "M", ds_offset, len(body),
                                   h, dsr_size)
    p = str(tmp_path / "slc.n1")
    open(p, "wb").write(mph + sph + bytes(body))
    px, _, _, _ = read_envisat(p)
    assert px.dtype == np.complex64 and px.shape == (h, w)
    assert np.array_equal(px.real, iq[:, :, 0].astype(np.float32))
    assert np.array_equal(px.imag, iq[:, :, 1].astype(np.float32))


def test_dispatch(tmp_path):
    from gdal_ray.sources.raster import read_raster
    d = np.zeros((3, 4), dtype=np.int16)
    p = _product(tmp_path, d)
    px, _, _, meta = read_raster(p)
    assert meta["driver"] == "ENVISAT"


def test_not_envisat():
    with pytest.raises(ValueError):
        read_envisat(__file__)
