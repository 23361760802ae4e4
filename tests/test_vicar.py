"""VICAR reader parity with the reference's own
autotest/gdrivers/vicar.py — 13 datatype fixtures (both endians, VAX
F/D floats, complex, BSQ/BIL/BIP), 4 BASIC/BASIC2-compressed
fixtures, the truncated MEX HRSC file's georeferencing / nodata /
scale / offset / curated metadata, and the binary-prefix table."""

import numpy as np
import pytest

from gdal_ray.codecs.vicar import (decode_vicar, parse_vicar_label,
                                   read_vicar_prefix)
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

D = "/root/reference/autotest/gdrivers/data/vicar/"

DATATYPES = [
    ("vicar_byte", np.uint8, 129),
    ("vicar_int16", np.int16, 129),
    ("vicar_bigendian_int16", np.int16, 129),
    ("vicar_int32", np.int32, 129),
    ("vicar_float32_bsq", np.float32, 123),
    ("vicar_float32_bil", np.float32, 123),
    ("vicar_float32_bip", np.float32, 123),
    ("vicar_bigendian_float32", np.float32, 129),
    ("vicar_float64", np.float64, 129),
    ("vicar_cfloat32", np.complex64, 148),
    ("vicar_vax_float32", np.float32, 129),
    ("vicar_vax_float64", np.float64, 129),
    ("vicar_vax_cfloat32", np.complex64, 226),
]

COMPRESSED = [
    ("vicar_byte_basic", np.uint8, 4672),
    ("vicar_byte_basic2", np.uint8, 4672),
    ("vicar_int16_basic2", np.int16, 4672),
    ("vicar_all_ones_basic2", np.uint8, 34464),
]


@pytest.mark.parametrize("name,dt,cs", DATATYPES,
                         ids=[t[0] for t in DATATYPES])
def test_vicar_datatypes(name, dt, cs):
    px, gt, nd, meta = decode_vicar(open(D + name + ".vic", "rb").read())
    assert px.dtype == dt
    b1 = px if px.ndim == 2 else px[..., 0]
    assert checksum(b1) == cs


@pytest.mark.parametrize("name,dt,cs", COMPRESSED,
                         ids=[t[0] for t in COMPRESSED])
def test_vicar_compressed(name, dt, cs):
    px, gt, nd, meta = decode_vicar(open(D + name + ".vic", "rb").read())
    assert px.dtype == dt
    assert checksum(px) == cs


def test_vicar_truncated_hrsc():
    px, gt, nd, meta = decode_vicar(
        open(D + "test_vicar_truncated.bin", "rb").read())
    assert px.shape == (1000, 400)
    assert gt == (-53985.0, 25.0, 0.0, -200805.0, 0.0, -25.0)
    assert nd == 0.0
    assert meta["scale"] == pytest.approx(2.34, abs=1e-5)
    assert meta["offset"] == pytest.approx(4.56, abs=1e-5)
    assert meta["crs"] == ("+proj=sinu +lon_0=137 +R=3396000 "
                           "+units=m +no_defs")
    # the reference's exact GetMetadata() dictionary
    expected = {
        "DLRTO8.REFLECTANCE_OFFSET": "4.56", "PRODUCT_TYPE": "IMAGE",
        "M94_ORBIT.STOP_TIME": "stop_time",
        "FILE.EVENT_TYPE": "EVENT_TYPE",
        "M94_CAMERAS.MACROPIXEL_SIZE": "1",
        "M94_INSTRUMENT.DETECTOR_ID": "MEX_HRSC_NADIR",
        "HRORTHO.SPICE_FILE_NAME": "SPICE_FILE_NAME",
        "DLRTO8.RADIANCE_SCALING_FACTOR": "1.23",
        "HRORTHO.GEOMETRIC_CALIB_FILE_NAME": "calib_file_name",
        "HRORTHO.EXTORI_FILE_NAME": "extori'_file_name",
        "M94_INSTRUMENT.MISSION_PHASE_NAME": "MISSION_PHASE_NAME",
        "HRCONVER.MISSING_FRAMES": "0",
        "DLRTO8.RADIANCE_OFFSET": "1.23",
        "HRCONVER.OVERFLOW_FRAMES": "0",
        "SPACECRAFT_NAME": "MARS EXPRESS",
        "HRFOOT.BEST_GROUND_SAMPLING_DISTANCE": "1.23",
        "M94_ORBIT.START_TIME": "start_time",
        "HRORTHO.DTM_NAME": "dtm_name",
        "DLRTO8.REFLECTANCE_SCALING_FACTOR": "2.34",
        "HRCONVER.ERROR_FRAMES": "1",
    }
    for k, v in expected.items():
        assert meta[k] == v, k


def test_vicar_label_json_shape():
    buf = open(D + "test_vicar_truncated.bin", "rb").read()
    lbl = decode_vicar(buf)[3]["label"]
    assert lbl["LBLSIZE"] == 9680
    assert lbl["FORMAT"] == "BYTE"
    assert lbl["PROPERTY"]["M94_ORBIT"]["ASCENDING_NODE_LONGITUDE"] \
        == 118.46
    assert lbl["PROPERTY"]["M94_ORBIT"]["SPACECRAFT_ORIENTATION"] \
        == [0.0, -1.0, 0.0]
    assert lbl["TASK"]["HRCONVER"]["SPICE_FILE_NAME"] == ["foo"]
    assert lbl["TASK"]["HRORTHO"]["EXTORI_FILE_NAME"] \
        == "extori'_file_name"


def test_vicar_binary_prefix_table():
    t = read_vicar_prefix(
        open(D + "vicar_binary_prefix.vic", "rb").read())
    assert t.to_pydict() == {
        "unsigned_char": [255], "unsigned_short": [65535],
        "unsigned_int": [4294967295], "short": [-32768],
        "int": [-2147483648], "float": [1.25], "double": [3.25]}


def test_vicar_no_prefix_raises():
    with pytest.raises(ValueError):
        read_vicar_prefix(open(D + "vicar_byte.vic", "rb").read())


def test_vicar_read_raster_routing():
    px, gt, nd, meta = read_raster(D + "vicar_byte.vic")
    assert checksum(px) == 129
    assert meta["driver"] == "VICAR"


def test_vicar_label_parse_eol_merge():
    # vicar_byte has EOL=1: the GEN task arrives via the EOL label
    lbl = decode_vicar(open(D + "vicar_byte.vic", "rb").read())[3][
        "label"]
    assert lbl["TASK"]["GEN"]["IVAL"] == 1.0
    assert parse_vicar_label(b"LBLSIZE=20 A=1")["A"] == 1
