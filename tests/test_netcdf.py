"""netCDF classic (CDF-1/2/5) driver — golden parity with the
reference's own fixtures (autotest/gdrivers/netcdf.py)."""

import numpy as np
import pytest

from gdal_ray.codecs.netcdf import decode_netcdf, encode_netcdf, parse_netcdf
from gdal_ray.core.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/netcdf/"


def _read(name):
    with open(D + name, "rb") as f:
        return f.read()


def test_byte_nc_golden():
    # byte.nc carries the byte.tif raster: checksum 4672
    # (netcdf.py:3067 via its CDL twin) + the GeoTransform attribute
    px, gt, nodata, meta = decode_netcdf(_read("byte.nc"))
    assert px.dtype == np.uint8 and px.shape == (20, 20)
    assert checksum(px) == 4672
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert "NAD27 / UTM zone 11N" in meta["spatial_ref"]
    assert meta["bottom_up"] is True


def test_int16_nogeo_bottomup_default():
    # no geo info at all -> GDAL_NETCDF_BOTTOMUP=YES default flips the
    # rows: 4672 flipped vs 4855 raw (netcdf.py:1051,1074)
    px, gt, _, _ = decode_netcdf(_read("int16-nogeo.nc"))
    assert px.dtype == np.int16
    assert checksum(px) == 4672
    assert checksum(px[::-1]) == 4855


def test_trmm_nan_golden():
    # NaN samples are sanitized to the declared _FillValue
    # (netcdfdataset.cpp CheckData; netcdf.py:1220 -> 62519)
    px, _, nodata, _ = decode_netcdf(_read("trmm-nan.nc"))
    assert px.dtype == np.float32 and px.shape == (40, 40)
    assert not np.isnan(px).any()
    assert nodata == pytest.approx(-9999.9, abs=1e-3)
    assert checksum(px) == 62519


def test_unittype_units_attr():
    hdr = parse_netcdf(_read("unittype.nc"))
    z = [v for v in hdr["vars"] if v["name"] == "z"][0]
    assert z["atts"]["units"] == "m/s"   # netcdf.py:2486-2494
    px, _, _, _ = decode_netcdf(_read("unittype.nc"))
    assert px.shape == (2, 2)


def test_record_variable():
    # pcp in trmm-nan.nc is a record var over an unlimited time dim
    hdr = parse_netcdf(_read("trmm-nan.nc"))
    pcp = [v for v in hdr["vars"] if v["name"] == "pcp"][0]
    assert any(size == 0 for _, size in pcp["dims"])
    assert hdr["numrecs"] == 1


@pytest.mark.parametrize("dtype", ["uint8", "int8", "int16", "int32",
                                   "float32", "float64", "uint16",
                                   "uint32", "int64", "uint64"])
def test_roundtrip_dtypes(dtype):
    rng = np.random.default_rng(3)
    a = (rng.random((13, 17)) * 100).astype(dtype)
    gt = (5.0, 2.0, 0.0, 100.0, 0.0, -3.0)
    buf = encode_netcdf(a, gt, crs="EPSG:32611", nodata=7.0)
    # unsigned / 64-bit dtypes need CDF-5; the rest stay CDF-1
    assert buf[3] == (5 if dtype in ("uint16", "uint32", "int64",
                                     "uint64") else 1)
    px, gt2, nodata, meta = decode_netcdf(buf)
    assert np.array_equal(px, a) and px.dtype == a.dtype
    assert gt2 == gt
    assert nodata == 7.0
    assert meta["spatial_ref"] == "EPSG:32611"


def test_roundtrip_multiband_and_topdown():
    a = (np.random.default_rng(4).random((9, 11, 3)) * 255).astype(np.uint8)
    px, gt, _, _ = decode_netcdf(encode_netcdf(a, (0, 1, 0, 9, 0, -1)))
    assert np.array_equal(px, a)
    # top-down storage (WRITE_BOTTOMUP=NO analog) decodes identically
    b2 = encode_netcdf(a[:, :, 0], (0, 1, 0, 9, 0, -1), bottom_up=False)
    px2, _, _, meta2 = decode_netcdf(b2)
    assert np.array_equal(px2, a[:, :, 0])
    assert "bottom_up" not in meta2


def test_codec_registry_sniffer():
    from gdal_ray.codecs import decode as registry_decode
    a = (np.random.default_rng(5).random((6, 8)) * 200).astype(np.uint8)
    buf = encode_netcdf(a, (0, 1, 0, 6, 0, -1))
    assert np.array_equal(registry_decode(buf), a)          # magic sniff
    assert np.array_equal(registry_decode(buf, "netcdf"), a)


def test_hdf5_superblock_at_offset_1024():
    # user-block files put the superblock at 512*2^n; addresses are
    # relative to it (reference fixture decodes byte.tif's 4672)
    from gdal_ray.codecs.netcdf import decode_netcdf
    from gdal_ray.core.checksum import checksum
    px, gt, nd, meta = decode_netcdf(open(
        "/root/reference/autotest/gdrivers/data/netcdf/"
        "byte_hdf5_starting_at_offset_1024.nc", "rb").read())
    assert checksum(px) == 4672


def test_non_numeric_missing_value_tolerated():
    from gdal_ray.codecs.netcdf import decode_netcdf
    px, gt, nd, meta = decode_netcdf(open(
        "/root/reference/autotest/gdrivers/data/netcdf/"
        "missing_value_text_non_numeric.nc", "rb").read())
    assert nd is None
