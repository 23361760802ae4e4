"""VRT virtual-raster reader — golden parity with the reference's own
gcore/data VRT matrix (autotest/gcore/vrt_read.py:45-75)."""

import numpy as np
import pytest

from gdal_ray.core.checksum import checksum
from gdal_ray.sources.vrt import read_vrt

D = "/root/reference/autotest/gcore/data/"

GOLDENS = [
    ("byte.vrt", 4672), ("int16.vrt", 4672), ("uint16.vrt", 4672),
    ("int32.vrt", 4672), ("uint32.vrt", 4672), ("float32.vrt", 4672),
    ("float64.vrt", 4672),
    ("cint16.vrt", 5028), ("cint32.vrt", 5028),
    ("cfloat32.vrt", 5028), ("cfloat64.vrt", 5028),
    ("msubwinbyte.vrt", 2699),            # multi-window mosaic
    ("utmsmall.vrt", 50054),
    ("byte_nearest_50pct.vrt", 1192),     # nearest downsample
    ("byte_averaged_50pct.vrt", 1152),    # box-average downsample
    ("byte_nearest_200pct.vrt", 18784),
    ("byte_averaged_200pct.vrt", 18784),  # avg upsample == nearest
]


@pytest.mark.parametrize("fname,cs", GOLDENS,
                         ids=[g[0].split(".")[0] for g in GOLDENS])
def test_vrt_open_golden(fname, cs):
    v = read_vrt(D + fname)
    px = v.pixels if v.pixels.ndim == 2 else v.pixels[:, :, 0]
    assert checksum(px) == cs


def test_header_fields():
    v = read_vrt(D + "byte.vrt")
    assert v.geotransform == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert "NAD27 / UTM zone 11N" in v.crs
    assert v.nodata == 107.0               # byte.vrt NodataValue
    assert v.metadata.get("test") == "testvalue"


def test_dtypes_preserved():
    assert read_vrt(D + "int16.vrt").pixels.dtype == np.int16
    assert read_vrt(D + "float64.vrt").pixels.dtype == np.float64
    assert read_vrt(D + "cint16.vrt").pixels.dtype == np.complex64


def test_multiband_multiwindow():
    v = read_vrt(D + "msubwinbyte.vrt")
    assert v.pixels.shape == (50, 50, 3)
    # sources paste into sub-windows: the pasted regions are non-zero,
    # everything outside them stays initialized to zero
    b0 = v.pixels[:, :, 0]
    assert b0[:20, :].sum() == 0            # above both DstRects
    assert b0[20:32, 20:30].sum() > 0       # first pasted window


def test_bad_input(tmp_path):
    p = tmp_path / "x.vrt"
    p.write_text("<NotVrt/>")
    with pytest.raises(ValueError, match="VRTDataset"):
        read_vrt(str(p))


class TestBuildVrt:
    """gdalbuildvrt analog: mosaic roundtrip through read_vrt."""

    def test_quadrant_mosaic_roundtrip(self, tmp_path):
        from gdal_ray.codecs.gtiff import encode_gtiff
        from gdal_ray.sources.vrt import build_vrt
        rng = np.random.default_rng(4)
        full = rng.integers(0, 255, (40, 60)).astype(np.uint8)
        paths = []
        for qy in range(2):
            for qx in range(2):
                sub = full[qy * 20:(qy + 1) * 20, qx * 30:(qx + 1) * 30]
                gt = (100 + qx * 30 * 2.0, 2.0, 0.0,
                      500 - qy * 20 * 2.0, 0.0, -2.0)
                p = str(tmp_path / f"q{qy}{qx}.tif")
                open(p, "wb").write(
                    encode_gtiff(sub, geotransform=gt, compress="none"))
                paths.append(p)
        vp = str(tmp_path / "mosaic.vrt")
        build_vrt(paths, vp)
        v = read_vrt(vp)
        assert np.array_equal(v.pixels, full)
        assert v.geotransform == (100.0, 2.0, 0.0, 500.0, 0.0, -2.0)

    def test_mixed_resolution(self, tmp_path):
        from gdal_ray.codecs.gtiff import encode_gtiff
        from gdal_ray.sources.vrt import build_vrt
        a = np.full((10, 10), 50, np.uint8)      # 2 m/px
        b = np.full((5, 5), 200, np.uint8)       # 4 m/px, to the east
        open(str(tmp_path / "a.tif"), "wb").write(
            encode_gtiff(a, geotransform=(0, 2, 0, 20, 0, -2),
                         compress="none"))
        open(str(tmp_path / "b.tif"), "wb").write(
            encode_gtiff(b, geotransform=(20, 4, 0, 20, 0, -4),
                         compress="none"))
        vp = str(tmp_path / "m.vrt")
        build_vrt([str(tmp_path / "a.tif"), str(tmp_path / "b.tif")], vp)
        v = read_vrt(vp)
        # finest resolution (2 m) over the union: 20x40 at 2m
        assert v.pixels.shape == (10, 20)
        assert (v.pixels[:, :10] == 50).all()
        assert (v.pixels[:5 * 2, 10:] == 200).all()

    def test_rotated_rejected(self, tmp_path):
        # rotation arrives via a world file (GeoTIFF PixelScale can't
        # carry it); build_vrt must refuse rotated sources
        from gdal_ray.codecs.png import encode
        from gdal_ray.sources.vrt import build_vrt
        p = str(tmp_path / "r.png")
        open(p, "wb").write(encode(np.zeros((4, 4), np.uint8)))
        (tmp_path / "r.pgw").write_text("1\n0.1\n0.1\n-1\n0.5\n3.5\n")
        with pytest.raises(ValueError, match="rotated"):
            build_vrt([p])

    def test_ungeoreferenced_rejected(self, tmp_path):
        from gdal_ray.codecs.png import encode
        from gdal_ray.sources.vrt import build_vrt
        p = str(tmp_path / "n.png")
        open(p, "wb").write(encode(np.zeros((4, 4), np.uint8)))
        with pytest.raises(ValueError, match="no geotransform"):
            build_vrt([p])
