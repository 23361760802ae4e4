"""Regression tests for the round-2 advisory findings (ADVICE.md):
shapefile MultiPoint write, DBF numeric overflow, GPKG GPB flag bits,
GeoTIFF geographic-code classification, zonal south-up envelopes."""

import os
import struct
import tempfile

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import wkb as W


class TestShapefileMultiPoint:
    def test_multipoint_roundtrip(self):
        from gdal_ray.sources.shapefile import read_shapefile, write_shapefile
        pts = [(1.5, 2.5), (3.0, -4.0), (5.25, 6.75)]
        t = pa.table({
            "fid": [0, 1],
            "wkb": [W.dumps(W.multipoint(pts)),
                    W.dumps(W.multipoint([(9.0, 9.0)]))],
            "name": ["a", "b"],
        })
        p = os.path.join(tempfile.mkdtemp(dir="/tmp"), "mp.shp")
        write_shapefile(t, p)
        back = read_shapefile(p)
        assert back.num_rows == 2
        g = W.loads(back["wkb"][0].as_py())
        assert g.geom_type == W.MULTIPOINT
        got = [(float(q.coords[0, 0]), float(q.coords[0, 1]))
               for q in g.parts]
        assert got == pts
        assert back["name"].to_pylist() == ["a", "b"]


class TestDBFNumericOverflow:
    def test_wide_float_scientific_fallback(self):
        from gdal_ray.sources.shapefile import read_shapefile, write_shapefile
        big = 3.14159e14          # f"{v:.8f}" would be 24 chars > width 19
        t = pa.table({
            "fid": [0],
            "wkb": [W.dumps(W.point(0.0, 0.0))],
            "val": pa.array([big], pa.float64()),
        })
        p = os.path.join(tempfile.mkdtemp(dir="/tmp"), "wide.shp")
        write_shapefile(t, p)
        back = read_shapefile(p)
        v = back["val"][0].as_py()
        assert v == pytest.approx(big, rel=1e-9)

    def test_wide_int_raises(self):
        from gdal_ray.sources.shapefile import write_shapefile
        t = pa.table({
            "fid": [0],
            "wkb": [W.dumps(W.point(0.0, 0.0))],
            "val": pa.array([10**19], pa.uint64()),   # 20 digits > width 18
        })
        p = os.path.join(tempfile.mkdtemp(dir="/tmp"), "ovf.shp")
        with pytest.raises(ValueError, match="does not fit"):
            write_shapefile(t, p)


class TestGPBFlags:
    def _gpb(self, flags: int, wkb: bytes = b"") -> bytes:
        return b"GP\x00" + bytes([flags]) + struct.pack("<i", 4326) + wkb

    def test_empty_bit4_returns_none(self):
        from gdal_ray.sources.gpkg import _parse_gpb
        # empty flag is bit 4 (0x10), little-endian bit 0
        assert _parse_gpb(self._gpb(0b00010001)) is None

    def test_extended_bit5_raises(self):
        from gdal_ray.sources.gpkg import _parse_gpb
        with pytest.raises(ValueError, match="extended"):
            _parse_gpb(self._gpb(0b00100001))

    def test_plain_geometry_parses(self):
        from gdal_ray.sources.gpkg import _parse_gpb
        g = _parse_gpb(self._gpb(0b00000001, W.dumps(W.point(3.0, 4.0))))
        assert g.coords[0, 0] == 3.0 and g.coords[0, 1] == 4.0


class TestGeographicEPSG:
    def test_classifier(self):
        from gdal_ray.codecs.gtiff import is_geographic_epsg
        assert is_geographic_epsg(4326)
        assert is_geographic_epsg(4269)       # NAD83
        assert is_geographic_epsg(4258)       # ETRS89
        assert not is_geographic_epsg(3857)
        assert not is_geographic_epsg(32631)
        assert not is_geographic_epsg(4087)   # World Equidistant Cyl (proj)

    def test_gtiff_writes_geographic_key_for_nad83(self):
        from gdal_ray.codecs.gtiff import decode_gtiff, encode_gtiff
        px = np.zeros((8, 8), np.uint8)
        buf = encode_gtiff(px, geotransform=(0, 1, 0, 8, 0, -1),
                           crs="EPSG:4269")
        tif = decode_gtiff(buf)
        assert tif.crs == "EPSG:4269"


class TestZonalSouthUp:
    def test_crop_envelope_valid_for_south_up(self):
        from gdal_ray.codecs import encode
        from gdal_ray.stages.zonal import crop_images_to_cells

        px = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64)
        res = 2 * 20037508.342789244 / (1 << 8) / 256    # z8 pixel size
        # south-up: gt5 > 0, origin at the BOTTOM edge
        gt = (-res * 40, res, 0.0, -res * 32, 0.0, res)
        batch = pa.table({
            "image_id": ["img0"],
            "bytes": [encode(px, "png")],
            "fmt": ["png"],
            "w": pa.array([64], pa.int32()),
            "h": pa.array([64], pa.int32()),
            "gt0": [gt[0]], "gt1": [gt[1]], "gt2": [gt[2]],
            "gt3": [gt[3]], "gt4": [gt[4]], "gt5": [gt[5]],
        })
        out = crop_images_to_cells(batch, zoom=8)
        assert out.num_rows >= 1
        minx = np.asarray(out["minx"])
        maxx = np.asarray(out["maxx"])
        miny = np.asarray(out["miny"])
        maxy = np.asarray(out["maxy"])
        assert np.all(minx < maxx)
        assert np.all(miny < maxy)
