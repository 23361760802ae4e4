"""GeoPackage raster tiles (sources/gpkg.py) — reference-fixture
goldens (autotest/gdrivers/gpkg.py expectations) and pyramid
roundtrip."""

import os

import numpy as np
import pytest

from gdal_ray.core.checksum import checksum, checksum_multiband
from gdal_ray.sources.gpkg import (list_tile_tables, read_gpkg_raster,
                                   read_gpkg_tiles, write_gpkg_tiles)

D = "/root/reference/autotest/gdrivers/data/gpkg"


class TestGoldens:
    def test_byte_gpkg(self):
        """byte.gpkg: one 256x256 gray+alpha PNG tile, 20x20 content
        window at the matrix origin → band-1 checksum 4672 with
        byte.tif's UTM geotransform (gpkg.py gdaltest 'byte' rows)."""
        px, gt, nd, meta = read_gpkg_raster(f"{D}/byte.gpkg")
        assert px.shape[:2] == (20, 20)
        assert checksum_multiband(px)[0] == 4672
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert meta["srs_id"] == 26711
        assert "NAD27" in meta.get("crs", "")

    def test_old_elevation_extension(self):
        """uint16-old-elevation-extension.gpkg: 2d-gridded-coverage,
        16-bit PNG tile, integer datatype → checksum 4672
        (test_gpkg_open_old_gpkg_elevation_tiles_extension)."""
        px, gt, nd, meta = read_gpkg_raster(
            f"{D}/uint16-old-elevation-extension.gpkg")
        assert px.dtype == np.uint16
        assert int(checksum(px)) == 4672
        assert meta["data_type"] == "2d-gridded-coverage"

    def test_raster_and_vector_coexist(self):
        """raster_and_vector.gpkg: the tile table reads alongside the
        feature table (band-1 checksum 4672 again)."""
        assert list_tile_tables(f"{D}/raster_and_vector.gpkg")
        px, *_ = read_gpkg_raster(f"{D}/raster_and_vector.gpkg")
        assert checksum_multiband(px)[0] == 4672

    def test_read_raster_dispatch(self):
        from gdal_ray.sources.raster import read_raster
        px, gt, nd, meta = read_raster(f"{D}/byte.gpkg")
        assert checksum_multiband(np.asarray(px))[0] == 4672


class TestPyramidRoundtrip:
    def test_write_read_tiles(self, ray_session, tmp_path):
        import ray.data as rd
        from gdal_ray.codecs.png import encode as png_encode

        rng = np.random.default_rng(5)
        rows = []
        for (x, y) in [(0, 0), (1, 0), (2, 3)]:
            tile = rng.integers(0, 255, (8, 8), dtype=np.uint8)
            rows.append({"z": 2, "x": x, "y": y,
                         "png": png_encode(tile)})
        ds = rd.from_items(rows)
        path = str(tmp_path / "t.gpkg")
        counts = write_gpkg_tiles({2: ds}, path, table="cover",
                                  tile_size=8)
        assert counts == {2: 3}
        back = read_gpkg_tiles(path).to_pandas()
        assert sorted(zip(back["z"], back["x"], back["y"])) == \
            [(2, 0, 0), (2, 1, 0), (2, 2, 3)]
        # blobs decode back to the written pixels
        from gdal_ray.codecs.png import decode as png_decode
        got = {(int(r.z), int(r.x), int(r.y)):
               np.asarray(png_decode(bytes(r.data)))
               for r in back.itertuples()}
        first = np.asarray(png_decode(bytes(rows[0]["png"])))
        np.testing.assert_array_equal(
            got[(2, 0, 0)].squeeze(), first.squeeze())

    def test_assembled_raster_from_written_pyramid(self, ray_session,
                                                   tmp_path):
        import ray.data as rd
        from gdal_ray.codecs.png import encode as png_encode

        tile = np.arange(64, dtype=np.uint8).reshape(8, 8)
        ds = rd.from_items([{"z": 0, "x": 0, "y": 0,
                             "png": png_encode(tile)}])
        path = str(tmp_path / "w.gpkg")
        write_gpkg_tiles({0: ds}, path, tile_size=8)
        px, gt, nd, meta = read_gpkg_raster(path)
        np.testing.assert_array_equal(np.asarray(px).squeeze(), tile)
        # XYZ z0 pixel size over the web-mercator world
        assert abs(gt[1] - 2 * 20037508.342789244 / 8) < 1e-6
