"""GDAL Raster Tile Index (GTI) reader tests.

Fixture parity vs reference autotest/gdrivers/data/gti/tile-001.gti.gpkg
(the reference's test_gti_tile_001 asserts every band is uniformly 1000
inside the tile extents) plus synthetic-index semantics from
autotest/gdrivers/gti.py: grid origin = (layer MinX, layer MaxY),
resolution from the first tile unless RESX/RESY metadata overrides,
SORT_FIELD ascending with the LAST source painted on top.
"""

import os
import sqlite3

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import wkb
from gdal_ray.sources.gpkg import write_gpkg
from gdal_ray.sources.gti import decode_gti
from gdal_ray.sources.raster import read_raster

REF = "/root/reference/autotest/gdrivers/data/gti"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference absent")
def test_gti_reference_fixture():
    px, gt, nodata, meta = decode_gti(os.path.join(REF, "tile-001.gti.gpkg"))
    assert px.shape == (512, 256, 3)
    assert px.dtype == np.uint16
    # every covered pixel is 1000 in all three bands
    # (reference test_gti_tile_001: ComputeRasterMinMax == (1000, 1000))
    vals = np.unique(px)
    assert set(vals.tolist()) <= {0, 1000}
    assert (px == 1000).any()
    assert meta["n_tiles"] == 2
    assert gt[1] == pytest.approx(0.022996972672)
    assert gt[5] == pytest.approx(-0.022996972672)


def test_gti_reference_fixture_via_dispatcher():
    if not os.path.exists(REF):
        pytest.skip("reference absent")
    px, gt, nodata, meta = read_raster(os.path.join(REF, "tile-001.gti.gpkg"))
    assert px.shape == (512, 256, 3)
    assert meta["driver"] == "GTI"


def _write_tile(path, value, gt, shape=(4, 4), nodata=None):
    from gdal_ray.codecs.gtiff import encode_gtiff
    px = np.full(shape, value, np.uint8)
    with open(path, "wb") as f:
        f.write(encode_gtiff(px, geotransform=gt, nodata=nodata,
                             tile_size=16, compress="none"))


def _build_index(idx_path, rows, md_items=None):
    """rows: list of (location, minx, miny, maxx, maxy[, sortval])."""
    cols = {"location": [r[0] for r in rows],
            "wkb": [wkb.dumps(wkb.box(r[1], r[2], r[3], r[4]))
                    for r in rows]}
    if len(rows[0]) > 5:
        cols["z_order"] = [r[5] for r in rows]
    write_gpkg(pa.Table.from_pydict(cols), idx_path, layer="index",
               srs_id=4326)
    if md_items:
        payload = "<GDALMultiDomainMetadata><Metadata>" + "".join(
            f'<MDI key="{k}">{v}</MDI>' for k, v in md_items.items()
        ) + "</Metadata></GDALMultiDomainMetadata>"
        con = sqlite3.connect(idx_path)
        con.execute("""CREATE TABLE IF NOT EXISTS gpkg_metadata (
            id INTEGER PRIMARY KEY, md_scope TEXT, md_standard_uri TEXT,
            mime_type TEXT, metadata TEXT)""")
        con.execute("INSERT INTO gpkg_metadata VALUES (1,'dataset','','',?)",
                    (payload,))
        con.commit()
        con.close()


def test_gti_mosaic_two_tiles(tmp_path):
    # two 4x4 tiles side by side, unit resolution
    _write_tile(tmp_path / "a.tif", 10, (0, 1, 0, 4, 0, -1))
    _write_tile(tmp_path / "b.tif", 20, (4, 1, 0, 4, 0, -1))
    idx = str(tmp_path / "index.gti.gpkg")
    _build_index(idx, [("a.tif", 0, 0, 4, 4), ("b.tif", 4, 0, 8, 4)])
    px, gt, nodata, meta = decode_gti(idx)
    assert px.shape == (4, 8)
    assert gt == (0.0, 1.0, 0.0, 4.0, 0.0, -1.0)
    assert (px[:, :4] == 10).all() and (px[:, 4:] == 20).all()


def test_gti_sort_field_last_wins(tmp_path):
    # overlapping tiles: ascending sort, later (higher key) painted last
    _write_tile(tmp_path / "lo.tif", 1, (0, 1, 0, 4, 0, -1))
    _write_tile(tmp_path / "hi.tif", 9, (0, 1, 0, 4, 0, -1))
    idx = str(tmp_path / "index.gti.gpkg")
    _build_index(idx, [("hi.tif", 0, 0, 4, 4, 5), ("lo.tif", 0, 0, 4, 4, 1)],
                 {"SORT_FIELD": "z_order"})
    px, *_ = decode_gti(idx)
    assert (px == 9).all()
    # descending: lo painted last
    _build_index(idx, [("hi.tif", 0, 0, 4, 4, 5), ("lo.tif", 0, 0, 4, 4, 1)],
                 {"SORT_FIELD": "z_order", "SORT_FIELD_ASC": "NO"})
    px, *_ = decode_gti(idx)
    assert (px == 1).all()


def test_gti_metadata_overrides(tmp_path):
    _write_tile(tmp_path / "a.tif", 7, (0, 1, 0, 4, 0, -1))
    idx = str(tmp_path / "index.gti.gpkg")
    _build_index(idx, [("a.tif", 0, 0, 4, 4)],
                 {"RESX": "2", "RESY": "2", "NODATA": "255",
                  "DATA_TYPE": "UInt16"})
    px, gt, nodata, meta = decode_gti(idx)
    assert px.shape == (2, 2)
    assert gt == (0.0, 2.0, 0.0, 4.0, 0.0, -2.0)
    assert nodata == 255.0
    assert px.dtype == np.uint16
    assert (px == 7).all()


def test_gti_nodata_not_painted(tmp_path):
    # tile with nodata=0 over an existing tile must not punch holes
    _write_tile(tmp_path / "base.tif", 5, (0, 1, 0, 4, 0, -1))
    half = np.zeros((4, 4), np.uint8)
    half[:, :2] = 200
    from gdal_ray.codecs.gtiff import encode_gtiff
    with open(tmp_path / "top.tif", "wb") as f:
        f.write(encode_gtiff(half, geotransform=(0, 1, 0, 4, 0, -1),
                             nodata=0, tile_size=16, compress="none"))
    idx = str(tmp_path / "index.gti.gpkg")
    _build_index(idx, [("base.tif", 0, 0, 4, 4, 1), ("top.tif", 0, 0, 4, 4, 2)],
                 {"SORT_FIELD": "z_order"})
    px, *_ = decode_gti(idx)
    assert (px[:, :2] == 200).all()
    assert (px[:, 2:] == 5).all()      # nodata pixels did not overwrite
