"""MBTiles sink/source: spec compliance + exact roundtrip."""
import os
import sqlite3

import pytest

from gdal_ray.pipelines.tiles import tile_pyramid
from gdal_ray.sources.mbtiles import (read_mbtiles, read_mbtiles_metadata,
                                      write_mbtiles)


@pytest.fixture(scope="module")
def pyramid():
    return tile_pyramid(24, zoom=6, min_z=5)


def test_roundtrip_exact(pyramid, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mb") / "t.mbtiles")
    counts = write_mbtiles(pyramid, path, name="test", bounds=(-10, -10,
                                                              10, 10))
    want = {z: ds.count() for z, ds in pyramid.items()}
    assert counts == want

    back = read_mbtiles(path)
    got = {}
    orig = {}
    for z, ds in pyramid.items():
        for r in ds.select_columns(["z", "x", "y", "png"]).take_all():
            orig[(r["z"], r["x"], r["y"])] = r["png"]
    for r in back.take_all():
        got[(r["z"], r["x"], r["y"])] = r["png"]
    assert got == orig  # byte-exact blobs, XYZ coords preserved


def test_tms_row_flip_on_disk(pyramid, tmp_path_factory):
    """Spec: tile_row is TMS (south-origin). Verify raw rows differ from
    XYZ y exactly by 2^z - 1 - y."""
    path = str(tmp_path_factory.mktemp("mb") / "t2.mbtiles")
    write_mbtiles(pyramid, path)
    con = sqlite3.connect(path)
    raw = {(z, x): r for z, x, r in con.execute(
        "SELECT zoom_level, tile_column, tile_row FROM tiles")}
    con.close()
    seen = 0
    for z, ds in pyramid.items():
        for r in ds.select_columns(["z", "x", "y"]).take(5):
            key = (r["z"], r["x"])
            if key in raw:
                assert raw[key] in {(1 << r["z"]) - 1 - yy for yy in
                                    range(1 << r["z"])}
                seen += 1
    assert seen > 0
    # strict per-tile check on one level
    z0 = min(pyramid)
    rows = {(r["z"], r["x"], r["y"]) for r in
            pyramid[z0].select_columns(["z", "x", "y"]).take_all()}
    con = sqlite3.connect(path)
    disk = {(z, x, (1 << z) - 1 - tr) for z, x, tr in con.execute(
        "SELECT zoom_level, tile_column, tile_row FROM tiles "
        "WHERE zoom_level = ?", (z0,))}
    con.close()
    assert disk == rows


def test_metadata_required_keys(pyramid, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mb") / "t3.mbtiles")
    write_mbtiles(pyramid, path, name="meta-test", fmt="png",
                  bounds=(-1.5, -2.5, 3.5, 4.5))
    m = read_mbtiles_metadata(path)
    assert m["name"] == "meta-test"
    assert m["format"] == "png"
    assert m["minzoom"] == "5" and m["maxzoom"] == "6"
    assert m["bounds"].startswith("-1.5")


def test_zoom_pruned_read(pyramid, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mb") / "t4.mbtiles")
    write_mbtiles(pyramid, path)
    only6 = read_mbtiles(path, zooms=[6])
    assert only6.count() == pyramid[6].count()
    zs = {r["z"] for r in only6.select_columns(["z"]).take_all()}
    assert zs == {6}


def test_overwrite_is_idempotent(pyramid, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mb") / "t5.mbtiles")
    write_mbtiles(pyramid, path)
    counts = write_mbtiles(pyramid, path)  # second write, same file
    assert counts == {z: ds.count() for z, ds in pyramid.items()}
    assert read_mbtiles(path).count() == sum(counts.values())
