"""Spatial join / PiP / kNN vs brute-force in-memory oracles
(the oracle implements ogrlayer.cpp:4005-4072 semantics directly)."""

import numpy as np
import pandas as pd
import pytest

from gdal_ray.core import geom, wkb
from gdal_ray.sources import geo
from gdal_ray.sources.vector import make_polygon, points_table, polygons_table


@pytest.fixture(scope="module")
def images_geo(ray_session):
    from gdal_ray.sources.images import images_dataset
    from gdal_ray.stages.georef import with_georef
    return images_dataset(120).map_batches(with_georef, batch_format="pyarrow").materialize()


def brute_force_pairs(img_df, n_polys):
    pairs = set()
    for _, r in img_df.iterrows():
        box = wkb.box(r["minx"], r["miny"], r["maxx"], r["maxy"])
        for j in range(n_polys):
            g = make_polygon(j)
            if geom.intersects(box, g):
                pairs.add((r["image_id"], j))
    return pairs


class TestSpatialJoin:
    @pytest.mark.parametrize("zoom", [5, 7])
    def test_vs_bruteforce(self, ray_session, images_geo, zoom):
        from gdal_ray.stages.join import spatial_join
        from gdal_ray.sources.vector import polygons_dataset
        res = spatial_join(images_geo, polygons_dataset(40), zoom=zoom).to_pandas()
        got = set(zip(res["image_id"], res["fid"]))
        img_df = images_geo.select_columns(
            ["image_id", "minx", "miny", "maxx", "maxy"]).to_pandas()
        expect = brute_force_pairs(img_df, 40)
        assert got == expect
        # no duplicate pairs (PBSM reference-point dedup works)
        assert len(res) == len(got)


class TestPiPJoin:
    def test_inner_vs_bruteforce(self, ray_session):
        from gdal_ray.stages.join import pip_join
        from gdal_ray.sources.vector import points_dataset, polygons_dataset
        res = pip_join(points_dataset(200), polygons_dataset(30), zoom=6).to_pandas()
        got = set(zip(res["pt_fid"].astype(int), res["fid"].astype(int)))

        pts = points_table(200).to_pandas()
        expect = set()
        for j in range(30):
            g = make_polygon(j)
            inside = geom.points_in_polygon(pts["x"].to_numpy(), pts["y"].to_numpy(), g)
            for i in np.nonzero(inside)[0]:
                expect.add((int(pts.iloc[i]["fid"]), j))
        assert got == expect

    def test_semi_anti_partition(self, ray_session):
        from gdal_ray.stages.join import pip_join
        from gdal_ray.sources.vector import points_dataset, polygons_dataset
        semi = pip_join(points_dataset(150), polygons_dataset(25), zoom=6,
                        emit="semi").to_pandas()
        anti = pip_join(points_dataset(150), polygons_dataset(25), zoom=6,
                        emit="anti").to_pandas()
        s = set(semi["pt_fid"].astype(int))
        a = set(anti["pt_fid"].astype(int))
        assert s.isdisjoint(a)
        assert s | a == set(range(150))


class TestBroadcastFilter:
    def test_filter_rect(self, ray_session):
        from gdal_ray.stages.join import broadcast_spatial_filter
        from gdal_ray.sources.vector import points_dataset
        g = wkb.box(geo.METRO_X0, geo.METRO_Y0,
                    geo.METRO_X0 + geo.METRO_W, geo.METRO_Y0 + geo.METRO_W)
        res = broadcast_spatial_filter(points_dataset(200), wkb.dumps(g)).to_pandas()
        pts = points_table(200).to_pandas()
        inmask = ((pts.x >= geo.METRO_X0) & (pts.x <= geo.METRO_X0 + geo.METRO_W)
                  & (pts.y >= geo.METRO_Y0) & (pts.y <= geo.METRO_Y0 + geo.METRO_W))
        assert set(res["fid"]) == set(pts[inmask]["fid"])


class TestKnn:
    def test_knn_vs_bruteforce(self, ray_session):
        from gdal_ray.stages.join import knn_join
        from gdal_ray.sources.vector import points_dataset

        # dense cluster only → halo assumption holds at coarse zoom
        pts = points_table(300).to_pandas()
        cluster = pts[pts.fid % 5 == 2].reset_index(drop=True)
        import ray.data as rd
        import pyarrow as pa
        data = rd.from_arrow(pa.Table.from_pandas(cluster[["fid", "x", "y"]]))
        qs = cluster[["fid", "x", "y"]].head(10)
        queries = rd.from_arrow(pa.Table.from_pandas(qs))
        res = knn_join(data, queries, k=3, zoom=6).to_pandas()
        for qid in qs["fid"]:
            qrow = qs[qs.fid == qid].iloc[0]
            d = np.sqrt((cluster.x - qrow.x) ** 2 + (cluster.y - qrow.y) ** 2)
            expect = set(cluster.loc[np.argsort(d.to_numpy())[:3], "fid"])
            got = set(res[res.qid == qid]["fid"].astype(int))
            assert got == expect, qid
