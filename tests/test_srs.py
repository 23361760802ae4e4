"""General CRS construction (core/srs.py): WKT1/ESRI/WKT2 + proj-string
import parity.

Golden sources: Snyder, "Map Projections — A Working Manual" (USGS PP
1395) numeric examples for tmerc/LCC/Albers/polar on non-WGS84
ellipsoids; the Ordnance Survey's published British National Grid
worked example (Airy 1830); the reference's own .prj fixtures
(autotest/osr/data/lcc_esri.prj, autotest/gdrivers/data/lcp/...,
autotest/ogr/data/shp/...) and WKT2 (autotest/gdrivers/data/gti/
sentinel2_stac_geoparquet_proj_wkt2.geojson); and exact agreement with
the engine's pre-existing registry kernels for EPSG:32631/2154/5070/
3031."""

import json

import numpy as np
import pytest

from gdal_ray.core.srs import (CRS, crs_from, params_from_proj,
                               params_from_wkt)

REF = "/root/reference/autotest"


def dms(d, m, s):
    return d + m / 60.0 + s / 3600.0


class TestSnyderGoldens:
    """Published worked examples, non-WGS84 ellipsoids."""

    def test_tmerc_clarke1866_utm18(self):
        # Snyder p. 269-270: Clarke 1866, lon0=-75, k0=0.9996,
        # phi=40°30'N lam=73°30'W -> x=127,106.5 y=4,484,124.4
        crs = crs_from("+proj=tmerc +lat_0=0 +lon_0=-75 +k=0.9996 "
                       "+x_0=0 +y_0=0 +ellps=clrk66")
        x, y = crs.lonlat_to_xy(-73.5, 40.5)
        assert abs(float(x) - 127106.5) < 0.6
        assert abs(float(y) - 4484124.4) < 0.6
        lon, lat = crs.xy_to_lonlat(x, y)
        assert abs(float(lon) + 73.5) < 1e-9
        assert abs(float(lat) - 40.5) < 1e-9

    def test_lcc_2sp_clarke1866(self):
        # Snyder p. 296-297: phi1=33 phi2=45 phi0=23 lam0=-96,
        # point (35N, 75W) -> x=1,894,410.9 y=1,564,649.5
        crs = crs_from("+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 "
                       "+lon_0=-96 +x_0=0 +y_0=0 +ellps=clrk66")
        x, y = crs.lonlat_to_xy(-75.0, 35.0)
        assert abs(float(x) - 1894410.9) < 1.0
        assert abs(float(y) - 1564649.5) < 1.0
        lon, lat = crs.xy_to_lonlat(x, y)
        assert abs(float(lon) + 75.0) < 1e-8
        assert abs(float(lat) - 35.0) < 1e-8

    def test_albers_clarke1866(self):
        # Snyder p. 292: phi1=29.5 phi2=45.5 phi0=23 lam0=-96,
        # point (35N, 75W) -> x=1,885,472.7 y=1,535,925.0
        crs = crs_from("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 "
                       "+lon_0=-96 +x_0=0 +y_0=0 +ellps=clrk66")
        x, y = crs.lonlat_to_xy(-75.0, 35.0)
        assert abs(float(x) - 1885472.7) < 1.0
        assert abs(float(y) - 1535925.0) < 1.0

    def test_polar_stereographic_international(self):
        # Snyder p. 315: International ellipsoid, std parallel -71,
        # lam0=-100, point (75S, 150E) -> x=-1,540,033.6 y=-560,526.4
        crs = crs_from("+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=-100 "
                       "+x_0=0 +y_0=0 +ellps=intl")
        x, y = crs.lonlat_to_xy(150.0, -75.0)
        assert abs(float(x) + 1540033.6) < 1.0
        assert abs(float(y) + 560526.4) < 1.0


class TestOSGB:
    """Ordnance Survey 'A guide to coordinate systems in Great
    Britain' worked example: Airy 1830, true origin 49N 2W,
    k0=0.9996012717, FE 400000, FN -100000."""

    WKT27700 = (
        'PROJCS["OSGB 1936 / British National Grid",GEOGCS["OSGB 1936",'
        'DATUM["OSGB_1936",SPHEROID["Airy 1830",6377563.396,299.3249646],'
        'TOWGS84[446.448,-125.157,542.06,0.15,0.247,0.842,-20.489]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["latitude_of_origin",49],'
        'PARAMETER["central_meridian",-2],'
        'PARAMETER["scale_factor",0.9996012717],'
        'PARAMETER["false_easting",400000],'
        'PARAMETER["false_northing",-100000],UNIT["metre",1]]')

    def test_worked_example(self):
        crs = crs_from(self.WKT27700)
        lat = dms(52, 39, 27.2531)
        lon = dms(1, 43, 4.5177)
        x, y = crs.lonlat_to_xy(lon, lat)
        assert abs(float(x) - 651409.903) < 0.002
        assert abs(float(y) - 313177.270) < 0.002
        lon2, lat2 = crs.xy_to_lonlat(x, y)
        assert abs(float(lon2) - lon) < 1e-9
        assert abs(float(lat2) - lat) < 1e-9

    def test_towgs84_magnitude_and_roundtrip(self):
        crs = crs_from(self.WKT27700)
        lon_w, lat_w = crs.lonlat_to_wgs84(-2.0, 52.0)
        # OSGB36→WGS84 moves points ~50-150 m in the UK
        from gdal_ray.core.geodesic import geodesic_distance
        d = geodesic_distance(-2.0, 52.0, float(lon_w), float(lat_w))
        assert 50.0 < float(d) < 200.0
        lon_b, lat_b = crs.wgs84_to_lonlat(lon_w, lat_w)
        # mm-level round-trip (the Helmert tier itself is ~1 m)
        assert abs(float(lon_b) + 2.0) < 1e-7
        assert abs(float(lat_b) - 52.0) < 1e-7

    def test_epsg_27700_builtin(self):
        a = crs_from("EPSG:27700")
        b = crs_from(self.WKT27700)
        x1, y1 = a.lonlat_to_xy(-1.0, 51.0)
        x2, y2 = b.lonlat_to_xy(-1.0, 51.0)
        assert abs(float(x1) - float(x2)) < 1e-6
        assert abs(float(y1) - float(y2)) < 1e-6


class TestReferenceFixtures:
    """Parse the reference's own WKT fixtures — ≥5 non-registry CRS."""

    def test_esri_lcc_north_carolina(self):
        wkt = open(f"{REF}/osr/data/lcc_esri.prj").read()
        p = params_from_wkt(wkt)
        assert p["kind"] == "lcc"
        assert p["a"] == 6378137.0 and abs(p["rf"] - 298.257222101) < 1e-9
        assert p["lon_0"] == -79.0 and p["lat_0"] == 33.75
        assert abs(p["lat_1"] - 36.1666666666667) < 1e-12
        assert abs(p["lat_2"] - 34.3333333333333) < 1e-12
        assert p["x_0"] == 609601.22 and p["y_0"] == 0.0
        crs = CRS(p)
        # round-trip through the kernel
        x, y = crs.lonlat_to_xy(-80.0, 35.0)
        lon, lat = crs.xy_to_lonlat(x, y)
        assert abs(float(lon) + 80.0) < 1e-9
        assert abs(float(lat) - 35.0) < 1e-9

    def test_esri_utm_nad83(self):
        wkt = open(f"{REF}/gdrivers/data/lcp/test_FARSITE_UTM12.prj").read()
        p = params_from_wkt(wkt)
        assert p["kind"] == "tmerc"
        assert p["lon_0"] == -111.0 and p["k_0"] == 0.9996
        assert p["x_0"] == 500000.0
        crs = CRS(p)
        # NAD83 GRS80 UTM: at the central meridian, E = 500000
        x, _ = crs.lonlat_to_xy(-111.0, 40.0)
        assert abs(float(x) - 500000.0) < 1e-6

    def test_esri_texas_state_plane_feet(self):
        wkt = open(f"{REF}/ogr/data/shp/Stacks.prj").read()
        p = params_from_wkt(wkt)
        assert p["kind"] == "lcc"
        assert abs(p["to_meter"] - 0.30480060960121924) < 1e-15
        crs = CRS(p)
        x, y = crs.lonlat_to_xy(-99.0, 28.0)
        # on the central meridian: x == false easting, IN FEET
        assert abs(float(x) - 1968500.0) < 1e-6
        lon, lat = crs.xy_to_lonlat(x, y)
        assert abs(float(lat) - 28.0) < 1e-9

    def test_esri_utm_nad27_clarke1866(self):
        wkt = open(f"{REF}/gdrivers/data/ehdr/float32.prj").read()
        p = params_from_wkt(wkt)
        assert p["kind"] == "tmerc"
        assert p["a"] == 6378206.4
        assert abs(p["rf"] - 294.9786982138982) < 1e-9
        crs = CRS(p)
        # Clarke 1866 differs from WGS84: same point, different N
        wgs = crs_from("+proj=utm +zone=11 +ellps=WGS84")
        _, y_c = crs.lonlat_to_xy(-118.0, 36.0)
        _, y_w = wgs.lonlat_to_xy(-118.0, 36.0)
        assert abs(float(y_c) - float(y_w)) > 50.0

    def test_esri_british_national_grid(self):
        wkt = open(f"{REF}/ogr/data/shp/poly_golden/poly.prj").read()
        p = params_from_wkt(wkt)
        assert p["kind"] == "tmerc"
        assert p["a"] == 6377563.396
        assert p["k_0"] == 0.9996012717
        assert p["y_0"] == -100000.0
        crs = CRS(p)
        lat = dms(52, 39, 27.2531)
        lon = dms(1, 43, 4.5177)
        x, y = crs.lonlat_to_xy(lon, lat)
        assert abs(float(x) - 651409.903) < 0.002
        assert abs(float(y) - 313177.270) < 0.002

    def test_geogcs_fixture(self):
        wkt = open(f"{REF}/ogr/data/shp/"
                   "cb_2022_us_county_20m_extract.prj").read()
        p = params_from_wkt(wkt)
        assert p["geographic"] and p["kind"] == "longlat"
        assert p["a"] == 6378137.0

    def test_wkt2_utm12(self):
        d = json.load(open(f"{REF}/gdrivers/data/gti/"
                           "sentinel2_stac_geoparquet_proj_wkt2.geojson"))
        s = json.dumps(d)
        i = s.find("PROJCRS")
        # pull the embedded WKT2 string back out of the JSON encoding
        wkt = json.loads(s[s.rindex('"', 0, i):s.index('"}', i) + 1])
        p = params_from_wkt(wkt)
        assert p["kind"] == "tmerc"
        assert p["lon_0"] == -111.0 and p["k_0"] == 0.9996
        assert p["x_0"] == 500000.0 and p["a"] == 6378137.0
        crs = CRS(p)
        ref = crs_from("+proj=utm +zone=12 +ellps=WGS84")
        x1, y1 = crs.lonlat_to_xy(-112.0, 35.0)
        x2, y2 = ref.lonlat_to_xy(-112.0, 35.0)
        assert abs(float(x1) - float(x2)) < 1e-6
        assert abs(float(y1) - float(y2)) < 1e-6


class TestRegistryParity:
    """WKT-constructed CRS must agree with the engine's pre-existing
    registry kernels bit-for-bit (same formulas, same parameters)."""

    def test_utm31_wkt_vs_registry(self):
        from gdal_ray.core.tmerc import lonlat_to_tmerc
        crs = crs_from(
            'PROJCS["WGS 84 / UTM zone 31N",GEOGCS["WGS 84",'
            'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],'
            'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
            'PROJECTION["Transverse_Mercator"],'
            'PARAMETER["latitude_of_origin",0],'
            'PARAMETER["central_meridian",3],'
            'PARAMETER["scale_factor",0.9996],'
            'PARAMETER["false_easting",500000],'
            'PARAMETER["false_northing",0],UNIT["metre",1]]')
        lon = np.array([2.0, 3.5, 4.9])
        lat = np.array([43.0, 48.5, 59.9])
        xw, yw = crs.lonlat_to_xy(lon, lat)
        xr, yr = lonlat_to_tmerc(lon, lat, 3.0)
        np.testing.assert_allclose(xw, xr, atol=1e-9)
        np.testing.assert_allclose(yw, yr, atol=1e-9)

    def test_lambert93_wkt_vs_registry(self):
        from gdal_ray.core.conic import projection_for
        crs = crs_from(
            'PROJCS["RGF93 / Lambert-93",GEOGCS["RGF93",'
            'DATUM["Reseau_Geodesique_Francais_1993",'
            'SPHEROID["GRS 1980",6378137,298.257222101]],'
            'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
            'PROJECTION["Lambert_Conformal_Conic_2SP"],'
            'PARAMETER["standard_parallel_1",49],'
            'PARAMETER["standard_parallel_2",44],'
            'PARAMETER["latitude_of_origin",46.5],'
            'PARAMETER["central_meridian",3],'
            'PARAMETER["false_easting",700000],'
            'PARAMETER["false_northing",6600000],UNIT["metre",1]]')
        reg = projection_for("EPSG:2154")
        xw, yw = crs.lonlat_to_xy(2.35, 48.85)
        xr, yr = reg.forward(2.35, 48.85)
        assert abs(float(xw) - float(xr)) < 1e-9
        assert abs(float(yw) - float(yr)) < 1e-9

    def test_antarctic_polar_wkt_vs_registry(self):
        from gdal_ray.core.conic import projection_for
        crs = crs_from(
            'PROJCS["WGS 84 / Antarctic Polar Stereographic",'
            'GEOGCS["WGS 84",DATUM["WGS_1984",'
            'SPHEROID["WGS 84",6378137,298.257223563]],'
            'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
            'PROJECTION["Polar_Stereographic"],'
            'PARAMETER["latitude_of_origin",-71],'
            'PARAMETER["central_meridian",0],'
            'PARAMETER["false_easting",0],'
            'PARAMETER["false_northing",0],UNIT["metre",1]]')
        reg = projection_for("EPSG:3031")
        xw, yw = crs.lonlat_to_xy(45.0, -80.0)
        xr, yr = reg.forward(45.0, -80.0)
        assert abs(float(xw) - float(xr)) < 1e-9
        assert abs(float(yw) - float(yr)) < 1e-9

    def test_conus_albers_proj_vs_registry(self):
        from gdal_ray.core.conic import projection_for
        crs = crs_from("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 "
                       "+lon_0=-96 +x_0=0 +y_0=0 +ellps=GRS80")
        reg = projection_for("EPSG:5070")
        xw, yw = crs.lonlat_to_xy(-100.0, 40.0)
        xr, yr = reg.forward(-100.0, 40.0)
        assert abs(float(xw) - float(xr)) < 1e-9
        assert abs(float(yw) - float(yr)) < 1e-9

    def test_webmerc_vs_registry(self):
        from gdal_ray.core import mercator as merc
        crs = crs_from("+proj=webmerc +ellps=WGS84")
        x, y = crs.lonlat_to_xy(10.0, 50.0)
        xr, yr = merc.latlon_to_meters(50.0, 10.0)
        assert abs(float(x) - float(xr)) < 1e-6
        assert abs(float(y) - float(yr)) < 1e-6

    def test_mercator_1sp_vs_webmerc_sphere(self):
        # ellipsoidal Mercator on a SPHERE degenerates to the
        # spherical web-mercator formulas
        crs = crs_from("+proj=merc +a=6378137 +rf=0")
        web = crs_from("+proj=webmerc +ellps=WGS84")
        x1, y1 = crs.lonlat_to_xy(10.0, 50.0)
        x2, y2 = web.lonlat_to_xy(10.0, 50.0)
        assert abs(float(x1) - float(x2)) < 1e-6
        assert abs(float(y1) - float(y2)) < 1e-6


class TestWarpIntegration:
    def test_get_transform_wkt_and_proj(self):
        from gdal_ray.stages.warp import get_transform
        fwd = get_transform(TestOSGB.WKT27700, "EPSG:4326")
        lon, lat = fwd(np.array([400000.0]), np.array([-100000.0]))
        # true origin (49N 2W in OSGB36) lands near 49N 2W in WGS84
        assert abs(float(lat[0]) - 49.0) < 0.01
        assert abs(float(lon[0]) + 2.0) < 0.01
        inv = get_transform("EPSG:4326", TestOSGB.WKT27700)
        x, y = inv(lon, lat)
        # mm-level round-trip through the 7-param Helmert legs
        assert abs(float(x[0]) - 400000.0) < 2e-3
        assert abs(float(y[0]) + 100000.0) < 2e-3

    def test_get_transform_arbitrary_utm_zone(self):
        from gdal_ray.stages.warp import get_transform
        # a zone outside any curated registry, via proj string on a
        # non-WGS84 ellipsoid
        fwd = get_transform("+proj=utm +zone=48 +ellps=GRS80",
                            "EPSG:4326")
        lon, lat = fwd(np.array([500000.0]), np.array([1000000.0]))
        assert abs(float(lon[0]) - 105.0) < 1e-9

    def test_nad27_datum_leg(self):
        from gdal_ray.stages.warp import get_transform
        fwd = get_transform("EPSG:26711", "EPSG:4326")
        inv = get_transform("EPSG:4326", "EPSG:26711")
        x = np.array([440000.0])
        y = np.array([3750000.0])
        lon, lat = fwd(x, y)
        x2, y2 = inv(lon, lat)
        assert abs(float(x2[0]) - 440000.0) < 2e-3
        assert abs(float(y2[0]) - 3750000.0) < 2e-3
        # NAD27→WGS84 must actually shift (~tens of meters)
        nowgs = crs_from("+proj=utm +zone=11 +ellps=clrk66")
        lon0, lat0 = nowgs.xy_to_lonlat(x, y)
        assert abs(float(lon[0] - lon0[0])) * 111000 > 10.0


class TestProjParse:
    def test_rejects_unknown(self):
        with pytest.raises(ValueError, match="unsupported"):
            params_from_proj("+proj=geos +h=35785831")
        with pytest.raises(ValueError, match="not in the built-in"):
            crs_from("EPSG:31370")

    def test_south_utm(self):
        crs = crs_from("+proj=utm +zone=33 +south +ellps=WGS84")
        from gdal_ray.core.tmerc import lonlat_to_tmerc
        x, y = crs.lonlat_to_xy(15.0, -30.0)
        xr, yr = lonlat_to_tmerc(15.0, -30.0, 15.0, south=True)
        assert abs(float(x) - float(xr)) < 1e-9
        assert abs(float(y) - float(yr)) < 1e-9


class TestWktWarpQuery:
    def test_wkt_pixels_match_proj_string(self):
        """The battery query's WKT-constructed Mercator warp must give
        bit-identical pixels to the proj-string construction of the
        same CRS (both resolve through core/srs.py)."""
        from gdal_ray.pipelines.queries import WKT_3395
        from gdal_ray.stages.warp import reproject_array
        x, y = np.meshgrid(np.arange(96), np.arange(96))
        px = (((5 * x + 3 * y) % 256).astype(np.uint8))[:, :, None]
        gt = (-10.0, 0.01, 0.0, 45.96, 0.0, -0.01)
        a, va, ga = reproject_array(px, gt, "EPSG:4326", WKT_3395,
                                    resampling="near")
        b, vb, gb = reproject_array(px, gt, "EPSG:4326",
                                    "+proj=merc +lon_0=0 +k=1 +x_0=0 "
                                    "+y_0=0 +ellps=WGS84",
                                    resampling="near")
        assert ga == gb
        assert np.array_equal(va, vb)
        assert np.array_equal(a, b)

    def test_battery_query_runs(self, ray_session):
        from gdal_ray.pipelines.queries import q_wkt_warp
        df = q_wkt_warp("unused").to_pandas()
        assert len(df) == 96
        assert (df["dst_w"] > 0).all()


class TestSinusoidalEqc:
    def test_modis_sinusoidal(self):
        # MODIS grid: +proj=sinu +R=6371007.181; known property:
        # x at (lon, lat) = R*rad(lon)*cos(lat); tile H11V05 corner
        crs = crs_from("+proj=sinu +R=6371007.181 +lon_0=0 "
                       "+x_0=0 +y_0=0")
        x, y = crs.lonlat_to_xy(-100.0, 40.0)
        R = 6371007.181
        assert abs(float(x) - R * np.radians(-100.0)
                   * np.cos(np.radians(40.0))) < 1e-6
        assert abs(float(y) - R * np.radians(40.0)) < 1e-6
        lon, lat = crs.xy_to_lonlat(x, y)
        assert abs(float(lon) + 100.0) < 1e-9
        assert abs(float(lat) - 40.0) < 1e-9

    def test_plate_carree(self):
        crs = crs_from("+proj=eqc +lat_ts=0 +lon_0=0 +ellps=WGS84")
        x, y = crs.lonlat_to_xy(90.0, 45.0)
        a = 6378137.0
        assert abs(float(x) - a * np.pi / 2) < 1e-6
        assert abs(float(y) - a * np.pi / 4) < 1e-6
        fwd_wkt = crs_from(
            'PROJCS["WGS 84 / World Equidistant Cylindrical",'
            'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",'
            '6378137,298.257223563]],PRIMEM["Greenwich",0],'
            'UNIT["degree",0.0174532925199433]],'
            'PROJECTION["Equirectangular"],'
            'PARAMETER["latitude_of_origin",0],'
            'PARAMETER["central_meridian",0],'
            'PARAMETER["false_easting",0],'
            'PARAMETER["false_northing",0],UNIT["metre",1]]')
        x2, y2 = fwd_wkt.lonlat_to_xy(90.0, 45.0)
        assert abs(float(x) - float(x2)) < 1e-6
        assert abs(float(y) - float(y2)) < 1e-6


class TestSwissObliqueMercator:
    def test_bern_origin_golden(self):
        """CH1903/LV03 fundamental point: the old Bern observatory
        (46°57'08.66\"N, 7°26'22.50\"E) maps to exactly
        (600000, 200000) — swisstopo's published definition."""
        crs = crs_from("EPSG:21781")
        lat0 = dms(46, 57, 8.66)
        lon0 = dms(7, 26, 22.5)
        x, y = crs.lonlat_to_xy(lon0, lat0)
        assert abs(float(x) - 600000.0) < 1e-4
        assert abs(float(y) - 200000.0) < 1e-4

    def test_bern_meridian_straight_and_conformal(self):
        """The Bern meridian maps to the straight line E=600000; local
        scale is 1 at the origin in both axes (conformal double
        projection)."""
        crs = crs_from("EPSG:21781")
        lat0 = dms(46, 57, 8.66)
        lon0 = dms(7, 26, 22.5)
        for dlat in (0.5, -0.5, 1.0):
            x, _ = crs.lonlat_to_xy(lon0, lat0 + dlat)
            assert abs(float(x) - 600000.0) < 1e-6
        # 1 arcsec of latitude ≈ 30.88 m on the Bessel ellipsoid at 47N
        _, y1 = crs.lonlat_to_xy(lon0, lat0 + 1 / 3600)
        assert abs((float(y1) - 200000.0) - 30.88) < 0.05
        x2, _ = crs.lonlat_to_xy(lon0 + 1 / 3600, lat0)
        assert abs((float(x2) - 600000.0) - 21.14) < 0.05

    def test_roundtrip(self):
        crs = crs_from("EPSG:21781")
        rng = np.random.default_rng(4)
        lon = rng.uniform(6.0, 10.5, 50)
        lat = rng.uniform(45.8, 47.8, 50)
        x, y = crs.lonlat_to_xy(lon, lat)
        lon2, lat2 = crs.xy_to_lonlat(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)
        # plausible LV03 ranges for Switzerland
        assert 480000 < x.min() and x.max() < 850000
        assert 60000 < y.min() and y.max() < 310000


class TestSouthOrientatedTM:
    """EPSG method 9808 (Transverse_Mercator_South_Orientated) — the
    South African Lo grids. Axes are westing/southing: both kernel
    outputs negate (ADVICE r4; ogrspatialreference.cpp SetTMSO)."""

    WKT = (
        'PROJCS["Hartebeesthoek94 / Lo19",'
        'GEOGCS["Hartebeesthoek94",DATUM["Hartebeesthoek94",'
        'SPHEROID["WGS 84",6378137,298.257223563]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator_South_Orientated"],'
        'PARAMETER["latitude_of_origin",0],'
        'PARAMETER["central_meridian",19],'
        'PARAMETER["scale_factor",1],'
        'PARAMETER["false_easting",0],'
        'PARAMETER["false_northing",0],'
        'UNIT["metre",1]]')

    def test_axes_negate_plain_tmerc(self):
        p = params_from_wkt(self.WKT)
        assert p["kind"] == "tmerc_south"
        so = CRS(p)
        tm = CRS(params_from_proj("+proj=tmerc +lat_0=0 +lon_0=19 "
                                  "+k=1 +x_0=0 +y_0=0 "
                                  "+ellps=WGS84 +no_defs"))
        lon, lat = 19.5, -33.9
        w, s = so.lonlat_to_xy(lon, lat)
        e, n = tm.lonlat_to_xy(lon, lat)
        np.testing.assert_allclose(float(w), -float(e), rtol=1e-12)
        np.testing.assert_allclose(float(s), -float(n), rtol=1e-12)
        # southern hemisphere: southing positive; east of CM: westing
        # negative (the Lo convention)
        assert float(s) > 3.7e6 and float(w) < 0

    def test_roundtrip(self):
        so = CRS(params_from_wkt(self.WKT))
        rng = np.random.default_rng(9)
        lon = rng.uniform(17.5, 20.5, 30)
        lat = rng.uniform(-35.0, -25.0, 30)
        w, s = so.lonlat_to_xy(lon, lat)
        lon2, lat2 = so.xy_to_lonlat(w, s)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)


class TestHotineObliqueMercator:
    """EPSG methods 9812/9815 — golden: the EPSG Guidance Note 7-2
    §3.2.6 worked example (Timbalai 1948 / RSO Borneo (m), Everest
    1830, variant B): φ=5°23'14.1129"N λ=115°48'19.8196"E →
    E=679245.73 N=596562.78."""

    WKT = (
        'PROJCS["Timbalai 1948 / RSO Borneo (m)",GEOGCS["Timbalai 1948",'
        'DATUM["Timbalai_1948",SPHEROID["Everest 1830 (1967 Definition)"'
        ',6377298.556,300.8017]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Hotine_Oblique_Mercator_Azimuth_Center"],'
        'PARAMETER["latitude_of_center",4],'
        'PARAMETER["longitude_of_center",115],'
        'PARAMETER["azimuth",53.31582047222222],'
        'PARAMETER["rectified_grid_angle",53.13010236111111],'
        'PARAMETER["scale_factor",0.99984],'
        'PARAMETER["false_easting",590476.87],'
        'PARAMETER["false_northing",442857.65],UNIT["metre",1]]')

    def test_epsg_worked_example(self):
        p = params_from_wkt(self.WKT)
        assert p["kind"] == "omerc_b"
        crs = CRS(p)
        lat = dms(5, 23, 14.1129)
        lon = dms(115, 48, 19.8196)
        E, N = crs.lonlat_to_xy(lon, lat)
        assert abs(float(E) - 679245.73) < 0.02
        assert abs(float(N) - 596562.78) < 0.02

    def test_roundtrip_and_center(self):
        crs = CRS(params_from_wkt(self.WKT))
        # the centre maps to (FE, FN) in variant B
        E, N = crs.lonlat_to_xy(115.0, 4.0)
        assert abs(float(E) - 590476.87) < 1e-6
        assert abs(float(N) - 442857.65) < 1e-6
        rng = np.random.default_rng(11)
        lon = rng.uniform(109.0, 119.0, 40)
        lat = rng.uniform(0.5, 7.5, 40)
        x, y = crs.lonlat_to_xy(lon, lat)
        lon2, lat2 = crs.xy_to_lonlat(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_variant_a_proj_string(self):
        """+proj=omerc +no_uoff (Alaska zone 1 parameters): variant A
        differs from B by the rectified u_c offset only."""
        base = ("+lat_0=57 +lonc=-133.6666666666667 "
                "+alpha=-36.86989764583333 +gamma=-36.86989764583333 "
                "+k=0.9999 +x_0=0 +y_0=0 +ellps=clrk66 +no_defs")
        va = CRS(params_from_proj("+proj=omerc +no_uoff " + base))
        vb = CRS(params_from_proj("+proj=omerc " + base))
        assert va.params["kind"] == "omerc"
        assert vb.params["kind"] == "omerc_b"
        lon, lat = -134.5, 58.2
        xa, ya = va.lonlat_to_xy(lon, lat)
        xb, yb = vb.lonlat_to_xy(lon, lat)
        uc = va.proj.A / va.proj.B  # scale of the offset
        assert abs(float(xa) - float(xb)) > 1000  # offsets differ
        # both invert exactly
        for crs, x, y in ((va, xa, ya), (vb, xb, yb)):
            lo, la = crs.xy_to_lonlat(x, y)
            assert abs(float(lo) - lon) < 1e-9
            assert abs(float(la) - lat) < 1e-9
