"""CF-1.8 simple geometries vs autotest/gdrivers/netcdf.py SG tests."""

from gdal_ray.sources.netcdf_sg import read_netcdf_sg, read_netcdf_sg_table

D = "/root/reference/autotest/gdrivers/data/netcdf-sg"


def wkts(fx, layer="names_geometry"):
    ls = read_netcdf_sg(f"{D}/{fx}.nc")
    return [ft["wkt"] for ft in ls[layer]["features"]]


def test_point_read():
    assert wkts("point_test") == [
        "POINT (1 -1)", "POINT (2 -2)", "POINT (3 -3)",
        "POINT (4 -4)", "POINT (5 -5)"]


def test_point3d_read():
    assert wkts("point3D_test") == [
        "POINT (1 -1 1)", "POINT (2 -2 -2)", "POINT (3 -3 3)",
        "POINT (4 -4 -4)", "POINT (5 -5 5)"]


def test_multipoint_read():
    got = wkts("multipoint_test")
    assert got[0] == "MULTIPOINT ((1 -1),(2 -2),(3 -3),(4 -4))"
    assert got[1] == "MULTIPOINT ((5 -5),(6 -6),(7 -7),(8 -8))"
    assert len(got) == 5


def test_multipoint3d_read():
    got = wkts("multipoint3D_test")
    assert got[0] == "MULTIPOINT ((1 -1 1),(2 -2 -2),(3 -3 3),(4 -4 -4))"
    assert len(got) == 5


def test_line_read():
    got = wkts("line_test")
    assert got[0] == "LINESTRING (1 -1,2 -2,3 -3,4 -4)"
    assert len(got) == 5


def test_multiline_read():
    got = wkts("multiline_test")
    assert got == [
        "MULTILINESTRING ((1 -1),(2 -2,3 -3,4 -4))",
        "MULTILINESTRING ((5 -5,6 -6,7 -7,8 -8))",
        "MULTILINESTRING ((9 -9,10 -10,-1 1),(-2 2))",
        "MULTILINESTRING ((-3 3,-4 4),(-5 5,-6 6))",
        "MULTILINESTRING ((-7 7,-8 8,-9 9,-10 10))"]


def test_multiline3d_read():
    got = wkts("multiline3D_test")
    assert got[0] == "MULTILINESTRING ((1 -1 -1),(2 -2 2,3 -3 -3,4 -4 4))"
    assert got[2] == \
        "MULTILINESTRING ((9 -9 -9,10 -10 10,-1 1 -1),(-2 2 2))"


def test_polygon_read():
    assert wkts("polygon_test") == [
        "POLYGON ((0 0,1 0,1 1,0 0))",
        "POLYGON ((3 0,4 0,4 1,3 1,3 0))"]


def test_polygon3d_read():
    assert wkts("polygon3D_test") == [
        "POLYGON ((0 0 1,1 0 2,1 1 2,0 0 1))",
        "POLYGON ((3 0 1,4 0 1,4 1 1,3 1 1,3 0 1))"]


def test_multipolygon_read():
    assert wkts("multipolygon_test") == [
        "MULTIPOLYGON (((0 0,1 0,1 1,0 0)))",
        "MULTIPOLYGON (((3 0,4 0,4 1,3 0)),((3 0,4 1,3 1,3 0)))"]


def test_multipolygon3d_read():
    assert wkts("multipolygon3D_test") == [
        "MULTIPOLYGON (((0 0 0,1 0 5,1 1 5,0 0 0)))",
        "MULTIPOLYGON (((3 0 5,4 0 10,4 1 10,3 0 5)),"
        "((3 0 10,4 1 15,3 1 15,3 0 10)))"]


def test_serpenski_two_ring():
    ls = read_netcdf_sg(f"{D}/serpenski_2nd.nc")
    l = ls["serpenski"]
    assert l["geom_type"] == "MultiPolygon"
    assert len(l["features"]) == 1
    assert l["features"][0]["wkt"] == (
        "MULTIPOLYGON (((0 0,1 0,0.5 0.866025403784439,0 0),"
        "(0.5 0.0,0.75 0.433012701892219,"
        "0.25 0.433012701892219,0.5 0.0)))")


def test_serpenski3d_two_ring():
    ls = read_netcdf_sg(f"{D}/serpenski3D_2nd.nc")
    l = ls["serpenski"]
    assert l["geom_type"] == "MultiPolygon25D"
    assert l["features"][0]["wkt"] == (
        "MULTIPOLYGON (((0 0 1,1 0 1,0.5 0.866025403784439 1,0 0 1),"
        "(0.5 0.0 1,0.75 0.433012701892219 1,"
        "0.25 0.433012701892219 1,0.5 0.0 1)))")


def test_flipped_axes():
    assert wkts("flipped_axes_test")[0] == "POLYGON ((0 0,1 0,1 1,0 0))"


def test_arbitrary_axis_order():
    assert wkts("arbitrary_axis_order_test") == [
        "POLYGON ((0 0 1,1 0 2,1 1 2,0 0 1))",
        "POLYGON ((3 0 1,4 0 1,4 1 1,3 1 1,3 0 1))"]


def test_multiple_containers():
    ls = read_netcdf_sg(f"{D}/multiple_containers.nc")
    assert set(ls) == {"serpenski", "serpenski_outline"}
    assert ls["serpenski"]["geom_type"] == "MultiPolygon"
    assert ls["serpenski_outline"]["geom_type"] == "MultiLineString"
    assert ls["serpenski_outline"]["features"][0]["wkt"] == (
        "MULTILINESTRING ((0 0,1 0,0.5 0.866025403784439,0 0),"
        "(0.5 0.0,0.75 0.433012701892219,"
        "0.25 0.433012701892219,0.5 0.0))")


def test_yahara():
    ls = read_netcdf_sg(f"{D}/Yahara_alb.nc")
    l = ls["geometry_container"]
    assert len(l["features"]) == 71
    assert l["geom_type"] == "MultiPolygon"
    f0 = l["features"][0]
    assert int(f0["ID"]) == 1
    assert int(f0["GRIDCODE"]) == 55
    assert f0["X_COORD"] == 577251.43302
    assert f0["Y_COORD"] == 319799.04918
    crs = l["crs"]
    assert crs["grid_mapping_name"] == "albers_conical_equal_area"
    assert float(crs["latitude_of_projection_origin"][0]) == 23
    assert float(crs["longitude_of_central_meridian"][0]) == -96
    assert list(map(float, crs["standard_parallel"])) == [29.5, 45.5]


def test_states_full_layer():
    ls = read_netcdf_sg(f"{D}/cf1.8_states.nc")
    l = ls["geometry_container"]
    assert len(l["features"]) == 49
    assert l["geom_type"] == "MultiPolygon"
    second = l["features"][1]
    assert second["STATE_NAME"] == "Montana"
    assert int(second["DRAWSEQ"]) == 3
    assert second["STATE_FIPS"] == "30"
    assert second["STATE_ABBR"] == "MT"


def test_sg_table():
    t = read_netcdf_sg_table(f"{D}/cf1.8_states.nc")
    assert t.num_rows == 49
    assert "wkt" in t.column_names and "STATE_NAME" in t.column_names
