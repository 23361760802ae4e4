"""gdalinfo / ogrinfo analogs."""

import numpy as np

from gdal_ray.functions.info import raster_info, vector_info


def test_raster_info_gtiff_golden():
    buf = open("/root/reference/autotest/gcore/data/byte.tif", "rb").read()
    info = raster_info(buf)
    assert info["driver"] == "GTiff"
    assert info["size"] == (20, 20)
    assert info["band_info"][0]["checksum"] == 4672
    assert info["geotransform"] is not None
    # byte.tif's well-known stats (mean ~126.765)
    assert abs(info["band_info"][0]["mean"] - 126.765) < 0.01


def test_raster_info_png():
    from gdal_ray.codecs import encode
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    info = raster_info(encode(px, "png"), "png")
    assert info["bands"] == 3 and info["size"] == (4, 4)
    assert info["band_info"][2]["maximum"] == 47.0


def test_vector_info():
    import pyarrow as pa
    from gdal_ray.core import wkb as W
    t = pa.table({
        "fid": [1, 2],
        "name": ["a", "b"],
        "wkb": [W.dumps(W.box(0, 0, 2, 2)),
                W.dumps(W.point(5.0, 6.0))],
    })
    info = vector_info(t)
    assert info["feature_count"] == 2
    assert info["extent"] == (0.0, 0.0, 5.0, 6.0)
    assert info["geometry_types"] == {"Polygon": 1, "Point": 1}
    assert ("fid", "int64") in info["fields"]
