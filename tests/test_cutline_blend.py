"""Cutline blend density (gdalwarp CUTLINE_BLEND_DIST parity)."""

import numpy as np
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.stages.raster_ops import apply_density, cutline_blend_density

GT = (0.0, 1.0, 0.0, 12.0, 0.0, -1.0)


def test_linear_ramp():
    g = W.box(2.0, 2.0, 10.0, 10.0)
    d = cutline_blend_density(np.zeros((12, 12)), GT, g, 3.0)
    # middle row: 0 0 1/3 2/3 1 1 1 1 2/3 1/3 0 0
    assert d[5, 1] == 0.0
    assert d[5, 2] == pytest.approx(1 / 3)
    assert d[5, 3] == pytest.approx(2 / 3)
    assert d[5, 5] == 1.0
    # corners blend on both axes: distance is the euclidean min, which
    # for a rectangle equals the axis min
    assert d[2, 2] == pytest.approx(1 / 3)


def test_zero_blend_is_binary_cutline():
    g = W.box(2.0, 2.0, 10.0, 10.0)
    d = cutline_blend_density(np.zeros((12, 12)), GT, g, 0.0)
    assert set(np.unique(d)) == {0.0, 1.0}
    assert d[5, 5] == 1.0 and d[0, 0] == 0.0


def test_density_sum_closed_form():
    g = W.box(2.0, 2.0, 10.0, 10.0)
    d = cutline_blend_density(np.zeros((12, 12)), GT, g, 3.0)
    # 8x8 interior: ring depths 1,2,3,4 -> densities 1/3, 2/3, 1, 1
    ring = [28, 20, 12, 4]   # pixels per depth ring in an 8x8 block
    exp = ring[0] / 3 + ring[1] * 2 / 3 + ring[2] + ring[3]
    assert float(d.sum()) == pytest.approx(exp)


def test_apply_density_blends_to_background():
    px = np.full((4, 4, 3), 200.0)
    dens = np.full((4, 4), 0.25)
    out = apply_density(px, dens, background=40.0)
    assert out[0, 0, 0] == pytest.approx(200 * 0.25 + 40 * 0.75)


def test_reproject_dst_alpha(ray_session):
    """GDALWarpDstAlphaMasker analog: 3857→4326 warps produce partial
    coverage (curved footprint on the lat/lon grid), so alpha_frac
    must be in (0, 1] and cs_alpha nonzero."""
    from gdal_ray.sources.images import images_dataset
    from gdal_ray.stages.georef import with_georef
    from gdal_ray.stages.warp import ReprojectImages

    df = images_dataset(8) \
        .map_batches(with_georef, batch_format="pyarrow") \
        .map_batches(ReprojectImages,
                     fn_constructor_kwargs={"dst_alpha": True},
                     concurrency=2, batch_size=8,
                     batch_format="pyarrow").to_pandas()
    assert {"cs_alpha", "alpha_frac"} <= set(df.columns)
    assert ((df.alpha_frac > 0) & (df.alpha_frac <= 1)).all()
