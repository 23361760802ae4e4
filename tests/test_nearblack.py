"""nearblack collar removal (apps/nearblack_lib.cpp parity)."""

import numpy as np

from gdal_ray.stages.raster_ops import nearblack


def _frame(h=12, w=16, t=2, b=1, left=3, r=2, fill=100):
    px = np.full((h, w, 3), fill, np.uint8)
    px[:t] = 0
    if b:
        px[h - b:] = 0
    px[:, :left] = 0
    if r:
        px[:, w - r:] = 0
    return px


def test_rect_frame_counts():
    px = _frame()
    out, valid = nearblack(px)
    assert (~valid).sum() == 16 * 3 + (12 - 3) * 5
    assert (out[~valid] == 0).all()
    assert (out[valid] == 100).all()


def test_interior_island_untouched():
    px = _frame()
    px[6, 8] = 0          # near-black island not connected to border
    out, valid = nearblack(px)
    assert valid[6, 8]
    assert out[6, 8, 0] == 0   # value kept, not replaced


def test_near_dist_threshold():
    px = np.full((6, 6, 3), 100, np.uint8)
    px[:, 0] = 15          # within default near_dist
    px[:, 1] = 16          # just outside
    _, valid = nearblack(px, near_dist=15)
    assert (~valid[:, 0]).all() and valid[:, 1].all()


def test_white_collar():
    px = np.full((6, 8, 3), 100, np.uint8)
    px[:, :2] = 250        # near-white collar
    out, valid = nearblack(px, white=True)
    assert (~valid[:, :2]).all()
    assert (out[:, :2] == 255).all()      # replace value is 255


def test_multiple_colors():
    px = np.full((4, 6, 3), 100, np.uint8)
    px[:, 0] = (10, 10, 10)
    px[:, 1] = (200, 50, 25)
    _, valid = nearblack(px, colors=[(0, 0, 0), (200, 50, 25)])
    assert (~valid[:, :2]).all() and valid[:, 2:].all()


def test_max_non_black_grey_area():
    # one non-collar pixel inside the run is tolerated with max=1 and
    # replaced; the run continues through it
    px = np.full((1, 8, 3), 100, np.uint8)
    px[0, :2] = 0
    px[0, 2] = 40          # grey pixel
    px[0, 3] = 0           # collar resumes
    out, valid = nearblack(px, max_non_black=1)
    assert (~valid[0, :4]).all()
    assert valid[0, 4]     # second non-black pixel ends the run


def test_edge_guard_max_non_black():
    # non-collar data right at the border disables the run entirely
    # when max_non_black > 0 (nearblack_lib.cpp:707-713)
    px = np.full((1, 8, 3), 100, np.uint8)
    _, valid = nearblack(px, max_non_black=2)
    assert valid.all()


def test_grayscale_2d():
    px = np.full((6, 6), 200, np.uint8)
    px[:, :2] = 3
    out, valid = nearblack(px)
    assert out.ndim == 2 and (~valid[:, :2]).all()
