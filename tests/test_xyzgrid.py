"""XYZ ASCII grid driver (frmts/xyz parity;
autotest/gdrivers/xyz.py:28-40 roundtrip shape)."""

import numpy as np
import pytest

from gdal_ray.codecs.gtiff import decode_gtiff
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.xyzgrid import decode_xyz, encode_xyz


def test_byte_tif_roundtrip_golden():
    g = decode_gtiff(open("/root/reference/autotest/gcore/data/byte.tif",
                          "rb").read())
    band = g.pixels[:, :, 0] if g.pixels.ndim == 3 else g.pixels
    gt = g.geotransform
    text = encode_xyz(band, gt)
    out, got_gt = decode_xyz(text)
    assert checksum(out) == 4672          # autotest/gdrivers/xyz.py:28
    # the roundtrip preserves byte.tif's own (UTM) geotransform
    assert np.allclose(got_gt, gt, rtol=1e-12)
    assert np.array_equal(out, band)


def test_header_and_separators():
    band = np.array([[1.0, 2.0], [3.0, 4.0]])
    gt = (100.0, 10.0, 0.0, 200.0, 0.0, -10.0)
    text = encode_xyz(band, gt, column_separator=",",
                      add_header_line=True)
    assert text.splitlines()[0] == "X,Y,Z"
    out, got_gt = decode_xyz(text)
    assert np.allclose(out, band)
    assert np.allclose(got_gt, gt)


def test_column_order_from_header():
    text = "Y X Z\n5.0 1.0 10\n5.0 2.0 20\n4.0 1.0 30\n4.0 2.0 40\n"
    out, gt = decode_xyz(text)
    assert out.tolist() == [[10.0, 20.0], [30.0, 40.0]]
    assert gt[0] == pytest.approx(0.5) and gt[3] == pytest.approx(5.5)


def test_any_line_order():
    lines = ["2.0 4.0 40", "1.0 5.0 10", "2.0 5.0 20", "1.0 4.0 30"]
    out, _ = decode_xyz("\n".join(lines))
    assert out.tolist() == [[10.0, 20.0], [30.0, 40.0]]


def test_errors():
    with pytest.raises(ValueError):
        decode_xyz("1 2 3\n1 3 4\n2 2 5\n")      # hole in the grid
    with pytest.raises(ValueError):
        decode_xyz("1 2\n")                      # too few columns
    with pytest.raises(ValueError):
        decode_xyz("")                           # empty
    with pytest.raises(ValueError):
        decode_xyz("1 2 3\n2 2 4\n4 2 5\n")      # irregular spacing
