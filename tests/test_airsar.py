"""AirSAR reader — synthetic compressed-Stokes fixture built from
the reference driver's documented math
(frmts/airsar/airsardataset.cpp:326-338, band formulas :157-245)."""

import numpy as np
import pytest

from gdal_ray.codecs.airsar import decode_airsar, identify_airsar

SQRT2 = 1.4142135623730951


def _hdr_line(key, val):
    line = f"{key} = {val}".encode()
    assert len(line) <= 50, (key, val)
    return line.ljust(50)


def _make_airsar(w, h, rng):
    b = rng.integers(-127, 128, (h, w, 10)).astype(np.int8)
    b[..., 0] = rng.integers(-8, 8, (h, w))  # sane exponents
    rec_len = 10 * w
    header = b"".join([
        _hdr_line("RECORD LENGTH IN BYTES", str(rec_len)),
        _hdr_line("NUMBER OF HEADER RECORDS", "2"),
        _hdr_line("NUMBER OF SAMPLES PER RECORD", str(w)),
        _hdr_line("NUMBER OF LINES IN IMAGE", str(h)),
        _hdr_line("JPL AIRCRAFT SAR PROCESSOR VERSION", "1.0"),
        _hdr_line("DATA TYPE", "COMPRESSED STOKES MATRIX"),
        _hdr_line("BYTE OFFSET OF FIRST DATA RECORD", str(50 * 8)),
    ]) + b" " * 50  # all-spaces terminator
    data_start = 50 * 8
    out = bytearray(header.ljust(data_start))
    for y in range(h):
        rec = bytearray(rec_len)
        rec[:10 * w] = b[y].tobytes()
        out += rec
    return bytes(out), b


def _stokes(b):
    bf = b.astype(np.float64)
    m11 = (bf[..., 1] / 254.0 + 1.5) * 2.0 ** bf[..., 0]
    m12 = bf[..., 2] * m11 / 127
    m13 = bf[..., 3] * np.abs(bf[..., 3]) * m11 / 127 ** 2
    m14 = bf[..., 4] * np.abs(bf[..., 4]) * m11 / 127 ** 2
    m23 = bf[..., 5] * np.abs(bf[..., 5]) * m11 / 127 ** 2
    m24 = bf[..., 6] * np.abs(bf[..., 6]) * m11 / 127 ** 2
    m33 = bf[..., 7] * m11 / 127
    m34 = bf[..., 8] * m11 / 127
    m44 = bf[..., 9] * m11 / 127
    m22 = m11 - m33 - m44
    return m11, m12, m13, m14, m22, m23, m24, m33, m34, m44


def test_identify():
    buf, _ = _make_airsar(4, 3, np.random.default_rng(0))
    assert identify_airsar(buf[:800])
    assert not identify_airsar(b"NOPE" * 200)


def test_covariance_bands():
    rng = np.random.default_rng(42)
    buf, b = _make_airsar(13, 7, rng)
    px, gt, nd, meta = decode_airsar(buf)
    assert px.shape == (7, 13, 6) and px.dtype == np.complex64
    m11, m12, m13, m14, m22, m23, m24, m33, m34, m44 = _stokes(b)
    np.testing.assert_allclose(px[..., 0].real, m11 + m22 + 2 * m12,
                               rtol=1e-6)
    np.testing.assert_allclose(px[..., 1].real, SQRT2 * (m13 + m23),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(px[..., 1].imag, -SQRT2 * (m24 + m14),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(px[..., 2].real, 2 * m33 + m22 - m11,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(px[..., 2].imag, -2 * m34, rtol=1e-6,
                               atol=1e-7)
    np.testing.assert_allclose(px[..., 3].real, 2 * (m11 - m22),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(px[..., 5].real, m11 + m22 - 2 * m12,
                               rtol=1e-6, atol=1e-6)
    assert np.all(px[..., 0].imag == 0)
    assert meta["MATRIX_REPRESENTATION"] == "SYMMETRIZED_COVARIANCE"
    assert meta["MH_DATA_TYPE"] == "COMPRESSED STOKES MATRIX"


def test_header_double_space_split():
    # keys without '=' split on the last double space (the
    # reference's fallback works when the value ends at byte 50)
    line = b"NUMBER OF SAMPLES PER RECORD" + b" " * 20 + b"16"
    assert len(line) == 50
    from gdal_ray.codecs.airsar import _read_header
    md = _read_header(bytes(line) + b" " * 50, 0, "MH", 5)
    assert md["MH_NUMBER_OF_SAMPLES_PER_RECORD"] == "16"


def test_dispatch(tmp_path):
    from gdal_ray.sources.raster import read_raster
    buf, _ = _make_airsar(5, 4, np.random.default_rng(1))
    p = str(tmp_path / "scene_c.dat")
    open(p, "wb").write(buf)
    px, _, _, meta = read_raster(p)
    assert meta["driver"] == "AirSAR" and px.shape == (4, 5, 6)
