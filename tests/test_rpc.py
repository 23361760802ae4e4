"""RPC transformer semantics (alg/gdal_rpc.cpp parity)."""

import numpy as np
import pytest

from gdal_ray.core.rpc import RPCModel, rpc_terms, synthetic_rpc


def test_term_order_rpc00b():
    # RPCComputeTerms (gdal_rpc.cpp:300-330): spot-check every slot
    # with distinguishable primes.
    L, P, H = 2.0, 3.0, 5.0
    t = rpc_terms(np.array(L), np.array(P), np.array(H))
    exp = [1, L, P, H, L * P, L * H, P * H, L * L, P * P, H * H,
           L * P * H, L ** 3, L * P * P, L * H * H, L * L * P,
           P ** 3, P * H * H, L * L * H, P * P * H, H ** 3]
    assert np.allclose(t, exp)


def test_identityish_model_center_and_shift():
    # A model whose numerators are exactly L and P maps the offsets to
    # (samp_off + 0.5, line_off + 0.5) — the center→corner shift of
    # RPCTransformPoint (gdal_rpc.cpp:460-466).
    m = synthetic_rpc(0)
    px, ln = m.geo_to_pixel(m.long_off, m.lat_off, 0.0)
    assert px == pytest.approx(m.samp_off + 0.5)
    assert ln == pytest.approx(m.line_off + 0.5)


def test_roundtrip_all_models_dense_grid():
    lon, lat = np.meshgrid(np.linspace(4.6, 5.4, 17),
                           np.linspace(43.6, 44.4, 17))
    for k in range(8):
        m = synthetic_rpc(k)
        px, ln = m.geo_to_pixel(lon, lat, 0.0)
        rlon, rlat, conv = m.pixel_to_geo(px, ln, 0.0,
                                          max_iterations=16,
                                          threshold=1e-6)
        assert conv.all(), f"model {k} did not converge"
        assert np.abs(rlon - lon).max() < 1e-8
        assert np.abs(rlat - lat).max() < 1e-8


def test_height_term_active():
    # Models with odd k carry a H² denominator term: a nonzero height
    # must move the result (and the h=0 path must not).
    m = synthetic_rpc(1)
    px0, ln0 = m.geo_to_pixel(4.9, 43.9, 0.0)
    px1, ln1 = m.geo_to_pixel(4.9, 43.9, 400.0)
    assert px0 != px1 and ln0 != ln1
    # at the declared height the normalized H is (400-0)/500 = 0.8 and
    # the denominator becomes 1 + 0.001*0.64
    den = 1.0 + 0.001 * 0.8 ** 2
    L = (4.9 - 5.0) / 0.5
    P = (43.9 - 44.0) / 0.5
    a, b = 0.02 * (1 % 5), 0.01 * (1 % 3)
    exp_px = (L + a * L * P + b * L * L) / den * 2048.0 \
        + (2048.0 - 8.0) + 0.5
    assert float(px1) == pytest.approx(exp_px, abs=1e-9)


def test_roundtrip_with_height():
    m = synthetic_rpc(3)
    lon = np.linspace(4.7, 5.3, 9)
    lat = np.linspace(43.7, 44.3, 9)
    px, ln = m.geo_to_pixel(lon, lat, 250.0)
    rlon, rlat, conv = m.pixel_to_geo(px, ln, 250.0,
                                      max_iterations=16, threshold=1e-6)
    assert conv.all()
    assert np.abs(rlon - lon).max() < 1e-8


def test_bad_coefficient_length_raises():
    with pytest.raises(ValueError):
        RPCModel(line_off=0, samp_off=0, lat_off=0, long_off=0,
                 height_off=0, line_scale=1, samp_scale=1, lat_scale=1,
                 long_scale=1, height_scale=1,
                 line_num=np.zeros(19), line_den=np.zeros(20),
                 samp_num=np.zeros(20), samp_den=np.zeros(20))


def test_rpc_warp_roundtrip_geometry():
    """rpc_warp: a synthetic RPC image warps onto lon/lat; the dst
    grid must cover the forward-projected corners, and warping a
    constant image yields that constant wherever valid."""
    import numpy as np
    from gdal_ray.stages.warp import rpc_warp

    m = synthetic_rpc(2)
    src = np.full((256, 256), 77.0)
    out, valid, gt = rpc_warp(src, m, resampling="near")
    assert valid.any()
    assert (out[valid] == 77.0).all()
    # corners of the image map inside the dst grid bounds
    lon, lat, ok = m.pixel_to_geo(np.array([0.0, 256.0]),
                                  np.array([0.0, 256.0]),
                                  0.0, max_iterations=16, threshold=1e-6)
    assert ok.all()
    minx, maxy = gt[0], gt[3]
    maxx = minx + out.shape[1] * gt[1]
    miny = maxy + out.shape[0] * gt[5]
    assert (lon >= minx - 1e-9).all() and (lon <= maxx + 1e-9).all()
    assert (lat >= miny - 1e-9).all() and (lat <= maxy + 1e-9).all()


def test_rpc_warp_gradient_values():
    """Warping a lon-aligned gradient: output columns follow the
    direct polynomial's sampling (spot-check the center pixel)."""
    import numpy as np
    from gdal_ray.stages.warp import rpc_warp

    m = synthetic_rpc(0)   # pure linear model
    gy, gx = np.mgrid[0:256, 0:256]
    src = gx.astype(np.float64)
    out, valid, gt = rpc_warp(src, m, resampling="bilinear")
    ch, cw = out.shape[0] // 2, out.shape[1] // 2
    assert valid[ch, cw]
    lon = gt[0] + (cw + 0.5) * gt[1]
    lat = gt[3] + (ch + 0.5) * gt[5]
    px, _ = m.geo_to_pixel(lon, lat, 0.0)
    assert abs(out[ch, cw] - (float(px) - 0.5)) < 0.6
