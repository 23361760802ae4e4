"""Property-based invariants (hypothesis): codec round trips, transform
inverses, overlay conservation — the fuzz layer over the closed-form
unit tests."""

import numpy as np
from hypothesis import given, settings, strategies as st

from gdal_ray.core import geotransform as gtr
from gdal_ray.core import mercator as merc
from gdal_ray.core import wkb as W
from gdal_ray.core import wkt as T

finite = st.floats(min_value=-1e7, max_value=1e7, allow_nan=False,
                   width=64)


coords_strategy = st.lists(
    st.tuples(finite, finite), min_size=3, max_size=12)


@st.composite
def geometry(draw):
    kind = draw(st.sampled_from(["point", "linestring", "polygon",
                                 "multipolygon"]))
    if kind == "point":
        return W.point(draw(finite), draw(finite))
    if kind == "linestring":
        return W.linestring(draw(coords_strategy))
    if kind == "polygon":
        return W.polygon(draw(coords_strategy))
    return W.multipolygon([W.polygon(draw(coords_strategy))
                           for _ in range(draw(st.integers(1, 3)))])


class TestCodecRoundTrips:
    @settings(max_examples=150, deadline=None)
    @given(geometry())
    def test_wkb(self, g):
        assert W.dumps(W.loads(W.dumps(g))) == W.dumps(g)

    @settings(max_examples=150, deadline=None)
    @given(geometry())
    def test_wkt(self, g):
        assert W.dumps(T.loads_wkt(T.dumps_wkt(g))) == W.dumps(g)

    @settings(max_examples=150, deadline=None)
    @given(geometry())
    def test_geojson(self, g):
        assert W.dumps(T.from_geojson(T.to_geojson(g))) == W.dumps(g)


class TestGeotransform:
    @settings(max_examples=200, deadline=None)
    @given(st.tuples(finite,
                     st.floats(0.001, 1e4), st.floats(-0.5, 0.5),
                     finite,
                     st.floats(-0.5, 0.5), st.floats(-1e4, -0.001)),
           st.floats(-1e4, 1e4), st.floats(-1e4, 1e4))
    def test_inverse_round_trip(self, gt, col, row):
        # realistic geotransforms: rotation as a FRACTION of the scale
        # terms (unconstrained rotation makes the matrix arbitrarily
        # ill-conditioned and the round trip fp-impossible)
        gt = (gt[0], gt[1], gt[2] * gt[1], gt[3], gt[4] * abs(gt[5]), gt[5])
        det = gt[1] * gt[5] - gt[2] * gt[4]
        if abs(det) < 1e-12:
            return
        x, y = gtr.apply(gt, col, row)
        c2, r2 = gtr.apply_inverse(gt, x, y)
        # fp error scales with |world coordinate| / |pixel size|
        # (catastrophic cancellation when origin ≫ resolution)
        cond = (abs(gt[0]) + abs(gt[3]) + abs(x) + abs(y) + 1.0) \
            / min(abs(gt[1]), abs(gt[5]))
        tol = 64 * np.finfo(np.float64).eps * cond + 1e-9
        assert abs(c2 - col) < tol + 1e-6 * abs(col)
        assert abs(r2 - row) < tol + 1e-6 * abs(row)


class TestMercator:
    @settings(max_examples=200, deadline=None)
    @given(st.floats(-85.0, 85.0), st.floats(-179.9, 179.9))
    def test_latlon_round_trip(self, lat, lon):
        mx, my = merc.latlon_to_meters(lat, lon)
        lat2, lon2 = merc.meters_to_latlon(mx, my)
        assert abs(lat2 - lat) < 1e-9
        assert abs(lon2 - lon) < 1e-9

    @settings(max_examples=200, deadline=None)
    @given(st.integers(0, 20), st.integers(0, 2**20 - 1),
           st.integers(0, 2**20 - 1))
    def test_cell_id_bijective(self, z, x, y):
        n = 2 ** z
        x, y = x % n, y % n
        cid = merc.cell_id(z, np.int64(x), np.int64(y))
        z2, x2, y2 = merc.cell_decode(np.uint64(cid))
        assert (int(z2), int(x2), int(y2)) == (z, x, y)


class TestOverlayFuzz:
    @settings(max_examples=60, deadline=None)
    @given(st.floats(-50, 50), st.floats(-50, 50),
           st.floats(1, 40), st.floats(1, 40),
           st.floats(-50, 50), st.floats(-50, 50),
           st.floats(1, 40), st.floats(1, 40))
    def test_box_intersection_closed_form(self, ax, ay, aw, ah,
                                          bx, by, bw, bh):
        from gdal_ray.core.overlay import intersection_area
        a = W.box(ax, ay, ax + aw, ay + ah)
        b = W.box(bx, by, bx + bw, by + bh)
        expect = (max(0.0, min(ax + aw, bx + bw) - max(ax, bx))
                  * max(0.0, min(ay + ah, by + bh) - max(ay, by)))
        got = intersection_area(a, b)
        assert abs(got - expect) < 1e-6 * max(1.0, expect)


@given(
    w=st.integers(1, 40), h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    bands=st.sampled_from([1, 3]),
)
@settings(max_examples=30, deadline=None)
def test_pnm_roundtrip_fuzz(w, h, seed, bands):
    from gdal_ray.codecs.pnm import decode_pnm, encode_pnm
    rng = np.random.default_rng(seed)
    shape = (h, w) if bands == 1 else (h, w, 3)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    assert (decode_pnm(encode_pnm(px)) == px).all()
    assert (decode_pnm(encode_pnm(px, ascii_format=True)) == px).all()


@given(
    w=st.integers(1, 40), h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    paletted=st.booleans(),
)
@settings(max_examples=30, deadline=None)
def test_bmp_roundtrip_fuzz(w, h, seed, paletted):
    from gdal_ray.codecs.bmp import decode_bmp, encode_bmp
    rng = np.random.default_rng(seed)
    if paletted:
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
    else:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out, _pal = decode_bmp(encode_bmp(px))
    assert (out == px).all()


@given(
    w=st.integers(2, 12), h=st.integers(2, 12),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_xyz_roundtrip_fuzz(w, h, seed):
    # w, h >= 2: a single row/column cannot carry its own spacing
    # (decode_xyz falls back to res 1.0 there, as documented)
    from gdal_ray.sources.xyzgrid import decode_xyz, encode_xyz
    rng = np.random.default_rng(seed)
    band = rng.integers(0, 1000, (h, w)).astype(np.float64)
    gt = (float(rng.integers(-100, 100)), 2.5, 0.0,
          float(rng.integers(-100, 100)), 0.0, -1.25)
    out, got_gt = decode_xyz(encode_xyz(band, gt))
    assert np.allclose(out, band)
    assert np.allclose(got_gt, gt, rtol=1e-9)


@given(
    k=st.integers(0, 7),
    lon=st.floats(4.6, 5.4), lat=st.floats(43.6, 44.4),
    h=st.floats(0.0, 400.0),
)
@settings(max_examples=40, deadline=None)
def test_rpc_inverse_fuzz(k, lon, lat, h):
    from gdal_ray.core.rpc import synthetic_rpc
    m = synthetic_rpc(k)
    px, ln = m.geo_to_pixel(np.array([lon]), np.array([lat]), h)
    rlon, rlat, ok = m.pixel_to_geo(px, ln, h, max_iterations=16,
                                    threshold=1e-6)
    assert ok.all()
    assert abs(float(rlon[0]) - lon) < 1e-7
    assert abs(float(rlat[0]) - lat) < 1e-7


@given(
    px=st.floats(0.0, 256.0), ln=st.floats(0.0, 256.0),
    d=st.integers(0, 3),
)
@settings(max_examples=40, deadline=None)
def test_geoloc_inverse_fuzz(px, ln, d):
    from gdal_ray.core.geoloc import GeolocTransformer
    gl, gp = np.meshgrid(np.arange(33.0), np.arange(33.0), indexing="ij")
    dd = 0.01 * d
    gx = 100.0 + 2.5 * gp + 0.25 * gl + dd * gp * gl
    gy = 200.0 + 0.125 * gp + 3.0 * gl - dd * gp * gl
    tr = GeolocTransformer(gx, gy, pixel_step=8.0, line_step=8.0)
    X, Y, ok = tr.pixel_to_geo(np.array([px]), np.array([ln]))
    assert ok.all()
    rpx, rln, conv = tr.geo_to_pixel(X, Y)
    assert conv.all()
    assert abs(float(rpx[0]) - px) < 1e-6
    assert abs(float(rln[0]) - ln) < 1e-6


@given(
    h=st.integers(2, 16), w=st.integers(2, 16),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_nearblack_matches_bruteforce(h, w, seed):
    """Union-of-directional-runs vs a per-line loop reference
    (max_non_black=0 semantics)."""
    from gdal_ray.stages.raster_ops import nearblack
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 60, (h, w, 3), dtype=np.uint8)

    near = (px.astype(int) <= 15).all(axis=2)
    exp = np.zeros((h, w), bool)
    for y in range(h):                       # horizontal runs
        for rng_iter in (range(w), range(w - 1, -1, -1)):
            for x in rng_iter:
                if near[y, x]:
                    exp[y, x] = True
                else:
                    break
    for x in range(w):                       # vertical runs
        for rng_iter in (range(h), range(h - 1, -1, -1)):
            for y in rng_iter:
                if near[y, x]:
                    exp[y, x] = True
                else:
                    break
    _, valid = nearblack(px, near_dist=15)
    assert (~valid == exp).all()


@given(
    h=st.integers(2, 24), w=st.integers(2, 24),
    seed=st.integers(0, 2**31 - 1),
    n_colors=st.sampled_from([4, 16, 64, 256]),
)
@settings(max_examples=30, deadline=None)
def test_median_cut_invariants(h, w, seed, n_colors):
    from gdal_ray.functions.quantize import median_cut_pct, remap_to_pct
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    pal, cnt = median_cut_pct(px, n_colors)
    assert 1 <= len(pal) <= n_colors
    assert cnt.sum() == h * w                    # every pixel boxed once
    idx = remap_to_pct(px, pal)
    assert idx.max() < len(pal)
    n_cells = len(np.unique(
        (px.reshape(-1, 3) >> 3).astype(np.int32) @ [1024, 32, 1]))
    if n_cells <= n_colors:
        # enough boxes for every occupied 5-bit cell: each pixel's own
        # cell entry is within L1 distance 21 (7 per channel), and the
        # L1-nearest remap can only do better in TOTAL distance
        rec = pal[idx].astype(int)
        l1 = np.abs(rec - px.astype(int)).sum(axis=2)
        assert l1.max() <= 21


class TestConcaveHull:
    """chi-shape concave hull (OGR_G_ConcaveHull analog)."""

    def test_c_shape_concavity(self):
        from gdal_ray.core import wkb as W
        from gdal_ray.core.geom import area as _area
        from gdal_ray.stages.vector_ops import concave_hull, convex_hull
        rng = np.random.default_rng(3)
        th = rng.uniform(0.4, 2 * np.pi - 0.4, 400)
        r = rng.uniform(5, 7, 400)
        pts = np.c_[r * np.cos(th), r * np.sin(th)]
        a_cv = _area(W.polygon(convex_hull(pts)))
        a_cc = _area(W.polygon(concave_hull(pts, 0.1)))
        # the annulus-sector cloud must lose its convex fill
        assert a_cc < 0.8 * a_cv

    def test_ratio_one_is_convex_hull(self):
        from gdal_ray.core import wkb as W
        from gdal_ray.core.geom import area as _area
        from gdal_ray.stages.vector_ops import concave_hull, convex_hull
        pts = np.random.default_rng(4).normal(0, 5, (300, 2))
        a_cv = _area(W.polygon(convex_hull(pts)))
        a_1 = _area(W.polygon(concave_hull(pts, 1.0)))
        # ratio=1 erodes nothing; only Delaunay sliver loss may differ
        assert abs(a_1 - a_cv) < 1e-3 * a_cv

    def test_monotone_in_ratio_and_simple(self):
        from gdal_ray.core import wkb as W
        from gdal_ray.core.geom import area as _area
        from gdal_ray.stages.vector_ops import concave_hull
        pts = np.random.default_rng(5).random((250, 2)) * 10
        prev = None
        for ratio in (0.0, 0.2, 0.5, 1.0):
            ring = concave_hull(pts, ratio)
            assert np.array_equal(ring[0], ring[-1])
            # boundary is a simple chain: vertices unique
            inner = ring[:-1]
            assert len(np.unique(inner, axis=0)) == len(inner)
            a = _area(W.polygon(ring))
            if prev is not None:
                assert a >= prev - 1e-9     # larger ratio ⊇ smaller
            prev = a

    def test_degenerate_inputs(self):
        from gdal_ray.stages.vector_ops import concave_hull
        line = np.c_[np.arange(5.0), np.zeros(5)]
        ring = concave_hull(line, 0.5)      # collinear -> degenerate
        assert len(ring) >= 2
        two = np.array([[0.0, 0.0], [1.0, 1.0]])
        assert len(concave_hull(two)) >= 2
