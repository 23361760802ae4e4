"""Polygon overlay (intersection area) vs closed-form and Monte-Carlo
oracles, covering convex/concave/hole/multipolygon shapes."""

import numpy as np

from gdal_ray.core import overlay as ov
from gdal_ray.core import wkb as W
from gdal_ray.core.geom import area


def mc_area(a, b, bounds, n=200_000, seed=0):
    """Monte-Carlo area of a∩b (oracle)."""
    from gdal_ray.core.geom import points_in_polygon
    rng = np.random.default_rng(seed)
    minx, miny, maxx, maxy = bounds
    xs = rng.uniform(minx, maxx, n)
    ys = rng.uniform(miny, maxy, n)
    ina = points_in_polygon(xs, ys, a)
    inb = points_in_polygon(xs, ys, b)
    return (ina & inb).mean() * (maxx - minx) * (maxy - miny)


class TestPrimitives:
    def test_sh_clip_square_overlap(self):
        sub = np.array([(0, 0), (4, 0), (4, 4), (0, 4)], float)
        clip = np.array([(2, 2), (6, 2), (6, 6), (2, 6)], float)
        out = ov.sh_clip(sub, clip)
        assert abs(abs(ov.ring_area(ov._close(out))) - 4.0) < 1e-9

    def test_sh_clip_disjoint_empty(self):
        sub = np.array([(0, 0), (1, 0), (1, 1), (0, 1)], float)
        clip = np.array([(5, 5), (6, 5), (6, 6), (5, 6)], float)
        assert len(ov.sh_clip(sub, clip)) == 0

    def test_is_convex(self):
        assert ov.is_convex(np.array([(0, 0), (2, 0), (2, 2), (0, 2)], float))
        assert not ov.is_convex(
            np.array([(0, 0), (2, 0), (2, 2), (1, 1), (0, 2)], float))

    def test_triangulate_partitions_area(self):
        # concave L-shape
        ring = np.array([(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)],
                        float)
        tris = ov.triangulate(ring)
        total = sum(abs(ov.ring_area(ov._close(t))) for t in tris)
        assert abs(total - 12.0) < 1e-9
        assert len(tris) == len(ring) - 2


class TestIntersectionArea:
    def test_squares(self):
        a = W.box(0, 0, 4, 4)
        b = W.box(2, 2, 6, 6)
        assert abs(ov.intersection_area(a, b) - 4.0) < 1e-9
        assert abs(ov.intersection_area(b, a) - 4.0) < 1e-9

    def test_contained(self):
        a = W.box(0, 0, 10, 10)
        b = W.box(2, 2, 4, 4)
        assert abs(ov.intersection_area(a, b) - 4.0) < 1e-9
        assert abs(ov.intersection_area(b, a) - 4.0) < 1e-9

    def test_disjoint(self):
        assert ov.intersection_area(W.box(0, 0, 1, 1), W.box(5, 5, 6, 6)) == 0

    def test_concave_b(self):
        a = W.box(1, 1, 3, 3)
        L = W.polygon([(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)])
        # A∩L: part below y=2 (x 1..3, y 1..2 → 2) + part x 1..2, y 2..3 → 1
        assert abs(ov.intersection_area(a, L) - 3.0) < 1e-9
        assert abs(ov.intersection_area(L, a) - 3.0) < 1e-9

    def test_hole_in_a(self):
        a = W.polygon([(0, 0), (6, 0), (6, 6), (0, 6)],
                      holes=[[(2, 2), (4, 2), (4, 4), (2, 4)]])
        b = W.box(1, 1, 5, 5)
        # 4x4 window minus the 2x2 hole
        assert abs(ov.intersection_area(a, b) - 12.0) < 1e-9
        assert abs(ov.intersection_area(b, a) - 12.0) < 1e-9

    def test_multipolygon(self):
        a = W.multipolygon([W.box(0, 0, 2, 2), W.box(10, 10, 12, 12)])
        b = W.box(1, 1, 11, 11)
        assert abs(ov.intersection_area(a, b) - 2.0) < 1e-9

    def test_random_convex_vs_monte_carlo(self):
        rng = np.random.default_rng(4)
        for _ in range(5):
            # random convex hulls of point clouds
            from gdal_ray.stages.vector_ops import convex_hull
            pa_ = convex_hull(rng.uniform(0, 10, (30, 2)))
            pb_ = convex_hull(rng.uniform(3, 13, (30, 2)))
            a = W.polygon(pa_)
            b = W.polygon(pb_)
            exact = ov.intersection_area(a, b)
            approx = mc_area(a, b, (0, 0, 13, 13), n=300_000)
            assert abs(exact - approx) < 0.12 * max(1.0, approx), (exact, approx)


class TestPieces:
    def test_pieces_area_sums(self):
        a = W.box(1, 1, 3, 3)
        L = W.polygon([(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)])
        pieces = ov.intersection_pieces(a, L)
        total = sum(abs(area(p)) for p in pieces)
        assert abs(total - 3.0) < 1e-9
