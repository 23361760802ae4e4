"""Median-cut palette + error-diffusion dither
(alg/gdalmediancut.cpp, alg/gdaldither.cpp parity)."""

import numpy as np
import pytest

from gdal_ray.functions.quantize import (dither_rgb2pct, median_cut_pct,
                                         remap_to_pct)


def _four_color():
    px = np.zeros((8, 8, 3), np.uint8)
    px[:4, :4] = (250, 10, 10)
    px[:4, 4:] = (10, 250, 10)
    px[4:, :4] = (10, 10, 250)
    px[4:, 4:] = (200, 200, 200)
    return px


def test_four_colors_four_boxes():
    pal, cnt = median_cut_pct(_four_color(), 4)
    assert len(pal) == 4
    assert cnt.tolist() == [16, 16, 16, 16]
    # each palette entry is the 5-bit cell center ((q<<3 + q<<3)/2 = q<<3)
    got = {tuple(c) for c in pal.tolist()}
    assert got == {(248, 8, 8), (8, 248, 8), (8, 8, 248), (200, 200, 200)}


def test_palette_entry_formula():
    # one box spanning two 5-bit cells: entry = ((min+max) << 3) / 2
    px = np.zeros((1, 2, 3), np.uint8)
    px[0, 0] = (0, 0, 0)
    px[0, 1] = (16, 0, 0)     # quantized r-cells 0 and 2
    pal, _ = median_cut_pct(px, 1)
    assert tuple(pal[0]) == (((0 + 2) << 3) // 2, 0, 0)


def test_split_largest_total_first():
    # 100 pixels of reds vs 4 pixels of blues: with 3 colors the red
    # box must be the one split
    px = np.zeros((1, 104, 3), np.uint8)
    px[0, :50] = (255, 0, 0)
    px[0, 50:100] = (128, 0, 0)
    px[0, 100:] = (0, 0, 255)
    pal, cnt = median_cut_pct(px, 3)
    assert len(pal) == 3
    assert sorted(cnt.tolist()) == [4, 50, 50]


def test_unsplittable_stops_early():
    px = np.full((4, 4, 3), 100, np.uint8)   # one quantized cell
    pal, cnt = median_cut_pct(px, 8)
    assert len(pal) == 1 and cnt[0] == 16


def test_remap_nearest_l1_first_wins_ties():
    pal = np.array([[10, 0, 0], [0, 10, 0]], np.uint8)
    px = np.zeros((1, 1, 3), np.uint8)
    px[0, 0] = (5, 5, 0)      # L1 distance 15 to both -> index 0
    assert remap_to_pct(px, pal)[0, 0] == 0


def test_dither_preserves_mean_and_mixes():
    flat = np.full((32, 32, 3), 100, np.uint8)
    pal = np.array([[96, 96, 96], [104, 104, 104]], np.uint8)
    idx = dither_rgb2pct(flat, pal)
    rec = pal[idx].astype(np.float64)
    assert len(np.unique(idx)) == 2
    assert rec.mean() == pytest.approx(100.0, abs=0.5)


def test_dither_exact_palette_color_no_error():
    flat = np.full((8, 8, 3), 96, np.uint8)
    pal = np.array([[96, 96, 96], [200, 200, 200]], np.uint8)
    idx = dither_rgb2pct(flat, pal)
    assert (idx == 0).all()


def test_dither_error_truncation_toward_zero():
    # e = -7 -> sixth = trunc(-7/6) = -1 (C semantics), same-line
    # carry 2*sixth = -2; a Python floor division would give -2/-4.
    # pixel value 97 vs palette 104/96: nearest is 96 (d=1 vs 7)...
    # use 101: nearest 104 (d=3 vs 5) -> e=-3 -> sixth=0, carry 0.
    # Verify via a 1x2 line where the wrong truncation flips pixel 2.
    line = np.full((1, 2, 3), 101, np.uint8)
    pal = np.array([[104, 104, 104], [96, 96, 96]], np.uint8)
    idx = dither_rgb2pct(line, pal)
    # pixel 1: 101 -> 104 (e=-3, sixth=0, carry 0); pixel 2 unchanged
    assert idx[0, 0] == 0 and idx[0, 1] == 0


def test_grayscale_input_rejected():
    with pytest.raises(ValueError):
        median_cut_pct(np.zeros((4, 4), np.uint8))
