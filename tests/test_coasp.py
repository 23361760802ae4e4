"""COASP reader — synthetic fixture per the reference driver's
layout (frmts/coasp/coasp_dataset.cpp)."""

import os

import numpy as np
import pytest

from gdal_ray.codecs.coasp import identify_coasp, read_coasp


def _product(tmp_path, w=7, h=5, pols=("hh", "vv")):
    rng = np.random.default_rng(21)
    chans = {}
    for pol in pols:
        iq = rng.normal(size=(h, w, 2)).astype(np.float32)
        open(tmp_path / f"scene_{pol}_l1x.rc", "wb").write(
            iq.astype(">f4").tobytes())
        chans[pol.upper()] = (iq[:, :, 0] + 1j * iq[:, :, 1]).astype(
            np.complex64)
    hdr = (f"time_first_datarec 123.456\n"
           f"number_lines {h}\n"
           f"number_samples {w}\n"
           f"georef_grid 0.0 0.0 48.5 10.25\n"
           f"georef_grid {w - 1}.0 {h - 1}.0 48.4 10.35\n")
    p = str(tmp_path / "scene_hh_l1xh.hdr")
    open(p, "w").write(hdr)
    return p, chans


def test_identify(tmp_path):
    p, _ = _product(tmp_path)
    assert identify_coasp(p)
    assert not identify_coasp(__file__)


def test_channels_and_gcps(tmp_path):
    p, chans = _product(tmp_path)
    px, gt, nd, meta = read_coasp(p)
    assert px.dtype == np.complex64 and px.shape == (5, 7, 2)
    assert meta["polarizations"] == ["HH", "VV"]
    assert np.array_equal(px[:, :, 0], chans["HH"])
    assert np.array_equal(px[:, :, 1], chans["VV"])
    # georef_grid (pixel line lat lon) -> (px, ln, lon, lat, 0)
    assert meta["gcps"][0] == (0.0, 0.0, 10.25, 48.5, 0.0)
    assert meta["gcps"][1] == (6.0, 4.0, 10.35, 48.4, 0.0)


def test_dispatch(tmp_path):
    from gdal_ray.sources.raster import read_raster
    p, chans = _product(tmp_path, pols=("hh",))
    px, _, _, meta = read_raster(p)
    assert meta["driver"] == "COASP"
    assert px.shape == (5, 7)
