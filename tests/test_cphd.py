"""CPHD reader parity — the full autotest/gdrivers/cphd.py local
expectation set against the reference's own test.cphd fixture."""

import numpy as np
import pytest

from gdal_ray.codecs.cphd import read_cphd

F = "/root/reference/autotest/gdrivers/data/cphd/test.cphd"

ATTRIBUTE_NAMES = ["cphd_version", "classification", "collect_type",
                   "collector_name", "core_name", "radar_mode", "xml"]


@pytest.fixture(scope="module")
def cphd():
    return read_cphd(F)


def test_cphd_attributes(cphd):
    # attr set == named set + {k, release_info} (cphd.py:44-52)
    extra = sorted(set(cphd.attributes) - set(ATTRIBUTE_NAMES))
    assert extra == ["k", "release_info"]
    assert cphd.attributes["cphd_version"] == "1.1.0"
    assert cphd.attributes["classification"] == "UNCLASSIFIED"
    assert cphd.attributes["collect_type"] == "MONOSTATIC"
    assert cphd.attributes["collector_name"] == "Synthetic"
    assert cphd.attributes["core_name"] == "SyntheticCore"
    assert cphd.attributes["radar_mode"] == "SPOTLIGHT"
    assert cphd.attributes["xml"].startswith("<CPHD ")
    assert cphd.attributes["k"] == "V"          # custom attr, lowercased


def test_cphd_groups(cphd):
    assert cphd.group_names == ["1"]


def test_cphd_pvp_compound(cphd):
    ch = cphd.channels["1"]
    pvp = ch.pvp
    assert pvp.shape == (1,)                    # Vector dim, size 1
    dt = pvp.dtype
    assert dt.itemsize == 360
    assert len(dt.names) == 25
    # first components in offset order (cphd.py:93-103)
    assert dt.names[0] == "TxTime"
    assert dt.fields["TxTime"][1] == 0
    assert dt.fields["TxTime"][0] == np.dtype(">f8")
    assert dt.names[1] == "TxPos"
    assert dt.fields["TxPos"][1] == 8
    tx_dt = dt.fields["TxPos"][0]
    assert tx_dt.names == ("X", "Y", "Z")


def test_cphd_pvp_values(cphd):
    arr = cphd.channels["1"].pvp
    assert arr["TxTime"][0] == 0
    for comp in ("TxPos", "TxAntenna.TxACX", "TxAntenna.TxACY",
                 "RcvAntenna.RcvACX", "RcvAntenna.RcvACY"):
        for ax in ("X", "Y", "Z"):
            assert arr[comp][0][ax] == 0
    for comp in ("TxAntenna.TxEB", "RcvAntenna.RcvEB"):
        assert arr[comp][0]["DCX"] == 0
        assert arr[comp][0]["DCY"] == 0
    assert arr["MyPVP"][0] == 0                 # AddedPVP by Name


def test_cphd_signal_block(cphd):
    sig = cphd.channels["1"].signal
    assert sig.shape == (1, 1)                  # (Y=NumVectors, X=NumSamples)
    assert sig.dtype == np.dtype(">c8")         # CF8 -> CFloat32
    assert sig[0][0] == np.complex64(0 + 0j)


def test_cphd_read_raster_dispatch(tmp_path):
    import shutil
    from gdal_ray.sources.raster import read_raster
    p = tmp_path / "test.cphd"
    shutil.copy(F, p)
    px, gt, nodata, meta = read_raster(str(p))
    assert px.shape == (1, 1)
    assert meta["cphd_version"] == "1.1.0"
