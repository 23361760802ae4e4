"""RPF / CADRG readers (codecs/rpf.py) — reference autotest rpftoc.py
goldens: the A.TOC entry CADRG_ONC_1,000,000_2_0 mosaics to checksum
53599 with gt (1.9999416, 0.0017833876..., 36.0001175, -0.0013461...),
NoData 216 and a 217-entry palette (all subframes transparent in the
fixture); zone-9 mosaic checksum equals its single frame's checksum
(real VQ payload); truncated frames degrade to the transparent
fill."""

import numpy as np
import pytest

from gdal_ray.codecs.rpf import (decode_rpftoc, read_rpf_frame,
                                 read_rpftoc)
from gdal_ray.core.checksum import checksum

D = "/root/reference/autotest/gdrivers/data"


class TestRpftoc:
    def test_toc_entry_mosaic(self):
        px, gt, nd, meta = decode_rpftoc(f"{D}/nitf/A.TOC")
        assert px.shape == (1536, 1536)
        assert int(checksum(px)) == 53599
        exp = (1.9999416, 0.0017833876302083334, 0.0,
               36.0001175, 0.0, -0.0013461816406249993)
        assert gt[:4] == pytest.approx(exp[:4], abs=1e-9)
        assert gt[5] == pytest.approx(exp[5], abs=1e-9)
        assert nd == 216
        assert len(meta["color_table"]) == 217
        assert meta["type"] == "CADRG"
        assert meta["scale"] == "1,000,000"

    def test_toc_entries(self):
        entries = read_rpftoc(f"{D}/nitf/A.TOC")
        assert len(entries) == 1
        e = entries[0]
        assert (e["nVertFrames"], e["nHorizFrames"]) == (1, 1)
        assert e["zone"] == "2"

    def test_zone9_frame_parity(self):
        px, gt, nd, meta = decode_rpftoc(
            f"{D}/rpftoc/zone9/RPF/A.TOC")
        frame, *_ = read_rpf_frame(
            f"{D}/rpftoc/zone9/RPF/ZONE9/00027010.ON9")
        # the autotest asserts mosaic checksum == frame checksum
        assert int(checksum(px)) == int(checksum(frame)) == 34243

    def test_truncated_frame(self):
        px, gt, nd, meta = read_rpf_frame(f"{D}/nitf/testtest.on9")
        assert px.shape[0] > 0    # georef-only truncated fixture
