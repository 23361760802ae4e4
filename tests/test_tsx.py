"""TSX (TerraSAR-X) product reader — synthetic SSC product with a
COSAR payload (frmts/tsx/tsxdataset.cpp layout)."""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from gdal_ray.sources.tsx import identify_tsx, read_tsx


def _product(tmp_path):
    from test_sar_misc import _make_cosar
    cos, i, q = _make_cosar(8, 6)
    name = "TSX1_SAR__SSC______SM_S_SRA_20260101T000000_20260101T000010"
    pdir = tmp_path / name
    os.makedirs(pdir / "IMAGEDATA", exist_ok=True)
    open(pdir / "IMAGEDATA" / "IMAGE_HH_SRA_spot.cos", "wb").write(cos)
    georef = """<geoReference>
<referenceFrames><sphere><ellipsoidID>WGS84</ellipsoidID>
<semiMajorAxis>6378137.0</semiMajorAxis>
<semiMinorAxis>6356752.3142</semiMinorAxis></sphere></referenceFrames>
<geolocationGrid>
<numberOfGridPoints><total>2</total></numberOfGridPoints>
<gridPoint><col>1</col><row>1</row><lon>10.5</lon><lat>48.25</lat>
<height>500.0</height></gridPoint>
<gridPoint><col>8</col><row>6</row><lon>10.6</lon><lat>48.20</lat>
<height>505.0</height></gridPoint>
</geolocationGrid></geoReference>"""
    os.makedirs(pdir / "ANNOTATION", exist_ok=True)
    open(pdir / "ANNOTATION" / "GEOREF.xml", "w").write(georef)
    xml = f"""<level1Product>
<productComponents>
<annotation><type>GEOREF</type>
<file><location><path>ANNOTATION</path>
<filename>GEOREF.xml</filename></location></file></annotation>
<imageData layerIndex="1"><polLayer>HH</polLayer><type> </type>
<file><location><path>IMAGEDATA</path>
<filename>IMAGE_HH_SRA_spot.cos</filename></location></file>
</imageData>
</productComponents>
<productInfo>
<missionInfo><mission>TSX-1</mission><orbitCycle>13</orbitCycle>
<absOrbit>4829</absOrbit><orbitDirection>ASCENDING</orbitDirection>
</missionInfo>
<generationInfo><groundOperationsType>PREDICTED</groundOperationsType>
</generationInfo>
<acquisitionInfo><imagingMode>SM</imagingMode></acquisitionInfo>
<productVariantInfo><productVariant>SSC</productVariant>
</productVariantInfo>
<imageDataInfo><imageDataType>COMPLEX</imageDataType>
<imageRaster><numberOfRows>6</numberOfRows>
<numberOfColumns>8</numberOfColumns>
<rowSpacing>1.25</rowSpacing><columnSpacing>0.90</columnSpacing>
<azimuthLooks>1.0</azimuthLooks><rangeLooks>1.0</rangeLooks>
</imageRaster></imageDataInfo>
<sceneInfo><sceneCenterCoord>
<azimuthTimeUTC>2026-01-01T00:00:05Z</azimuthTimeUTC>
</sceneCenterCoord></sceneInfo>
</productInfo>
</level1Product>"""
    xml_path = pdir / f"{name}.xml"
    open(xml_path, "w").write(xml)
    return str(xml_path), str(pdir), i, q


def test_identify(tmp_path):
    xml_path, pdir, _, _ = _product(tmp_path)
    assert identify_tsx(xml_path)
    assert identify_tsx(pdir)
    assert not identify_tsx(__file__)


def test_read_product(tmp_path):
    xml_path, pdir, i, q = _product(tmp_path)
    px, gt, nd, meta = read_tsx(xml_path)
    assert px.dtype == np.complex64 and px.shape == (6, 8)
    assert np.array_equal(px.real, i.astype(np.float32))
    assert meta["PRODUCT_VARIANT"] == "SSC"
    assert meta["IMAGE_TYPE"] == "COMPLEX"
    assert meta["IMAGING_MODE"] == "SM"
    assert meta["ORBIT_DIRECTION"] == "ASCENDING"
    assert meta["ABSOLUTE_ORBIT"] == "4829"
    assert meta["ROW_SPACING"] == "1.25"
    assert meta["polarizations"] == ["HH"]
    assert meta["gcps"] == [(1.0, 1.0, 10.5, 48.25, 500.0),
                            (8.0, 6.0, 10.6, 48.2, 505.0)]


def test_open_directory_and_dispatch(tmp_path):
    from gdal_ray.sources.raster import read_raster
    xml_path, pdir, i, q = _product(tmp_path)
    px, _, _, meta = read_tsx(pdir)
    assert meta["driver"] == "TSX"
    px2, _, _, m2 = read_raster(xml_path)
    assert m2["driver"] == "TSX"
    assert np.array_equal(px, px2)
