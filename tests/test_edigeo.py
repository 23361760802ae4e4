"""EDIGEO reader — synthetic lot following the NF Z 52000 record
grammar used by the reference driver (ogredigeodatasource.cpp)."""

import numpy as np
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources.edigeo import read_edigeo, read_edigeo_layers


def _write(path, lines):
    open(path, "w", encoding="latin1").write(
        "\n".join(lines) + "\n")


@pytest.fixture()
def lot(tmp_path):
    _write(tmp_path / "E000AB01.THF", [
        "RTYSA03:GTS",
        "LONSA04:E000",
        "GNNSA04:AB01",
        "GONSA02:S1",
        "QANSA02:Q1",
        "DINSA02:D1",
        "SCNSA02:C1",
        "GDNSA02:G1",
    ])
    _write(tmp_path / "E000S1.GEO", [
        "RTYSA03:GEO",
        "RELSA06:LAMB93",
    ])
    _write(tmp_path / "E000D1.DIC", [
        "RTYSA03:DID",
        "RIDSA08:PARCELLE",
        "LABSA08:Parcelle",
        "RTYSA03:DIA",
        "RIDSA07:SECTION",
        "LABSA07:section",
        "TYPSA01:T",
        "RTYSA03:DIA",
        "RIDSA06:NUMERO",
        "LABSA06:numero",
        "TYPSA01:T",
    ])
    _write(tmp_path / "E000C1.SCD", [
        "RTYSA03:ATT",
        "RIDSA11:SECTION_id",
        "DIPCP21:E000;D1;DIA;SECTION",
        "RTYSA03:ATT",
        "RIDSA09:NUMERO_id",
        "DIPCP20:E000;D1;DIA;NUMERO",
        "RTYSA03:OBJ",
        "RIDSA11:PARCELLE_id",
        "DIPCP22:E000;D1;DID;PARCELLE",
        "KNDSA03:SUR",
        "AAPCP22:E000;C1;ATT;SECTION_id",
        "AAPCP20:E000;C1;ATT;NUMERO_id",
    ])
    # square parcel from two arcs (second stored reversed)
    _write(tmp_path / "E000G1.VEC", [
        "RTYSA03:PAR",
        "RIDSA04:ARC1",
        "CORCC20:0.0;0.0",
        "CORCC20:10.0;0.0",
        "CORCC20:10.0;10.0",
        "RTYSA03:PAR",
        "RIDSA04:ARC2",
        "CORCC20:0.0;0.0",
        "CORCC20:0.0;10.0",
        "CORCC20:10.0;10.0",
        "RTYSA03:PFE",
        "RIDSA04:PFE1",
        "RTYSA03:FEA",
        "RIDSA04:FEA1",
        "SCPCP22:E000;C1;OBJ;PARCELLE_id",
        "ATPCP22:E000;C1;ATT;SECTION_id",
        "ATVSA03:0AB",
        "ATPCP20:E000;C1;ATT;NUMERO_id",
        "ATVSA04:0012",
        "RTYSA03:LNK",
        "RIDSA04:LNK1",
        "FTPCP18:E000;G1;PAR;ARC1",
        "FTPCP18:E000;G1;PFE;PFE1",
        "RTYSA03:LNK",
        "RIDSA04:LNK2",
        "FTPCP18:E000;G1;PAR;ARC2",
        "FTPCP18:E000;G1;PFE;PFE1",
        "RTYSA03:LNK",
        "RIDSA04:LNK3",
        "FTPCP18:E000;G1;FEA;FEA1",
        "FTPCP18:E000;G1;PFE;PFE1",
    ])
    return str(tmp_path / "E000AB01.THF")


def test_polygon_layer(lot):
    layers = read_edigeo_layers(lot)
    assert "PARCELLE_id" in layers
    t = layers["PARCELLE_id"]
    assert t.num_rows == 1
    d = t.to_pydict()
    assert d["section"] == ["0AB"]
    assert d["numero"] == ["0012"]
    g = W.loads(d["wkb_geometry"][0])
    assert "POLYGON" in g.type_name.upper()
    # the two arcs chain into the closed 10x10 square
    assert abs(abs(__import__("gdal_ray.sources.edigeo",
                              fromlist=["_ring_area"])._ring_area(
        g.rings[0])) - 100.0) < 1e-9
    assert t.schema.metadata[b"crs"].decode().startswith("+proj=lcc")


def test_read_edigeo_dispatch(lot):
    from gdal_ray.sources.drivers import read_vector
    t = read_vector(lot)
    assert t.num_rows == 1
    t2 = read_edigeo(lot, layer="PARCELLE_id")
    assert t2.num_rows == 1
    with pytest.raises(ValueError, match="no layer"):
        read_edigeo(lot, layer="nope")
