"""S-101 ENC reader vs the reference ogr_s101*.py fixture expectations."""

from gdal_ray.sources.s101 import read_s101, read_s101_table

D = "/root/reference/autotest/ogr/data/s101"


def props(ds, layer, i=0):
    return ds.layers[layer].features[i]["properties"]


def geom(ds, layer, i=0):
    return ds.layers[layer].features[i]["geometry"]


def test_s101_minimal():
    ds = read_s101(f"{D}/minimal.000")
    assert ds.layer_names() == []
    assert ds.metadata == {
        "APPLICATION_PROFILE": "1",
        "DATASET_EDITION": "10.0",
        "DATASET_IDENTIFIER": "file name",
        "DATASET_LANGUAGE": "EN",
        "DATASET_REFERENCE_DATE": "20260401",
        "DATASET_TITLE": "dataset title",
        "ENCODING_SPECIFICATION": "S-100 Part 10a",
        "ENCODING_SPECIFICATION_EDITION": "5.2",
        "PRODUCT_EDITION": "2.0",
        "PRODUCT_IDENTIFIER": "INT.IHO.S-101.2.0",
    }


def test_s101_point_2d_minimum():
    ds = read_s101(f"{D}/point_2d_minimum.000")
    assert ds.layer_names() == ["Point2D"]
    assert ds.layers["Point2D"].srs_authority_code == "4326"
    assert geom(ds, "Point2D") == {
        "type": "Point", "coordinates": [2.5, 49.5]}
    assert props(ds, "Point2D") == {"recordId": 1, "recordVersion": 1}


def test_s101_point_3d_minimum():
    ds = read_s101(f"{D}/point_3d_minimum.000")
    assert ds.layer_names() == ["Point3D_meanHighWaterSprings"]
    lyr = ds.layers["Point3D_meanHighWaterSprings"]
    assert lyr.srs_name == "WGS 84 + meanHighWaterSprings depth"
    assert geom(ds, lyr.name) == {
        "type": "Point", "coordinates": [2.5, 49.5, 15.5]}
    assert props(ds, lyr.name) == {"recordId": 1, "recordVersion": 1}


def test_s101_point():
    ds = read_s101(f"{D}/point.000")
    assert len(ds.layers) == 4
    assert props(ds, "informationType") == {
        "recordId": 1, "recordVersion": 1,
        "informationType": "SpatialQuality", "text": "my text"}
    assert ds.layers["Point2D"].srs_authority_code == "4326"
    assert geom(ds, "Point2D", 0) == {
        "type": "Point", "coordinates": [2.0, 49.0]}
    assert props(ds, "Point2D", 0) == {
        "infoAssociationRoleCode": None, "colour": None,
        "infoAssociationCode": None, "infoAssociationRecordId": None,
        "recordId": 1, "recordVersion": 1}
    assert geom(ds, "Point2D", 1) == {
        "type": "Point", "coordinates": [2.5, 49.5]}
    assert props(ds, "Point2D", 1) == {
        "recordId": 4, "recordVersion": 1,
        "infoAssociationRoleCode": "defines",
        "infoAssociationCode": "SpatialAssociation",
        "infoAssociationRecordId": 1, "colour": 2}
    lyr = ds.layers["Point3D_meanHighWaterSprings"]
    assert lyr.srs_name == "WGS 84 + meanHighWaterSprings depth"
    assert geom(ds, lyr.name) == {
        "type": "Point", "coordinates": [2.5, 49.5, 15.5]}
    assert props(ds, lyr.name) == {"recordId": 2, "recordVersion": 1}
    lyr = ds.layers["Point3D_approximateLowestAstronomicalTide"]
    assert lyr.srs_name == \
        "WGS 84 + approximateLowestAstronomicalTide depth"
    assert geom(ds, lyr.name) == {
        "type": "Point", "coordinates": [-2.5, -49.5, -15.5]}
    assert props(ds, lyr.name) == {
        "infoAssociationRoleCode": "defines",
        "infoAssociationCode": "SpatialAssociation",
        "recordId": 3, "recordVersion": 1, "infoAssociationRecordId": 1}


def test_s101_multipoint():
    ds = read_s101(f"{D}/multipoint.000")
    assert len(ds.layers) == 4
    assert geom(ds, "MultiPoint2D", 0) == {
        "type": "MultiPoint", "coordinates": [[2.0, 49.0], [3.0, 48.0]]}
    assert props(ds, "MultiPoint2D", 0) == {
        "infoAssociationRoleCode": None, "colour": None,
        "infoAssociationCode": None, "infoAssociationRecordId": None,
        "recordId": 1, "recordVersion": 1}
    assert geom(ds, "MultiPoint2D", 1) == {
        "type": "MultiPoint", "coordinates": [[2.5, 49.5]]}
    assert props(ds, "MultiPoint2D", 1) == {
        "recordId": 4, "recordVersion": 1,
        "infoAssociationRoleCode": "defines",
        "infoAssociationCode": "SpatialAssociation",
        "infoAssociationRecordId": 1, "colour": 2}
    lyr = ds.layers["MultiPoint3D_meanHighWaterSprings"]
    assert lyr.srs_name == "WGS 84 + meanHighWaterSprings depth"
    assert geom(ds, lyr.name) == {
        "type": "MultiPoint",
        "coordinates": [[2.5, 49.5, 15.5], [3.5, 48.5, -15.5]]}
    assert props(ds, lyr.name) == {"recordId": 2, "recordVersion": 1}
    lyr = ds.layers["MultiPoint3D_approximateLowestAstronomicalTide"]
    assert geom(ds, lyr.name) == {
        "type": "MultiPoint", "coordinates": [[-2.5, -49.5, -15.5]]}
    assert props(ds, lyr.name) == {
        "infoAssociationRoleCode": "defines",
        "infoAssociationCode": "SpatialAssociation",
        "recordId": 3, "recordVersion": 1, "infoAssociationRecordId": 1}


def test_s101_curve():
    ds = read_s101(f"{D}/curve.000")
    lyr = ds.layers["Curve"]
    assert lyr.srs_authority_code == "4326"
    assert geom(ds, "Curve", 0) == {
        "type": "LineString",
        "coordinates": [[2.0, 49.0], [2.5, 49.5], [3.0, 50.0]]}
    assert props(ds, "Curve", 0) == {
        "recordId": 1, "recordVersion": 1, "infoAssociationRecordId": 1,
        "infoAssociationCode": "SpatialAssociation",
        "infoAssociationRoleCode": "defines"}
    assert geom(ds, "Curve", 1) == {
        "type": "LineString",
        "coordinates": [[2.0, 49.0], [2.5, 49.5], [2.0, 49.0]]}
    assert props(ds, "Curve", 1) == {
        "recordId": 2, "recordVersion": 1,
        "infoAssociationRecordId": None, "infoAssociationCode": None,
        "infoAssociationRoleCode": None}
    assert len(lyr.features) == 2


def test_s101_compositecurve():
    ds = read_s101(f"{D}/compositecurve.000")
    lyr = ds.layers["CompositeCurve"]
    assert geom(ds, lyr.name, 0) == {
        "type": "LineString",
        "coordinates": [[2.0, 49.0], [3.0, 49.0], [3.0, 50.0],
                        [2.0, 50.0], [2.0, 49.0]]}
    assert props(ds, lyr.name, 0) == {
        "recordId": 1, "recordVersion": 1, "infoAssociationRecordId": 1,
        "infoAssociationCode": "SpatialAssociation",
        "infoAssociationRoleCode": "defines"}
    assert geom(ds, lyr.name, 1) == {
        "type": "LineString",
        "coordinates": [[2.0, 49.0], [2.0, 50.0], [3.0, 50.0],
                        [3.0, 49.0], [2.0, 49.0]]}
    # records 3 and 4: nested composite curve and truncated chain
    assert geom(ds, lyr.name, 2) == {
        "type": "LineString",
        "coordinates": [[2.0, 49.0], [3.0, 49.0], [3.0, 50.0]]}
    assert geom(ds, lyr.name, 3) == {
        "type": "LineString",
        "coordinates": [[2.0, 49.0], [3.0, 49.0], [3.0, 50.0]]}
    assert len(lyr.features) == 4


def test_s101_surface():
    ds = read_s101(f"{D}/surface.000")
    lyr = ds.layers["Surface"]
    assert geom(ds, "Surface") == {
        "type": "Polygon",
        "coordinates": [
            [[2.0, 49.0], [2.0, 50.0], [3.0, 50.0], [3.0, 49.0],
             [2.0, 49.0]],
            [[2.01, 49.1], [2.99, 49.1], [2.99, 49.9], [2.01, 49.9],
             [2.01, 49.1]]]}
    assert props(ds, "Surface") == {
        "recordId": 1, "recordVersion": 1, "infoAssociationRecordId": 1,
        "infoAssociationCode": "SpatialAssociation",
        "infoAssociationRoleCode": "defines"}
    assert len(lyr.features) == 1


def test_s101_information_type():
    ds = read_s101(f"{D}/information_type.000")
    assert props(ds, "informationType") == {
        "recordId": 1, "recordVersion": 1,
        "informationType": "SpatialQuality",
        "spatialAccuracy.horizontalPositionUncertainty.uncertaintyFixed":
            4.5,
        "spatialAccuracy.verticalUncertainty.uncertaintyFixed": 5.5,
        "lightSector.sectorInformation[1].language": "EN",
        "lightSector.sectorInformation[2].language": "FR",
        "lightSector.sectorInformation[1].text": "my text",
        "lightSector.sectorInformation[2].text": "mon texte",
        "lightSector.colour": [1, 2]}


def test_s101_information_type_multi_attr():
    ds = read_s101(f"{D}/information_type_multi_attr.000")
    assert props(ds, "informationType") == {
        "recordId": 1, "recordVersion": 1,
        "informationType": "SpatialQuality",
        "spatialAccuracy[1].horizontalPositionUncertainty."
        "uncertaintyFixed": 4.5,
        "spatialAccuracy[2].horizontalPositionUncertainty."
        "uncertaintyFixed": 45,
        "spatialAccuracy[1].verticalUncertainty.uncertaintyFixed": 5.5,
        "spatialAccuracy[2].verticalUncertainty.uncertaintyFixed": 55,
        "lightSector[1].sectorInformation[1].language": "EN",
        "lightSector[1].sectorInformation[2].language": "FR",
        "lightSector[1].sectorInformation[1].text": "my text",
        "lightSector[1].sectorInformation[2].text": "mon texte",
        "lightSector[1].colour": [1, 2]}


def test_s101_information_type_with_inas():
    ds = read_s101(f"{D}/information_type_with_inas.000")
    lyr = ds.layers["informationType"]
    # the reference never fills the fixed INAS subfields for IRID
    # records -- the assoc columns exist but stay NULL
    assert props(ds, lyr.name, 0) == {
        "recordId": 1, "recordVersion": 1,
        "informationType": "SpatialQuality", "text": "ATTR only",
        "infoAssociationRecordId": None, "infoAssociationCode": None,
        "infoAssociationRoleCode": None, "association_text": None}
    assert props(ds, lyr.name, 1) == {
        "recordId": 2, "recordVersion": 1,
        "informationType": "SpatialQuality", "text": None,
        "infoAssociationRecordId": None, "infoAssociationCode": None,
        "infoAssociationRoleCode": None, "association_text": None}
    assert props(ds, lyr.name, 2) == {
        "recordId": 3, "recordVersion": 1,
        "informationType": "SpatialQuality", "text": None,
        "infoAssociationRecordId": None, "infoAssociationCode": None,
        "infoAssociationRoleCode": None,
        "association_text": "INAS only"}
    assert props(ds, lyr.name, 3) == {
        "recordId": 4, "recordVersion": 1,
        "informationType": "SpatialQuality", "text": "ATTR",
        "infoAssociationRecordId": None, "infoAssociationCode": None,
        "infoAssociationRoleCode": None, "association_text": "INAS"}


def test_s101_feature():
    ds = read_s101(f"{D}/feature.000")
    assert set(ds.layer_names()) == {
        "informationType", "Point2D", "MultiPoint2D", "Curve",
        "CompositeCurve", "Surface", "FeatureType1_NoGeom",
        "FeatureType1_Point2D", "FeatureType2_MultiPoint2D",
        "FeatureType3_MultiPoint2D",
        "FeatureType4_CollectionOfMultiPoint", "FeatureType4_Line",
        "FeatureType5_MultiLine", "FeatureType6_Polygon",
        "FeatureType7_MultiPolygon"}

    assert ds.layers["FeatureType1_NoGeom"].srs_name is None
    assert props(ds, "FeatureType1_NoGeom") == {
        "recordId": 1, "recordVersion": 1, "producingAgency": 12345,
        "featureIdentificationNumber": 11,
        "featureIdentificationSubdivision": 1, "text": "my text ATTR",
        "infoAssociationRecordId": 1,
        "infoAssociationCode": "SpatialAssociation",
        "infoAssociationRoleCode": "defines",
        "infoAssociation_text": "my text INAS",
        "featureAssociationRefRecordId": 1,
        "featureAssociationRefLayerName": "FeatureType1_NoGeom",
        "featureAssociationCode": "StructureEquipment",
        "featureAssociationRoleCode": "defines",
        "featureAssociation_text": "my text FASC"}

    lyr = ds.layers["FeatureType1_Point2D"]
    assert lyr.geom_type == "Point"
    assert geom(ds, lyr.name) == {
        "type": "Point", "coordinates": [2.0, 49.0]}
    assert props(ds, lyr.name) == {
        "recordId": 2, "recordVersion": 1, "producingAgency": 12345,
        "featureIdentificationNumber": 22,
        "featureIdentificationSubdivision": 1,
        "geometryLayerName": "Point2D", "geometryRecordId": 10,
        "scaleMinimum": None, "scaleMaximum": None}

    lyr = ds.layers["FeatureType2_MultiPoint2D"]
    assert lyr.geom_type == "MultiPoint"
    assert geom(ds, lyr.name) == {
        "type": "MultiPoint", "coordinates": [[2.0, 49.0], [2.01, 49.1]]}
    assert props(ds, lyr.name) == {
        "recordId": 3, "recordVersion": 1, "producingAgency": 12345,
        "featureIdentificationNumber": 33,
        "featureIdentificationSubdivision": 1,
        "geometryLayerName": ["Point2D", "Point2D"],
        "geometryRecordId": [10, 20],
        "scaleMinimum": None, "scaleMaximum": None}

    lyr = ds.layers["FeatureType3_MultiPoint2D"]
    assert props(ds, lyr.name, 1) == {
        "recordId": 5, "recordVersion": 1, "producingAgency": 12345,
        "featureIdentificationNumber": 55,
        "featureIdentificationSubdivision": 1,
        "geometryLayerName": ["MultiPoint2D"], "geometryRecordId": [1],
        "scaleMinimum": [1000], "scaleMaximum": [2000]}
    assert geom(ds, lyr.name, 1) == {
        "type": "MultiPoint",
        "coordinates": [[-2.0, -49.0], [-2.01, -49.1]]}

    lyr = ds.layers["FeatureType4_CollectionOfMultiPoint"]
    assert lyr.geom_type == "GeometryCollection"
    assert geom(ds, lyr.name) == {
        "type": "GeometryCollection",
        "geometries": [
            {"type": "MultiPoint",
             "coordinates": [[-2.0, -49.0], [-2.01, -49.1]]},
            {"type": "MultiPoint",
             "coordinates": [[-2.0, -49.0], [-2.01, -49.1]]}]}
    assert props(ds, lyr.name) == {
        "recordId": 6, "recordVersion": 1, "producingAgency": 12345,
        "featureIdentificationNumber": 66,
        "featureIdentificationSubdivision": 1,
        "geometryLayerName": ["MultiPoint2D", "MultiPoint2D"],
        "geometryRecordId": [1, 1],
        "scaleMinimum": [1000, 3000], "scaleMaximum": [2000, 4000]}

    lyr = ds.layers["FeatureType4_Line"]
    assert [f["properties"]["geometryOrientation"]
            for f in lyr.features] == ["forward", "reverse", "forward"]
    assert geom(ds, lyr.name, 1) == {
        "type": "LineString",
        "coordinates": [[2.0, 49.0], [2.0, 50.0], [3.0, 50.0],
                        [3.0, 49.0], [2.0, 49.0]]}
    assert props(ds, lyr.name, 2)["geometryLayerName"] == \
        "CompositeCurve"

    lyr = ds.layers["FeatureType5_MultiLine"]
    assert geom(ds, lyr.name) == {
        "type": "MultiLineString",
        "coordinates": [
            [[2.0, 49.0], [3.0, 49.0], [3.0, 50.0], [2.0, 50.0],
             [2.0, 49.0]],
            [[2.01, 49.1], [2.01, 49.9], [2.99, 49.9], [2.99, 49.1],
             [2.01, 49.1]]]}
    assert props(ds, lyr.name)["geometryOrientation"] == \
        ["forward", "reverse"]

    lyr = ds.layers["FeatureType6_Polygon"]
    assert geom(ds, lyr.name) == {
        "type": "Polygon",
        "coordinates": [
            [[2.0, 49.0], [2.0, 50.0], [3.0, 50.0], [3.0, 49.0],
             [2.0, 49.0]],
            [[2.01, 49.1], [2.99, 49.1], [2.99, 49.9], [2.01, 49.9],
             [2.01, 49.1]]]}

    lyr = ds.layers["FeatureType7_MultiPolygon"]
    p = props(ds, lyr.name)
    assert p["maskLayerName"] == ["Curve", "Curve", "CompositeCurve"]
    assert p["maskRecordId"] == [1, 2, 1]
    assert p["maskIndicator"] == [
        "truncatedByDataCoverageLimit", "truncatedByDataCoverageLimit",
        "suppressPortrayal"]
    assert geom(ds, lyr.name)["type"] == "MultiPolygon"
    assert len(geom(ds, lyr.name)["coordinates"]) == 2


def test_s101_feature_multi_inas_and_fasc():
    ds = read_s101(f"{D}/feature_multi_inas_and_fasc.000")
    assert props(ds, "FeatureType1_NoGeom") == {
        "recordId": 1, "recordVersion": 1, "producingAgency": 12345,
        "featureIdentificationNumber": 11,
        "featureIdentificationSubdivision": 1,
        "text[1]": "my text ATTR", "text[2]": "my text ATTR2",
        "infoAssociationRecordId[1]": 1,
        "infoAssociationCode[1]": "SpatialAssociation",
        "infoAssociationRoleCode[1]": "defines",
        "infoAssociationRecordId[2]": 1,
        "infoAssociationCode[2]": "SpatialAssociation",
        "infoAssociationRoleCode[2]": "providesInformation",
        "infoAssociation[1]_text": "my text INAS",
        "infoAssociation[2]_text": "my text INAS2",
        "featureAssociationRefLayerName[1]": "FeatureType1_NoGeom",
        "featureAssociationRefRecordId[1]": 1,
        "featureAssociationCode[1]": "StructureEquipment",
        "featureAssociationRoleCode[1]": "defines",
        "featureAssociationRefLayerName[2]": "FeatureType1_NoGeom",
        "featureAssociationRefRecordId[2]": 1,
        "featureAssociationCode[2]": "StructureEquipment",
        "featureAssociationRoleCode[2]": "providesInformation",
        "featureAssociation[1]_text": "my text FASC",
        "featureAssociation[2]_text": "my text FASC2"}


def test_s101_table():
    t = read_s101_table(f"{D}/feature.000", "FeatureType6_Polygon")
    assert t.num_rows == 1
    assert "wkb" in t.column_names
    assert t.column("recordId").to_pylist() == [11]
    from gdal_ray.core import wkb as W
    g = W.loads(t.column("wkb")[0].as_py())
    assert g.type_name == "Polygon" and len(g.rings) == 2
