"""E57 embedded-image reader parity against the reference autotest
expectations (autotest/gdrivers/e57.py, fixtures in
autotest/gdrivers/data/e57/)."""

import numpy as np
import pytest

from gdal_ray.codecs.e57 import read_e57, jpeg_quality_estimate
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

D = "/root/reference/autotest/gdrivers/data/e57"


def test_empty_no_image():
    # test_e57_no_image: opening empty.e57 raises
    with pytest.raises(ValueError):
        read_e57(f"{D}/empty.e57")


def test_single_image():
    # test_e57_single_image expectations
    px, gt, nodata, meta = read_e57(f"{D}/fake.e57")
    assert px.shape[:2] == (20, 20)
    md = {k: meta[k] for k in meta
          if k.isupper() or k.startswith("POSE_")}
    assert md == {
        "ASSOCIATED_DATA_3D_GUID": "associatedData3DGuid",
        "NAME": "image name",
        "POSE_ROTATION_W": "rotation.w",
        "POSE_ROTATION_Z": "rotation.z",
        "POSE_TRANSLATION_X": "translation.x",
        "POSE_TRANSLATION_Y": "translation.y",
        "POSE_TRANSLATION_Z": "translation.z",
        "REPRESENTATION_TYPE": "spherical",
    }
    assert meta["image_structure"] == {"JPEG_QUALITY": "75"}
    band = px[..., 0] if px.ndim == 3 else px
    assert checksum(band) != 0
    assert meta["xml:E57"].startswith('<e57Root type="Structure"')
    # per-dataset mask: top 10 rows 255 → reference checksum 2435
    assert checksum(meta["mask"]) == 2435
    assert meta["mask"][:10].min() == 255 and meta["mask"][10:].max() == 0


def test_two_images_subdatasets():
    # test_e57_two_images expectations
    px, gt, nodata, meta = read_e57(f"{D}/fake_two_images.e57")
    assert px.size == 0
    assert meta["subdatasets"] == {
        "SUBDATASET_1_NAME": f'E57:"{D}/fake_two_images.e57":image',
        "SUBDATASET_1_DESC": "Image image (0x0)",
        "SUBDATASET_2_NAME": f'E57:"{D}/fake_two_images.e57":image2',
        "SUBDATASET_2_DESC": "Image image2 (0x0)",
    }

    with pytest.raises(ValueError):
        read_e57(f"{D}/fake_two_images.e57", subdataset="unexisting")

    px, _, _, meta = read_e57(f"{D}/fake_two_images.e57",
                              subdataset="image")
    assert px.shape[:2] == (20, 20)
    band = px[..., 0] if px.ndim == 3 else px
    assert checksum(band) != 0
    assert "mask" not in meta  # GMF_ALL_VALID in the reference
    assert meta["xml:E57"].startswith('<e57Root type="Structure"')

    # image2 is the PNG copy of byte.tif: reference checksum 4672
    px2, _, _, _ = read_e57(f"{D}/fake_two_images.e57",
                            subdataset="image2")
    assert checksum(px2 if px2.ndim == 2 else px2[..., 0]) == 4672


def test_subdataset_by_index_and_pseudo_path():
    px2, _, _, _ = read_e57(f"{D}/fake_two_images.e57", subdataset="2")
    assert checksum(px2 if px2.ndim == 2 else px2[..., 0]) == 4672
    px, _, _, meta = read_raster(
        f'E57:"{D}/fake_two_images.e57":image2')
    assert checksum(px if px.ndim == 2 else px[..., 0]) == 4672


def test_read_raster_dispatch():
    px, gt, nodata, meta = read_raster(f"{D}/fake.e57")
    assert px.shape[:2] == (20, 20)
    assert meta["NAME"] == "image name"


def test_corrupt_header_rejected():
    # flip bytes in the 48-byte header: must raise, never crash
    # (test_e57_errors shape, bounded to the header region)
    with open(f"{D}/fake.e57", "rb") as fh:
        data = bytearray(fh.read())
    import tempfile, os
    for i in (0, 5, 8, 40, 41):
        corrupted = bytearray(data)
        corrupted[i] = 255 - corrupted[i]
        with tempfile.NamedTemporaryFile(suffix=".e57", delete=False) as tf:
            tf.write(bytes(corrupted))
            name = tf.name
        try:
            with pytest.raises(Exception):
                read_e57(name)
        finally:
            os.unlink(name)


def test_jpeg_quality_estimate_roundtrip():
    from gdal_ray.codecs.jpeg import encode
    img = (np.arange(64 * 64, dtype=np.uint8).reshape(64, 64))
    for q in (50, 75, 90):
        assert jpeg_quality_estimate(encode(img, quality=q)) == q


def test_write_e57_roundtrip_png():
    import numpy as np
    import tempfile, os
    from gdal_ray.codecs.e57 import write_e57, _crc32c
    # CRC-32C check vector (RFC 3720): "123456789" -> 0xE3069283
    assert _crc32c(b"123456789") == 0xE3069283
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.e57")
        write_e57(p, img, name="testimg")
        px, gt, nd, meta = read_e57(p)
        band = px[..., 0] if px.ndim == 3 else px
        assert np.array_equal(band, img)
        assert meta["NAME"] == "testimg"
        assert meta["REPRESENTATION_TYPE"] == "visualReference"


def test_write_e57_jpeg_psnr():
    import numpy as np
    import tempfile, os
    from gdal_ray.codecs.e57 import write_e57
    y, x = np.mgrid[0:64, 0:64]
    img = ((y + 2 * x) % 256).astype(np.uint8)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.e57")
        write_e57(p, img, fmt="jpeg", jpeg_quality=90)
        px, _, _, meta = read_e57(p)
        band = (px[..., 0] if px.ndim == 3 else px).astype(np.float64)
        mse = ((band - img) ** 2).mean()
        psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-12))
        assert psnr >= 40
        assert meta["image_structure"] == {"JPEG_QUALITY": "90"}
