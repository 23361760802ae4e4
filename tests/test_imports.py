"""Every gdal_ray module imports cleanly (catches syntax/import rot in
rarely-exercised corners)."""

import importlib
import pkgutil

import gdal_ray


def test_all_modules_import():
    failures = []
    for m in pkgutil.walk_packages(gdal_ray.__path__,
                                   prefix="gdal_ray."):
        try:
            importlib.import_module(m.name)
        except Exception as e:     # pragma: no cover
            failures.append((m.name, repr(e)))
    assert not failures, failures


def test_lance_adapter_plug_point(ray_session, tmp_path):
    """Lance adapter: parquet fallback works; a missing lance binding
    raises the documented ImportError (not an AttributeError)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest
    from gdal_ray.sources.lance import have_lance, read_corpus, read_lance

    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"a": np.arange(10)}), p)
    ds = read_corpus(p, columns=["a"])
    assert ds.count() == 10
    if not have_lance():
        with pytest.raises(ImportError, match="Lance binding"):
            read_lance(str(tmp_path / "x.lance"))
