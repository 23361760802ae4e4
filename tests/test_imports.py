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
