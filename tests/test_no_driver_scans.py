"""Scale-discipline enforcement (VERDICT r1 item 10): no driver-side
iteration over unbounded datasets. iter_rows is banned outright in
library code; take_all is allowed only at the known bounded-result
sites listed here (broadcast dicts, filtered single rows, final
1-row reductions, limit()-bounded samples)."""

import re
from pathlib import Path

LIB = Path(__file__).resolve().parents[1] / "gdal_ray"

# (file suffix, required nearby token) — a take_all is legal only if
# its line or the 2 lines above contain one of the bounding markers
_BOUNDED_MARKERS = ("limit(", "filter(", "take_all()[0]", "nation")


def _py_files():
    return sorted(LIB.rglob("*.py"))


def test_no_iter_rows_in_library():
    offenders = []
    for f in _py_files():
        for i, line in enumerate(f.read_text().splitlines(), 1):
            if "iter_rows" in line and not line.strip().startswith("#"):
                offenders.append(f"{f.name}:{i}")
    assert not offenders, f"driver-side row iteration found: {offenders}"


def test_take_all_only_on_bounded_results():
    offenders = []
    for f in _py_files():
        lines = f.read_text().splitlines()
        for i, line in enumerate(lines):
            if "take_all" not in line or line.strip().startswith("#"):
                continue
            ctx = "\n".join(lines[max(0, i - 2):i + 1])
            if not any(m in ctx for m in _BOUNDED_MARKERS):
                offenders.append(f"{f.name}:{i + 1}")
    assert not offenders, (
        f"take_all on potentially-unbounded dataset: {offenders} — "
        "bound it (limit/filter) or restructure as a tree reduce")


def test_no_to_pandas_on_image_corpus():
    """The image corpus must never materialize to the driver wholesale:
    no to_pandas call may appear within 3 lines of images_dataset."""
    offenders = []
    for f in _py_files():
        lines = f.read_text().splitlines()
        for i, line in enumerate(lines):
            if "images_dataset(" in line:
                ctx = "\n".join(lines[i:i + 3])
                if ".to_pandas()" in ctx and "map_batches" not in ctx:
                    offenders.append(f"{f.name}:{i + 1}")
    assert not offenders, offenders
