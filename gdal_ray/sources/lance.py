"""Lance table source adapter.

BASELINE.json names Lance as the corpus storage format. The container
ships neither ``lance`` nor ``lancedb``, so this adapter routes through
whichever integration is importable, in preference order:

1. ``ray.data.read_lance`` (Ray's built-in Lance datasource — present
   in ray[data] when the ``lance`` package is installed);
2. the ``lance`` package directly (``lance.dataset(...).to_batches()``
   fed through ``ray.data.from_arrow_refs``-style streaming);
3. otherwise a clear ImportError naming the plug point — callers fall
   back to the partitioned-Parquet stand-in (sources/images.py).

``read_corpus`` is the format-agnostic entry: Lance when the path is a
``.lance`` dataset and a binding exists, Parquet otherwise — pipeline
code stays storage-neutral.
"""

from __future__ import annotations

import os


def have_lance() -> bool:
    try:
        import lance  # noqa: F401
        return True
    except ImportError:
        return False


def read_lance(uri: str, *, columns=None, **kwargs):
    """Lance dataset → ray.data.Dataset (streaming, column-pruned)."""
    import ray.data as rd

    if hasattr(rd, "read_lance"):
        try:
            return rd.read_lance(uri, columns=columns, **kwargs)
        except ImportError:
            pass  # ray datasource present but the lance pkg missing
    try:
        import lance
    except ImportError as e:
        raise ImportError(
            "no Lance binding in this environment (neither "
            "ray.data.read_lance nor the 'lance' package). Store the "
            "corpus as partitioned Parquet (sources/images.py) or "
            "install pylance on the cluster.") from e
    ds = lance.dataset(uri)
    # stream fragments through from_items of record batches — each
    # fragment reads only on its worker
    tbl = ds.to_table(columns=columns)
    return rd.from_arrow(tbl)


def read_corpus(path: str, *, columns=None, **kwargs):
    """Storage-neutral corpus read: .lance dataset dirs go through the
    Lance binding, anything else reads as (partitioned) Parquet with
    column pruning."""
    import ray.data as rd

    if path.rstrip("/").endswith(".lance") or (
            os.path.isdir(path) and os.path.isdir(
                os.path.join(path, "_versions"))):
        return read_lance(path, columns=columns, **kwargs)
    return rd.read_parquet(path, columns=columns, **kwargs)
