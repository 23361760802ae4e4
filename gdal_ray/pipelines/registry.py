"""Pipeline-step registry — the `gdal pipeline` analog.

GDAL composes CLI pipelines from registered GDALAlgorithm steps:
`gdal pipeline read in.tif ! reproject --dst-crs=EPSG:3857 ! tile ...`
(registration apps/gdalalg_raster_pipeline.cpp:165-237, dispatch
apps/gdalalg_abstract_pipeline.cpp:222-240; steps declare args via
AddArg and implement RunImpl).

Here a step is a plain function `fn(ds, **kwargs) -> Dataset`
registered under a name; a pipeline string

    "read_images n=96 ! georef ! reproject dst=EPSG:4326 ! select cols=image_id,dst_w"

is parsed into step calls chained left to right (`!` separator, the
same as GDAL's). Source steps take `ds=None`. Users extend the engine
by registering their own steps — the UDF surface on top of
``map_batches``.
"""

from __future__ import annotations

from typing import Callable

STEPS: dict[str, Callable] = {}


def register_step(name: str):
    """Decorator: register `fn(ds, **kwargs) -> Dataset` as a step."""
    def deco(fn):
        STEPS[name] = fn
        return fn
    return deco


def _coerce(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    if "," in v:
        return [s for s in v.split(",") if s]
    return v


def parse_pipeline(spec: str):
    """'step a=1 b=x ! step2 ...' → [(name, {kwargs}), ...].

    The separator is a whitespace-delimited '!' (as in `gdal pipeline`),
    so '!' inside an argument — e.g. `filter expr=w!=256` — survives."""
    import re as _re
    steps = []
    for part in _re.split(r"(?:^|\s)!(?:\s|$)", spec):
        toks = part.split()
        if not toks:
            raise ValueError("empty pipeline step")
        name, kwargs = toks[0], {}
        for tok in toks[1:]:
            if "=" not in tok:
                raise ValueError(f"step argument {tok!r} must be key=value")
            k, v = tok.split("=", 1)
            kwargs[k] = _coerce(v)
        steps.append((name, kwargs))
    return steps


def run_pipeline(spec: str, ds=None):
    """Execute a pipeline spec; returns the final step's result."""
    for name, kwargs in parse_pipeline(spec):
        fn = STEPS.get(name)
        if fn is None:
            raise ValueError(
                f"unknown step {name!r}; registered: {sorted(STEPS)}")
        ds = fn(ds, **kwargs)
    return ds


# ---------------------------------------------------------------------------
# built-in steps (the gdalalg_raster_* / gdalalg_vector_* equivalents)
# ---------------------------------------------------------------------------

@register_step("read_images")
def _read_images(ds, n: int = 128, **kw):
    from ..sources.images import images_dataset
    return images_dataset(int(n))


@register_step("read_parquet")
def _read_parquet(ds, path: str = "", cols=None, **kw):
    import ray.data as rd
    if isinstance(cols, str):
        cols = [cols]
    return rd.read_parquet(path, columns=cols)


@register_step("read_polygons")
def _read_polygons(ds, n: int = 40, **kw):
    from ..sources.vector import polygons_dataset
    return polygons_dataset(int(n))


@register_step("georef")
def _georef(ds, **kw):
    from ..stages.georef import with_georef
    return ds.map_batches(with_georef, batch_format="pyarrow")


@register_step("reproject")
def _reproject(ds, src: str = "EPSG:3857", dst: str = "EPSG:4326",
               resampling: str = "bilinear", concurrency: int = 4, **kw):
    from ..stages.warp import ReprojectImages
    return ds.map_batches(
        ReprojectImages,
        fn_constructor_kwargs={"src_crs": src, "dst_crs": dst,
                               "resampling": resampling},
        concurrency=int(concurrency), batch_format="pyarrow")


@register_step("tiles")
def _tiles(ds, z: int | None = None, resampling: str = "bilinear", **kw):
    from .tiles import build_base_tiles
    return build_base_tiles(ds, None if z is None else int(z),
                            resampling=resampling)


@register_step("filter")
def _filter(ds, expr: str = "", **kw):
    """Attribute filter on a simple `col op literal` expression."""
    import pyarrow.compute as pc
    kernels = {"<": "less", "<=": "less_equal", ">": "greater",
               ">=": "greater_equal", "==": "equal", "!=": "not_equal"}
    for sym in sorted(kernels, key=len, reverse=True):
        if sym in expr:
            col, lit = expr.split(sym, 1)
            col, lit = col.strip(), _coerce(lit.strip())
            kern = getattr(pc, kernels[sym])
            return ds.map_batches(
                lambda t, c=col, k=kern, v=lit: t.filter(k(t[c], v)),
                batch_format="pyarrow")
    raise ValueError(f"cannot parse filter expression {expr!r}")


@register_step("select")
def _select(ds, cols=None, **kw):
    if isinstance(cols, str):
        cols = [cols]
    return ds.select_columns(list(cols))


@register_step("limit")
def _limit(ds, n: int = 10, **kw):
    return ds.limit(int(n))


@register_step("sort")
def _sort(ds, by: str = "", desc: bool = False, **kw):
    keys = by if isinstance(by, list) else [by]
    return ds.sort(keys, descending=bool(desc))


@register_step("spatial_sort")
def _spatial_sort(ds, z: int = 8, **kw):
    """Hilbert-style locality sort on interleaved-bit cell ids (the
    FlatGeobuf packed-R-tree idea, ogr/ogrsf_frmts/flatgeobuf/
    packedrtree.h:78): each row gets ONE representative cell (its
    envelope center) so cardinality is preserved, then sort by it."""
    import numpy as np
    import pyarrow as pa
    from ..core import mercator as merc

    def rep_cell(b: pa.Table) -> pa.Table:
        cx = (b["minx"].to_numpy() + b["maxx"].to_numpy()) * 0.5
        cy = (b["miny"].to_numpy() + b["maxy"].to_numpy()) * 0.5
        zz = int(z)
        n = 2 ** zz
        tx, ty = merc.meters_to_tile(cx, cy, zz)
        tx = np.clip(tx, 0, n - 1)
        ty = np.clip(ty, 0, n - 1)
        cells = merc.cell_id(zz, tx, merc.tms_to_xyz(ty, zz))
        return b.append_column("cell", pa.array(cells.view(np.int64),
                                                pa.int64()))

    return ds.map_batches(rep_cell, batch_format="pyarrow").sort("cell")


@register_step("write_parquet")
def _write_parquet(ds, path: str = "", **kw):
    ds.write_parquet(path)
    return ds


@register_step("contour")
def _contour(ds, levels="64,128,192", **kw):
    from ..core.contour import contour_lines
    import numpy as np
    import pyarrow as pa
    from ..stages.raster_ops import image_op
    lv = [float(v) for v in (levels if isinstance(levels, list)
                             else [levels])]

    def ctr(px, row):
        lines = contour_lines(px[:, :, 0].astype(np.float64), lv)
        total = sum(float(np.hypot(np.diff(l[:, 0]), np.diff(l[:, 1])).sum())
                    for _, l in lines)
        return {"n_lines": len(lines), "total_len": total}

    return ds.map_batches(image_op(ctr), batch_format="pyarrow")


@register_step("footprint")
def _footprint(ds, threshold: int = 100, **kw):
    import numpy as np
    from ..core.geom import area
    from ..core.rastervec import footprint
    from ..stages.raster_ops import image_op

    def fp(px, row):
        g = footprint((px[:, :, 0].astype(np.int64) > int(threshold))
                      .astype(np.int64), nodata=0)
        return {"fp_area": float(area(g)) if g is not None else 0.0}

    return ds.map_batches(image_op(fp), batch_format="pyarrow")


@register_step("vector_sql")
def _vector_sql(ds, query: str = "", **kw):
    """Run an OGR-SQL statement; the FROM table name binds to the
    incoming dataset."""
    from ..functions.sql import execute_sql, parse_select
    table = parse_select(query)["table"]
    return execute_sql(query, {table: ds})
