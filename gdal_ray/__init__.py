"""gdal_ray — a from-scratch Ray-Data-native geospatial data-processing engine.

Re-creates the query/data-processing capabilities of GDAL (reference:
rouault/gdal) as idiomatic Ray Data pipelines: ``ray.data.Dataset`` →
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, explicit groupby-cell shuffles for the wide steps.

Layout:
  core/       pure numpy math: geotransform, mercator/tile math, quadkey
              cells, GDAL-compatible checksum, WKB codec, geometry
              predicates, resampling kernels.
  codecs/     pure-numpy image codecs (PNG via zlib; DCT-based lossy).
  sources/    deterministic synthetic image/vector table generators +
              parquet readers (Lance stand-in: the container has no
              lancedb, so partitioned Parquet is the table format).
  stages/     Ray Data stage builders (decode, warp, tile, join, ...).
  functions/  text analysis, dedup, similarity search.
  pipelines/  end-to-end composed pipelines (flagship tile+join).
  state/      resume manifest / lineage.

Nothing in this package calls ray.init()/ray.shutdown(); sessions are
owned by bench.py / tests / the driver.
"""

__version__ = "0.1.0"
