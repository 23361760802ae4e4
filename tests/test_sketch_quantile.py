"""Sketch + quantile operators (SURVEY §2.5 'sketches/approximate' —
absent in the reference, added as the 100 TB replacement for exact
COUNT(DISTINCT)/ORDER BY percentiles) vs numpy/pandas oracles."""
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


class TestKMVSketch:
    def test_estimate_within_kmv_error(self, ray_session):
        from gdal_ray.pipelines.queries import q_approx_count_distinct
        out = q_approx_count_distinct(SF)
        exact = pq.read_table(f"{SF}/orders.parquet",
                              columns=["o_custkey"]) \
            .column("o_custkey").to_pandas().nunique()
        est = out["est"].iloc[0]
        # KMV standard error ≈ 1/sqrt(k-2); allow 4 sigma
        assert abs(est - exact) / exact < 4 / np.sqrt(62)

    def test_sketch_rows_sorted_distinct(self, ray_session):
        from gdal_ray.pipelines.queries import q_approx_count_distinct
        out = q_approx_count_distinct(SF)
        hv = (out.hv_hi.to_numpy().astype(np.uint64) * np.uint64(1 << 32)
              + out.hv_lo.to_numpy().astype(np.uint64))
        assert (np.diff(hv.astype(np.float64)) > 0).all()
        assert (out["rank"].to_numpy() == np.arange(len(out))).all()

    def test_hash_matches_direct(self, ray_session):
        """The k smallest sketch hashes equal the brute-force ones."""
        from gdal_ray.pipelines.queries import (KMV_MULT,
                                                q_approx_count_distinct)
        out = q_approx_count_distinct(SF)
        keys = pq.read_table(f"{SF}/orders.parquet",
                             columns=["o_custkey"]) \
            .column("o_custkey").to_numpy().astype(np.uint64)
        brute = np.sort(np.unique(keys * np.uint64(KMV_MULT)))[:len(out)]
        got = (out.hv_hi.to_numpy().astype(np.uint64) * np.uint64(1 << 32)
               + out.hv_lo.to_numpy().astype(np.uint64))
        assert (brute == got).all()


class TestQuantiles:
    def test_percentile_disc_semantics(self, ray_session):
        from gdal_ray.pipelines.queries import q_quantiles
        out = q_quantiles(SF)
        v = np.sort(pq.read_table(f"{SF}/lineitem.parquet",
                                  columns=["l_quantity"])
                    .column("l_quantity").to_numpy())
        n = len(v)
        for _, row in out.iterrows():
            target = (int(row.pct) * n + 99) // 100  # ceil(pct*n/100)
            assert row.v == v[target - 1]            # 1-indexed disc
            assert row.total == n
        assert out.v.is_monotonic_increasing
