"""OGR SQL dialect vs DuckDB running the identical statements on the
identical data — the exact-oracle pattern at unit scale."""

import duckdb
import pyarrow as pa
import numpy as np
import pandas as pd
import pytest

from gdal_ray.functions.sql import execute_sql, parse_select


@pytest.fixture(scope="module")
def data(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(42)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 7, n),
        "cat": rng.choice(["a", "b", "c"], n),
        "v": np.round(rng.normal(100, 25, n), 3),
        "w": rng.integers(1, 50, n),
        "name": [f"item{i:05d}" for i in range(n)],
    })
    return rd.from_pandas(df).repartition(8), df


STATEMENTS = [
    "SELECT name, v FROM t WHERE v > 120 AND w < 10",
    "SELECT name, v * w AS total FROM t WHERE cat = 'a' ORDER BY total DESC, name LIMIT 15",
    "SELECT DISTINCT cat FROM t",
    "SELECT k, COUNT(*) AS n, SUM(v) AS sv, MIN(v) AS mn, MAX(v) AS mx "
    "FROM t GROUP BY k ORDER BY k",
    "SELECT cat, AVG(v) AS av FROM t WHERE w BETWEEN 5 AND 20 "
    "GROUP BY cat ORDER BY cat",
    "SELECT COUNT(*) AS n FROM t",
    "SELECT SUM(v * w) AS dot FROM t WHERE k IN (1, 3, 5)",
    "SELECT name FROM t WHERE name LIKE 'item0000_' ORDER BY name",
    "SELECT k, MAX(v) - MIN(v) AS spread FROM t GROUP BY k ORDER BY k",
    "SELECT name, v FROM t WHERE NOT (v >= 60 AND v <= 140) "
    "ORDER BY v LIMIT 25",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


class TestVsDuckdb:
    @pytest.mark.parametrize("sql", STATEMENTS,
                             ids=[s[:40] for s in STATEMENTS])
    def test_matches(self, data, sql):
        ds, df = data
        got = canon(execute_sql(sql, {"t": ds}))
        con = duckdb.connect()
        con.register("t", df)
        want = canon(con.execute(sql).df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestErrors:
    def test_unknown_table(self, data):
        with pytest.raises(ValueError, match="unknown table"):
            execute_sql("SELECT k FROM missing", {"t": data[0]})

    def test_unknown_column(self, data):
        with pytest.raises(Exception):
            execute_sql("SELECT nope FROM t", {"t": data[0]})

    def test_parse_errors(self):
        for bad in ("SELECT FROM t", "SELECT a FROM", "SELECT a t",
                    "SELECT a FROM t WHERE", "FROM t SELECT a"):
            with pytest.raises(ValueError):
                parse_select(bad)


class TestZeroRowAggregates:
    def test_global_agg_empty_returns_one_row(self, data):
        ds, df = data
        sql = ("SELECT COUNT(*) AS n, SUM(v) AS sv, MIN(v) AS mn, "
               "AVG(v) AS av FROM t WHERE v > 1000000")
        got = execute_sql(sql, {"t": ds})
        con = duckdb.connect(); con.register("t", df)
        want = con.execute(sql).df()
        assert len(got) == 1 == len(want)
        assert got["n"].iloc[0] == 0 == want["n"].iloc[0]
        assert pd.isna(got["sv"].iloc[0]) and pd.isna(want["sv"].iloc[0])
        assert pd.isna(got["mn"].iloc[0]) and pd.isna(got["av"].iloc[0])

    def test_grouped_agg_empty_returns_zero_rows(self, data):
        ds, df = data
        sql = "SELECT k, COUNT(*) AS n FROM t WHERE v > 1000000 GROUP BY k"
        got = execute_sql(sql, {"t": ds})
        assert len(got) == 0


# ---------------------------------------------------------------------------
# property-based fuzz: random statements vs DuckDB
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_num_col = st.sampled_from(["v", "w", "k"])
_cmp_op = st.sampled_from(["<", "<=", ">", ">=", "=", "<>"])


@st.composite
def _where(draw):
    clauses = []
    for _ in range(draw(st.integers(1, 3))):
        c = draw(_num_col)
        op = draw(_cmp_op)
        lit = round(draw(st.floats(-10, 200)), 2)
        clauses.append(f"{c} {op} {lit}")
    joiner = draw(st.sampled_from([" AND ", " OR "]))
    return joiner.join(clauses)


class TestFuzzVsDuckdb:
    @settings(max_examples=40, deadline=None)
    @given(_where(), st.lists(st.sampled_from(
        ["k", "cat", "v", "w", "name", "v * w", "v + k", "w - k"]),
        min_size=1, max_size=4, unique=True))
    def test_scalar_queries(self, data, where, items):
        ds, df = data
        sel = ", ".join(f"{it} AS c{i}" for i, it in enumerate(items))
        sql = f"SELECT {sel} FROM t WHERE {where}"
        got = canon(execute_sql(sql, {"t": ds}))
        con = duckdb.connect()
        con.register("t", df)
        want = canon(con.execute(sql).df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    @settings(max_examples=40, deadline=None)
    @given(_where(),
           st.lists(st.sampled_from(["k", "cat"]), min_size=0, max_size=2,
                    unique=True),
           st.lists(st.sampled_from(
               ["COUNT(*)", "SUM(w)", "MIN(v)", "MAX(v)", "AVG(v)",
                "SUM(v * w)", "COUNT(w)"]),
               min_size=1, max_size=4, unique=True))
    def test_aggregate_queries(self, data, where, group, aggs):
        ds, df = data
        sel_items = group + [f"{a} AS a{i}" for i, a in enumerate(aggs)]
        sql = f"SELECT {', '.join(sel_items)} FROM t WHERE {where}"
        if group:
            sql += f" GROUP BY {', '.join(group)}"
        got = canon(execute_sql(sql, {"t": ds}))
        con = duckdb.connect()
        con.register("t", df)
        want = canon(con.execute(sql).df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      atol=1e-6)


class TestCountDistinctHaving:
    CASES = [
        "SELECT k, COUNT(DISTINCT cat) AS nc FROM t GROUP BY k ORDER BY k",
        "SELECT COUNT(DISTINCT k) AS nk FROM t WHERE v > 100",
        "SELECT cat, COUNT(*) AS n, COUNT(DISTINCT k) AS nk FROM t "
        "GROUP BY cat HAVING COUNT(*) > 1500 ORDER BY cat",
        "SELECT k, SUM(w) AS sw FROM t GROUP BY k "
        "HAVING SUM(w) > 17000 AND COUNT(*) > 600 ORDER BY k",
        "SELECT COUNT(DISTINCT cat) AS nc FROM t WHERE v > 1000000",
    ]

    @pytest.mark.parametrize("sql", CASES, ids=[c[:45] for c in CASES])
    def test_matches_duckdb(self, data, sql):
        ds, df = data
        got = canon(execute_sql(sql, {"t": ds}))
        con = duckdb.connect()
        con.register("t", df)
        want = canon(con.execute(sql).df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestJoinStddevOffset:
    """Round-2 dialect extensions: LEFT/INNER JOIN (ogr_gensql.cpp:
    1521-1542), STDDEV_POP/STDDEV_SAMP (ogr_swq.h:67-75), OFFSET."""

    def _tabs(self):
        import ray.data as rd
        import pandas as pd
        orders = pd.DataFrame({"ok": [1, 2, 3, 4], "ck": [10, 10, 20, 99],
                               "amt": [5.0, 7.0, 11.0, 1.0]})
        cust = pd.DataFrame({"ck": [10, 20], "seg": ["A", "B"]})
        return {"orders": rd.from_pandas(orders),
                "customer": rd.from_pandas(cust)}

    def test_left_join_keeps_unmatched(self, ray_session):
        from gdal_ray.functions.sql import execute_sql
        out = execute_sql(
            "SELECT ok, seg FROM orders LEFT JOIN customer "
            "ON orders.ck = customer.ck ORDER BY ok", self._tabs())
        assert len(out) == 4
        assert out["seg"].isna().sum() == 1     # ck=99 unmatched

    def test_inner_join_drops_unmatched(self, ray_session):
        from gdal_ray.functions.sql import execute_sql
        out = execute_sql(
            "SELECT ok FROM orders JOIN customer ON orders.ck = customer.ck",
            self._tabs())
        assert sorted(out["ok"]) == [1, 2, 3]

    def test_join_grouped_agg(self, ray_session):
        from gdal_ray.functions.sql import execute_sql
        out = execute_sql(
            "SELECT seg, SUM(amt) AS s FROM orders JOIN customer "
            "ON orders.ck = customer.ck GROUP BY seg ORDER BY seg",
            self._tabs())
        assert out["s"].tolist() == [12.0, 11.0]

    def test_stddev(self, ray_session):
        import numpy as np
        from gdal_ray.functions.sql import execute_sql
        out = execute_sql(
            "SELECT STDDEV_POP(amt) AS sp, STDDEV_SAMP(amt) AS ss "
            "FROM orders", self._tabs())
        vals = np.array([5.0, 7.0, 11.0, 1.0])
        assert abs(out["sp"][0] - vals.std()) < 1e-9
        assert abs(out["ss"][0] - vals.std(ddof=1)) < 1e-9

    def test_offset(self, ray_session):
        from gdal_ray.functions.sql import execute_sql
        out = execute_sql(
            "SELECT ok FROM orders ORDER BY ok LIMIT 2 OFFSET 1",
            self._tabs())
        assert out["ok"].tolist() == [2, 3]

    def test_stddev_single_row_samp_null(self, ray_session):
        import pandas as pd
        from gdal_ray.functions.sql import execute_sql
        out = execute_sql(
            "SELECT STDDEV_SAMP(amt) AS ss FROM orders WHERE ok = 1",
            self._tabs())
        assert pd.isna(out["ss"][0])


class TestExtensionHooks:
    """§2.12 user-extension surface: registered SQL scalar functions
    (swq_custom_func_registrar analog) + built-ins."""

    def test_builtin_scalars(self, ray_session):
        import ray.data as rd
        import pandas as pd
        from gdal_ray.functions.sql import execute_sql
        t = {"t": rd.from_pandas(pd.DataFrame(
            {"a": [1.234, -5.678], "s": ["x", "Yy"]}))}
        out = execute_sql(
            "SELECT ROUND(a, 1) AS r, ABS(a) AS ab, UPPER(s) AS u, "
            "LENGTH(s) AS n FROM t", t)
        assert out["r"].tolist() == [1.2, -5.7]
        assert out["u"].tolist() == ["X", "YY"]
        assert out["n"].tolist() == [1, 2]

    def test_round_of_aggregate(self, ray_session):
        import ray.data as rd
        import pandas as pd
        from gdal_ray.functions.sql import execute_sql
        t = {"t": rd.from_pandas(pd.DataFrame({"a": [1.111, 2.222]}))}
        out = execute_sql("SELECT ROUND(SUM(a), 2) AS s FROM t", t)
        assert out["s"][0] == 3.33

    def test_custom_function_reaches_workers(self, ray_session):
        import ray.data as rd
        import pandas as pd
        from gdal_ray.functions.sql import execute_sql, register_sql_function
        register_sql_function("TRIPLE_IT", lambda v: v * 3)
        t = {"t": rd.from_pandas(pd.DataFrame({"a": [2.0, 4.0]}))}
        out = execute_sql("SELECT TRIPLE_IT(a) AS d FROM t "
                          "WHERE TRIPLE_IT(a) > 7", t)
        assert out["d"].tolist() == [12.0]

    def test_pixel_function_registration(self):
        import numpy as np
        from gdal_ray.stages.raster_ops import (pixel_function,
                                                register_pixel_function)
        register_pixel_function("half_sum",
                                lambda bands: np.sum(bands, axis=0) / 2.0)
        px = np.stack([np.full((4, 4), 10), np.full((4, 4), 30)],
                      axis=2).astype(np.uint8)
        out = pixel_function(px, "half_sum")
        assert float(out[0, 0]) == 20.0
        import pytest
        with pytest.raises(TypeError):
            register_pixel_function("bad", 42)


class TestSqliteDialect:
    """SQLITE dialect (ogrsqliteexecutesql.cpp analog): full SQLite
    expressiveness over materialized layers."""

    def test_subquery_and_case_matches_pandas(self, data):
        from gdal_ray.functions.sql import execute_sql_sqlite
        ds, df = data
        sql = ("SELECT cat, COUNT(*) AS n, "
               "CAST(SUM(CASE WHEN v > 100 THEN 1 ELSE 0 END) AS BIGINT)"
               " AS hi FROM t WHERE k IN (SELECT DISTINCT k FROM t WHERE"
               " w > 45) GROUP BY cat ORDER BY cat")
        out = execute_sql_sqlite(sql, {"t": ds})
        keep = df[df.k.isin(df[df.w > 45].k.unique())]
        want = (keep.groupby("cat")
                .agg(n=("v", "size"), hi=("v", lambda s: (s > 100).sum()))
                .reset_index().sort_values("cat").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            out.astype({"n": "int64", "hi": "int64"}),
            want.astype({"n": "int64", "hi": "int64"}))

    def test_window_function(self, data):
        """Window functions — beyond both the native dialect AND the
        oracle intersection; sqlite executes them directly."""
        from gdal_ray.functions.sql import execute_sql_sqlite
        ds, df = data
        sql = ("SELECT name, v, RANK() OVER (PARTITION BY cat ORDER BY"
               " v DESC) AS r FROM t WHERE w = 1 ORDER BY name")
        out = execute_sql_sqlite(sql, {"t": ds})
        sub = df[df.w == 1].copy()
        sub["r"] = sub.groupby("cat")["v"].rank(
            method="min", ascending=False).astype(int)
        want = sub.sort_values("name")[["name", "v", "r"]] \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(out.astype({"r": "int64"}), want)

    def test_unreferenced_layers_not_loaded(self, data):
        from gdal_ray.functions.sql import execute_sql_sqlite

        class Boom:
            def iter_batches(self, **kw):
                raise AssertionError("unreferenced layer was materialized")

        ds, df = data
        out = execute_sql_sqlite("SELECT COUNT(*) AS n FROM t",
                                 {"t": ds, "other": Boom()})
        assert out["n"][0] == len(df)


def test_concat_substr_functions(ray_session):
    """SWQ_CONCAT / SWQ_SUBSTR (1-based, ogr/ogr_swq.h:63-64)."""
    import pyarrow as pa
    import ray.data as rd
    from gdal_ray.functions.sql import execute_sql

    t = rd.from_arrow(pa.table({"name": ["alpha", "bx", "gamma"],
                                "k": [1, 2, 3]}))
    out = execute_sql(
        "SELECT k, CONCAT(SUBSTR(name, 1, 2), '-', k) AS tag FROM t "
        "ORDER BY k", {"t": t})
    assert list(out["tag"]) == ["al-1", "bx-2", "ga-3"]
    # SUBSTR without length reads to the end; start beyond end -> ''
    out = execute_sql("SELECT k, SUBSTR(name, 3) AS s FROM t ORDER BY k",
                      {"t": t})
    assert list(out["s"]) == ["pha", "", "mma"]


def test_order_by_unselected_column(ray_session):
    """ogr_gensql.cpp sorts on layer fields even when unselected."""
    import pyarrow as pa
    import ray.data as rd
    from gdal_ray.functions.sql import execute_sql

    t = rd.from_arrow(pa.table({"name": ["c", "a", "b"], "k": [3, 1, 2]}))
    out = execute_sql("SELECT name FROM t ORDER BY k DESC", {"t": t})
    assert list(out.columns) == ["name"]
    assert list(out["name"]) == ["c", "b", "a"]


def test_unlimited_scan_streams_as_dataset(ray_session):
    """`SELECT *` over a many-block layer with as_dataset=True returns
    the lazy mapped Dataset: rows stream block-by-block, nothing is
    pulled to the driver (the 100 TB scan path)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ray.data import Dataset
    from gdal_ray.functions.sql import execute_sql

    n = 50_000
    t = rd.from_arrow(pa.table({"k": np.arange(n, dtype=np.int64),
                                "v": np.arange(n, dtype=np.float64) * 0.5})) \
        .repartition(16)
    out = execute_sql("SELECT k, v * 2 AS v2 FROM t WHERE k >= 10", {"t": t},
                      as_dataset=True)
    assert isinstance(out, Dataset)
    total, vsum = 0, 0.0
    for b in out.iter_batches(batch_format="pyarrow"):
        total += b.num_rows
        vsum += float(np.sum(b["v2"].to_numpy()))
    assert total == n - 10
    assert vsum == float(np.arange(10, n).sum())
    # reduced shapes still come back as (wrapped) bounded results
    agg = execute_sql("SELECT SUM(k) AS s FROM t", {"t": t}, as_dataset=True)
    assert isinstance(agg, Dataset)
    assert agg.to_pandas()["s"].iloc[0] == float(np.arange(n).sum())


def test_join_broadcast_size_guard(ray_session, monkeypatch):
    """A JOIN side above JOIN_BROADCAST_LIMIT refuses to broadcast
    instead of OOMing every worker."""
    import pyarrow as pa
    import pytest
    import ray.data as rd
    from gdal_ray.functions import sql as sqlmod

    t = rd.from_arrow(pa.table({"k": [1, 2, 3], "v": [10, 20, 30]}))
    j = rd.from_arrow(pa.table({"k": [1, 2, 3], "name": ["a", "b", "c"]}))
    monkeypatch.setattr(sqlmod, "JOIN_BROADCAST_LIMIT", 2)
    with pytest.raises(ValueError, match="too large to broadcast"):
        sqlmod.execute_sql(
            "SELECT t.k, name FROM t JOIN j ON t.k = j.k",
            {"t": t, "j": j})
    monkeypatch.setattr(sqlmod, "JOIN_BROADCAST_LIMIT", 1000)
    out = sqlmod.execute_sql(
        "SELECT t.k, name FROM t JOIN j ON t.k = j.k ORDER BY k",
        {"t": t, "j": j})
    assert list(out["name"]) == ["a", "b", "c"]


class TestSubqueries:
    """IN (SELECT ...) + postfix NOT — beyond OGR SQL (swq has no
    subqueries; the SQLite dialect does)."""

    def _tables(self):
        import pandas as pd
        import ray.data as rd
        orders = rd.from_pandas(pd.DataFrame(
            {"o_id": range(20), "cust": [i % 5 for i in range(20)],
             "amt": [i * 10.0 for i in range(20)]}))
        cust = rd.from_pandas(pd.DataFrame(
            {"c_id": range(5),
             "tier": ["gold", "silver", "gold", "bronze", "gold"]}))
        return {"orders": orders, "cust": cust}

    def test_in_subquery(self, ray_session):
        r = execute_sql(
            "SELECT o_id FROM orders WHERE cust IN "
            "(SELECT c_id FROM cust WHERE tier = 'gold') ORDER BY o_id",
            self._tables())
        assert r["o_id"].tolist() == [i for i in range(20)
                                      if i % 5 in (0, 2, 4)]

    def test_not_in_subquery(self, ray_session):
        r = execute_sql(
            "SELECT o_id FROM orders WHERE cust NOT IN "
            "(SELECT c_id FROM cust WHERE tier = 'gold') ORDER BY o_id",
            self._tables())
        assert r["o_id"].tolist() == [i for i in range(20)
                                      if i % 5 in (1, 3)]

    def test_postfix_not_between_like(self, ray_session):
        r = execute_sql(
            "SELECT o_id FROM orders WHERE amt NOT BETWEEN 50 AND 150 "
            "AND cust NOT IN (1, 3) ORDER BY o_id", self._tables())
        assert r["o_id"].tolist() == [
            i for i in range(20)
            if not (50 <= i * 10 <= 150) and i % 5 not in (1, 3)]
        r2 = execute_sql(
            "SELECT tier FROM cust WHERE tier NOT LIKE 'g%' ORDER BY tier",
            self._tables())
        assert r2["tier"].tolist() == ["bronze", "silver"]

    def test_subquery_feeds_aggregate(self, ray_session):
        r = execute_sql(
            "SELECT COUNT(*) AS n, SUM(amt) AS s FROM orders WHERE cust "
            "IN (SELECT c_id FROM cust WHERE tier <> 'gold')",
            self._tables())
        assert r["n"].iloc[0] == 8 and r["s"].iloc[0] == 760.0

    def test_multi_column_subquery_rejected(self, ray_session):
        import pytest as _pytest
        with _pytest.raises(ValueError, match="exactly one"):
            execute_sql("SELECT o_id FROM orders WHERE cust IN "
                        "(SELECT c_id, tier FROM cust)", self._tables())


class TestCaseExpression:
    """CASE WHEN — searched + simple forms, in scans, aggregates, and
    as a computed GROUP BY key (beyond swq; SQLite dialect parity)."""

    def _orders(self):
        import pandas as pd
        import ray.data as rd
        return {"orders": rd.from_pandas(pd.DataFrame(
            {"o_id": range(20),
             "status": ["F" if i % 3 == 0 else "O" for i in range(20)],
             "amt": [i * 10.0 for i in range(20)]}))}

    def test_searched_case_scan(self, ray_session):
        r = execute_sql(
            "SELECT o_id, CASE WHEN amt > 150 THEN 'big' WHEN amt > 50 "
            "THEN 'mid' ELSE 'small' END AS bucket FROM orders "
            "ORDER BY o_id", self._orders())
        assert r["bucket"].tolist()[:8] == ["small"] * 6 + ["mid"] * 2
        assert r["bucket"].tolist()[-1] == "big"

    def test_simple_case(self, ray_session):
        r = execute_sql(
            "SELECT o_id, CASE status WHEN 'F' THEN 1 ELSE 0 END AS "
            "is_f FROM orders ORDER BY o_id LIMIT 6", self._orders())
        assert r["is_f"].tolist() == [1, 0, 0, 1, 0, 0]

    def test_case_inside_aggregate(self, ray_session):
        r = execute_sql(
            "SELECT status, SUM(CASE WHEN amt > 100 THEN 1 ELSE 0 END) "
            "AS n_big FROM orders GROUP BY status ORDER BY status",
            self._orders())
        assert r["n_big"].tolist() == [3, 6]

    def test_computed_group_by_key(self, ray_session):
        r = execute_sql(
            "SELECT CASE WHEN amt > 100 THEN 'hi' ELSE 'lo' END AS b, "
            "COUNT(*) AS n, SUM(amt) AS total FROM orders GROUP BY b "
            "ORDER BY b", self._orders())
        assert r["n"].tolist() == [9, 11]
        assert r["total"].tolist() == [1350.0, 550.0]

    def test_no_else_gives_null(self, ray_session):
        r = execute_sql(
            "SELECT o_id, CASE WHEN amt > 150 THEN 1 END AS flag "
            "FROM orders ORDER BY o_id", self._orders())
        import numpy as _np
        assert _np.isnan(r["flag"].iloc[0]) and r["flag"].iloc[-1] == 1.0

    def test_malformed_case(self, ray_session):
        import pytest as _pytest
        with _pytest.raises(ValueError, match="THEN|END|WHEN"):
            execute_sql("SELECT CASE WHEN amt > 1 1 END FROM orders",
                        self._orders())


class TestCast:
    def test_cast_forms(self, ray_session):
        import pandas as pd
        import ray.data as rd
        t = {"t": rd.from_pandas(pd.DataFrame(
            {"a": [1.6, 2.4, -3.5], "b": ["7", "8", "9"]}))}
        r = execute_sql(
            "SELECT CAST(a AS INTEGER) AS ai, CAST(b AS DOUBLE) AS bd, "
            "CAST(a AS VARCHAR) AS astr FROM t", t)
        assert r["ai"].tolist() == [2, 2, -4]    # banker's round like numpy
        assert r["bd"].tolist() == [7.0, 8.0, 9.0]
        assert r["astr"].tolist() == ["1.6", "2.4", "-3.5"]

    def test_cast_in_aggregate(self, ray_session):
        import pandas as pd
        import ray.data as rd
        t = {"t": rd.from_pandas(pd.DataFrame({"b": ["7", "8", "9"]}))}
        r = execute_sql("SELECT SUM(CAST(b AS DOUBLE)) AS s FROM t", t)
        assert r["s"].iloc[0] == 24.0


class TestArrowFastPath:
    """The no-join/no-UDF scan evaluates directly on pyarrow batches
    (_eval_arrow); assert parity with the pandas evaluator including
    null corners."""

    def _table(self):
        return pa.table({
            "a": pa.array([1, 2, 3, None, 5], pa.int64()),
            "s": pa.array(["ax", "bx", None, "cx", "zebra"]),
            "f": pa.array([0.5, -1.5, 2.5, 3.5, None])})

    def test_parity_with_pandas_eval(self):
        from gdal_ray.functions.sql import _arrow_ok, _eval_arrow, _eval
        t = self._table()
        df = t.to_pandas()
        exprs = [
            ("bin", "+", ("col", "a"), ("lit", 2)),
            ("bin", "/", ("col", "a"), ("lit", 2)),
            ("case", None,
             [((("bin", ">", ("col", "f"), ("lit", 0))), ("lit", "pos"))],
             ("lit", "neg")),
            ("like", ("col", "s"), ("lit", "%x")),
            ("in_set", ("col", "a"), [1, 5]),
            ("between", ("col", "f"), ("lit", 0), ("lit", 3)),
            ("cast", ("col", "f"), "INTEGER"),
            ("isnull", ("col", "s")),
            ("not", ("isnull", ("col", "s"))),
        ]
        for e in exprs:
            assert _arrow_ok(e), e
            av = _eval_arrow(e, t)
            av = av.to_pandas() if hasattr(av, "to_pandas") else av
            pv = _eval(e, df)
            a_list = list(np.asarray(av))
            p_list = list(np.asarray(pv))
            for x, y in zip(a_list, p_list):
                same = (pd.isna(x) and pd.isna(y)) or str(x) == str(y) \
                    or (isinstance(x, (int, float))
                        and isinstance(y, (int, float))
                        and abs(float(x) - float(y)) < 1e-12)
                assert same, (e[0], a_list, p_list)

    def test_udf_and_join_fall_back(self):
        from gdal_ray.functions.sql import _arrow_ok
        assert not _arrow_ok(("func", "myudf", [("col", "a")]))
        assert not _arrow_ok(("in_sub", ("col", "a"), {"table": "x"}))

    def test_scan_results_unchanged(self, ray_session):
        import ray.data as rd
        from gdal_ray.functions.sql import execute_sql
        df = pd.DataFrame({"a": np.arange(100),
                           "s": ["even", "odd"] * 50,
                           "f": np.linspace(-1, 1, 100)})
        ds = rd.from_pandas(df).repartition(4)
        q = ("SELECT a, f * 2 AS f2, CASE WHEN f > 0 THEN 'p' ELSE 'n' "
             "END AS sgn FROM t WHERE s LIKE 'ev%' AND f BETWEEN -0.5 "
             "AND 0.5 ORDER BY a LIMIT 10")
        res = execute_sql(q, {"t": ds})
        assert list(res.columns) == ["a", "f2", "sgn"]
        assert len(res) == 10
        assert (res["a"] % 2 == 0).all()
        assert ((res["f2"].abs() <= 1.0 + 1e-9)).all()
        assert set(res["sgn"]) <= {"p", "n"}
