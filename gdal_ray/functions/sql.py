"""OGR SQL dialect — a single-table SELECT engine over Ray Datasets.

Reference semantics: the OGR SQL engine (`ogr/ogr_swq.h` grammar,
`ogr/ogrsf_frmts/generic/ogr_gensql.cpp` execution): SELECT list with
arithmetic and AVG/MIN/MAX/COUNT/SUM aggregates (ogr_swq.h:67-75),
DISTINCT (SWQM_DISTINCT_LIST :320), WHERE with AND/OR/NOT/IN/BETWEEN/
LIKE (swq_op_registrar.cpp), ORDER BY multi-key (:400-407), LIMIT
(:479-483). OGR's dialect has *global-only* aggregates; we add GROUP BY
(free on Ray) as the natural superset.

Compilation is Ray-Data-first:
  * WHERE / projections → vectorized pyarrow.compute inside map_batches;
  * aggregates → per-batch PARTIALS (sum/count/min/max per group)
    combined driver-side — grouped results are assumed small, the scan
    is the big side and it streams;
  * DISTINCT → per-batch dedup partial + driver-side final;
  * ORDER BY + LIMIT → per-batch partial top-k; ORDER BY alone sorts
    the (already reduced) result driver-side.

The DuckDB correctness oracle runs the *same SQL string* — the dialect
is intersection-compatible by construction.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<num>\d+\.\d*(?:[eE][-+]?\d+)?|\.\d+|\d+)
    | (?P<str>'(?:[^']|'')*')
    | (?P<id>[A-Za-z_][A-Za-z_0-9]*)
    | (?P<op><=|>=|<>|!=|=|<|>|\(|\)|,|\*|/|\+|-|\.)
    )""", re.VERBOSE)

_KEYWORDS = {"SELECT", "DISTINCT", "FROM", "WHERE", "GROUP", "BY",
             "ORDER", "LIMIT", "OFFSET", "AS", "AND", "OR", "NOT", "IN",
             "BETWEEN", "LIKE", "ASC", "DESC", "IS", "NULL", "HAVING",
             "JOIN", "LEFT", "INNER", "ON"}
_AGGS = {"MIN", "MAX", "SUM", "AVG", "COUNT", "STDDEV_POP", "STDDEV_SAMP"}

# scalar function registry — built-ins + the user-extension hook
# (swq_custom_func_registrar, ogr/ogr_swq.h:126,418)
_SQL_FUNCS = {
    "ROUND": lambda v, nd=0: np.round(np.asarray(v, dtype=np.float64),
                                      int(nd)),
    "ABS": lambda v: np.abs(v),
    "SQRT": lambda v: np.sqrt(np.asarray(v, dtype=np.float64)),
    "FLOOR": lambda v: np.floor(np.asarray(v, dtype=np.float64)),
    "CEIL": lambda v: np.ceil(np.asarray(v, dtype=np.float64)),
    "UPPER": lambda v: pd.Series(np.asarray(v, dtype=object)).astype(str)
        .str.upper().to_numpy(),
    "LOWER": lambda v: pd.Series(np.asarray(v, dtype=object)).astype(str)
        .str.lower().to_numpy(),
    "LENGTH": lambda v: pd.Series(np.asarray(v, dtype=object)).astype(str)
        .str.len().to_numpy(),
    "COALESCE": lambda *vs: np.where(
        pd.isna(np.asarray(vs[0], dtype=object)),
        vs[1] if len(vs) > 1 else None, vs[0]),
    # SWQ_CONCAT / SWQ_SUBSTR (ogr/ogr_swq.h:63-64); SUBSTR is 1-based
    # like the reference (and DuckDB)
    "CONCAT": lambda *vs: _str_concat(*vs),
    "SUBSTR": lambda v, start, n=None: _substr(v, start, n),
}


def _str_concat(*vs):
    out = pd.Series(np.asarray(vs[0], dtype=object)).astype(str)
    for v in vs[1:]:
        if np.ndim(v) == 0:
            out = out + str(v)
        else:
            out = out + pd.Series(np.asarray(v, dtype=object)).astype(str)
    return out.to_numpy()


def _substr(v, start, n=None):
    s = pd.Series(np.asarray(v, dtype=object)).astype(str)
    b = int(start) - 1
    out = s.str.slice(b, None if n is None else b + int(n))
    return out.to_numpy()


def register_sql_function(name: str, fn) -> None:
    """Register a scalar SQL function callable(*column_values) usable
    in any expression of the dialect."""
    if not callable(fn):
        raise TypeError("sql function must be callable")
    _SQL_FUNCS[name.upper()] = fn


def tokenize(sql: str):
    out, i = [], 0
    while i < len(sql):
        m = _TOKEN_RE.match(sql, i)
        if not m:
            if sql[i:].strip() == "":
                break
            raise ValueError(f"SQL tokenize error at {i}: {sql[i:i+12]!r}")
        i = m.end()
        if m.group("num") is not None:
            v = m.group("num")
            out.append(("num", float(v) if ("." in v or "e" in v.lower())
                        else int(v)))
        elif m.group("str") is not None:
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("id") is not None:
            w = m.group("id")
            out.append(("kw", w.upper()) if w.upper() in _KEYWORDS
                       or w.upper() in _AGGS else ("id", w))
        else:
            out.append(("op", m.group("op")))
    out.append(("end", ""))
    return out


class _P:
    def __init__(self, toks):
        self.t = toks
        self.i = 0

    def peek(self):
        return self.t[self.i]

    def next(self):
        tok = self.t[self.i]
        self.i += 1
        return tok

    def accept(self, kind, val=None):
        k, v = self.t[self.i]
        if k == kind and (val is None or v == val):
            self.i += 1
            return v
        return None

    def expect(self, kind, val=None):
        got = self.accept(kind, val)
        if got is None:
            raise ValueError(f"SQL parse error near {self.t[self.i]}: "
                             f"expected {val or kind}")
        return got


# AST: ("col", name) ("lit", v) ("bin", op, l, r) ("agg", fn, expr|"*")
# ("not", e) ("in", e, [lits]) ("between", e, lo, hi) ("like", e, pat)

def _parse_or(p):
    l = _parse_and(p)
    while p.accept("kw", "OR"):
        l = ("bin", "OR", l, _parse_and(p))
    return l


def _parse_and(p):
    l = _parse_not(p)
    while p.accept("kw", "AND"):
        l = ("bin", "AND", l, _parse_not(p))
    return l


def _parse_not(p):
    if p.accept("kw", "NOT"):
        return ("not", _parse_not(p))
    return _parse_cmp(p)


def _parse_cmp(p):
    l = _parse_add(p)
    k, v = p.peek()
    if k == "op" and v in ("=", "<>", "!=", "<", "<=", ">", ">="):
        p.next()
        return ("bin", v, l, _parse_add(p))
    negate = False
    if p.peek() == ("kw", "NOT"):
        # postfix negation: x NOT IN (...) / NOT LIKE / NOT BETWEEN
        nk, nv = p.t[p.i + 1] if p.i + 1 < len(p.t) else (None, None)
        if nk == "kw" and nv in ("IN", "BETWEEN", "LIKE"):
            p.next()
            negate = True

    def _maybe_not(node):
        return ("not", node) if negate else node

    if p.accept("kw", "IN"):
        p.expect("op", "(")
        if p.peek() == ("kw", "SELECT"):
            # IN (SELECT ...) subquery — beyond the reference's OGR SQL
            # (its dialect has no subqueries; the SQLite dialect does);
            # resolved to a broadcast value set at execution
            sub = _parse_select_body(p)
            p.expect("op", ")")
            return _maybe_not(("in_sub", l, sub))
        lits = [_parse_add(p)]
        while p.accept("op", ","):
            lits.append(_parse_add(p))
        p.expect("op", ")")
        return _maybe_not(("in", l, lits))
    if p.accept("kw", "BETWEEN"):
        lo = _parse_add(p)
        p.expect("kw", "AND")
        return _maybe_not(("between", l, lo, _parse_add(p)))
    if p.accept("kw", "LIKE"):
        return _maybe_not(("like", l, _parse_add(p)))
    if p.accept("kw", "IS"):
        neg = p.accept("kw", "NOT") is not None
        p.expect("kw", "NULL")
        node = ("isnull", l)
        return ("not", node) if neg else node
    return l


def _parse_add(p):
    l = _parse_mul(p)
    while True:
        k, v = p.peek()
        if k == "op" and v in ("+", "-"):
            p.next()
            l = ("bin", v, l, _parse_mul(p))
        else:
            return l


def _parse_mul(p):
    l = _parse_atom(p)
    while True:
        k, v = p.peek()
        if k == "op" and v in ("*", "/"):
            p.next()
            l = ("bin", v, l, _parse_atom(p))
        else:
            return l


def _parse_atom(p):
    k, v = p.peek()
    if k == "num" or k == "str":
        p.next()
        return ("lit", v)
    if k == "op" and v == "-":
        p.next()
        return ("bin", "*", ("lit", -1), _parse_atom(p))
    if k == "op" and v == "(":
        p.next()
        e = _parse_or(p)
        p.expect("op", ")")
        return e
    if k == "kw" and v in _AGGS:
        p.next()
        p.expect("op", "(")
        if v == "COUNT" and p.accept("op", "*"):
            p.expect("op", ")")
            return ("agg", "COUNT", "*")
        if v == "COUNT" and p.accept("kw", "DISTINCT"):
            inner = _parse_add(p)
            p.expect("op", ")")
            return ("agg", "COUNTD", inner)
        inner = _parse_add(p)
        p.expect("op", ")")
        return ("agg", v, inner)
    if k == "id" and v.upper() == "CAST":
        nk, nv = p.t[p.i + 1] if p.i + 1 < len(p.t) else ("end", "")
        if nk == "op" and nv == "(":
            p.next()
            p.next()
            inner = _parse_add(p)
            p.expect("kw", "AS")
            ty = p.expect("id").upper()
            p.expect("op", ")")
            return ("cast", inner, ty)
    if k == "id" and v.upper() == "CASE":
        # CASE [operand] WHEN a THEN b ... [ELSE e] END — both the
        # searched and the simple form (swq has neither; DuckDB and the
        # SQLite dialect do, and the oracle strings run in both)
        p.next()

        def _kw(word):
            kk, vv = p.peek()
            if kk == "id" and vv.upper() == word:
                p.next()
                return True
            return False

        operand = None
        if not (p.peek()[0] == "id" and p.peek()[1].upper() == "WHEN"):
            operand = _parse_add(p)
        whens = []
        while _kw("WHEN"):
            cond = _parse_or(p)
            if not _kw("THEN"):
                raise ValueError("CASE missing THEN")
            whens.append((cond, _parse_add(p)))
        els = _parse_add(p) if _kw("ELSE") else None
        if not _kw("END"):
            raise ValueError("CASE missing END")
        if not whens:
            raise ValueError("CASE with no WHEN branches")
        return ("case", operand, whens, els)
    if k == "id":
        nk, nv = p.t[p.i + 1] if p.i + 1 < len(p.t) else ("end", "")
        if nk == "op" and nv == "(" and v.upper() in _SQL_FUNCS:
            p.next()
            p.next()
            args = [_parse_add(p)]
            while p.accept("op", ","):
                args.append(_parse_add(p))
            p.expect("op", ")")
            return ("func", v.upper(), args)
        p.next()
        if p.accept("op", "."):
            # qualified reference tbl.col: the qualifier attributes JOIN
            # keys to their table; outside ON clauses it resolves to the
            # bare column (the merged frame keeps original names)
            col = p.expect("id")
            return ("qcol", v, col)
        return ("col", v)
    raise ValueError(f"SQL parse error at token {p.peek()}")


def parse_select(sql: str) -> dict:
    p = _P(tokenize(sql))
    q = _parse_select_body(p)
    p.expect("end")
    return q


def _parse_select_body(p: "_P") -> dict:
    """SELECT statement from an open token stream (also entered
    recursively for IN (SELECT ...) subqueries, which stop at the
    closing parenthesis)."""
    p.expect("kw", "SELECT")
    distinct = p.accept("kw", "DISTINCT") is not None
    items = []
    while True:
        # full predicate level: select items may be boolean expressions
        # (comparisons, IN / IN (SELECT ...), LIKE, BETWEEN)
        e = _parse_or(p)
        alias = None
        if p.accept("kw", "AS"):
            alias = p.expect("id")
        items.append((e, alias))
        if not p.accept("op", ","):
            break
    p.expect("kw", "FROM")
    table = p.expect("id")
    joins = []
    while True:
        if p.accept("kw", "LEFT"):
            p.expect("kw", "JOIN")
            how = "left"
        elif p.accept("kw", "INNER"):
            p.expect("kw", "JOIN")
            how = "inner"
        elif p.accept("kw", "JOIN"):
            how = "inner"
        else:
            break
        jt = p.expect("id")
        p.expect("kw", "ON")
        on = _parse_or(p)
        joins.append((jt, how, on))
    where = group = having = None
    order, limit = [], None
    if p.accept("kw", "WHERE"):
        where = _parse_or(p)
    if p.accept("kw", "GROUP"):
        p.expect("kw", "BY")
        group = [p.expect("id")]
        while p.accept("op", ","):
            group.append(p.expect("id"))
    if p.accept("kw", "HAVING"):
        having = _parse_or(p)
    if p.accept("kw", "ORDER"):
        p.expect("kw", "BY")
        while True:
            col = p.expect("id")
            desc = False
            if p.accept("kw", "DESC"):
                desc = True
            else:
                p.accept("kw", "ASC")
            order.append((col, desc))
            if not p.accept("op", ","):
                break
    offset = 0
    if p.accept("kw", "LIMIT"):
        limit = int(p.expect("num"))
        if p.accept("kw", "OFFSET"):
            offset = int(p.expect("num"))
    return {"distinct": distinct, "items": items, "table": table,
            "joins": joins, "where": where, "group": group,
            "having": having, "order": order, "limit": limit,
            "offset": offset}


# ---------------------------------------------------------------------------
# expression evaluation over a pandas frame (vectorized)
# ---------------------------------------------------------------------------

def _eval(e, df: pd.DataFrame, funcs: dict | None = None):
    kind = e[0]
    if kind == "lit":
        return e[1]
    if kind == "col":
        if e[1] not in df.columns:
            raise ValueError(f"unknown column {e[1]!r}")
        return df[e[1]]
    if kind == "qcol":
        if e[2] not in df.columns:
            raise ValueError(f"unknown column {e[1]}.{e[2]}")
        return df[e[2]]
    if kind == "func":
        reg = funcs if funcs is not None else _SQL_FUNCS
        args = [_eval(x, df, funcs) for x in e[2]]
        return reg[e[1]](*args)
    if kind == "isnull":
        v = _eval(e[1], df, funcs)
        return pd.isna(v)
    if kind == "not":
        return ~_eval(e[1], df, funcs).astype(bool)
    if kind == "in":
        v = _eval(e[1], df, funcs)
        lits = [_eval(x, df, funcs) for x in e[2]]
        return pd.Series(v).isin(lits).to_numpy()
    if kind == "in_set":
        return pd.Series(_eval(e[1], df, funcs)).isin(e[2]).to_numpy()
    if kind == "cast":
        v = _eval(e[1], df, funcs)
        ty = e[2]
        if ty in ("BIGINT", "INTEGER", "INT", "SMALLINT"):
            return pd.Series(v).astype("float64").round().astype("Int64") \
                if not np.isscalar(v) else int(round(float(v)))
        if ty in ("DOUBLE", "FLOAT", "REAL", "NUMERIC", "DECIMAL"):
            return pd.Series(v).astype("float64") if not np.isscalar(v) \
                else float(v)
        if ty in ("VARCHAR", "TEXT", "STRING", "CHAR"):
            return pd.Series(v).astype(str) if not np.isscalar(v) else str(v)
        raise ValueError(f"unsupported CAST type {ty}")
    if kind == "case":
        operand, whens, els = e[1], e[2], e[3]
        n = len(df)
        conds, vals = [], []
        for w, t in whens:
            cn = ("bin", "=", operand, w) if operand is not None else w
            conds.append(np.broadcast_to(
                np.asarray(_eval(cn, df, funcs), bool), n))
            val = _eval(t, df, funcs)
            vals.append(np.broadcast_to(np.asarray(val), n))
        if els is not None:
            dv = _eval(els, df, funcs)
            default = np.broadcast_to(np.asarray(dv), n)
        else:
            default = np.broadcast_to(np.asarray(np.nan), n)
        return np.select(conds, vals, default=default)
    if kind == "in_sub":
        raise ValueError("IN (SELECT ...) reached the evaluator "
                         "unresolved — execute via execute_sql()")
    if kind == "between":
        v = _eval(e[1], df, funcs)
        return (v >= _eval(e[2], df, funcs)) & (v <= _eval(e[3], df, funcs))
    if kind == "like":
        v = pd.Series(_eval(e[1], df, funcs)).astype(str)
        # re.escape leaves % and _ unescaped (py>=3.7), so map them
        pat = re.escape(str(_eval(e[2], df, funcs))).replace("%", ".*").replace("_", ".")
        return v.str.fullmatch(pat).fillna(False).to_numpy()
    if kind == "bin":
        op = e[1]
        l = _eval(e[2], df, funcs)
        r = _eval(e[3], df, funcs)
        if op == "AND":
            return np.asarray(l, bool) & np.asarray(r, bool)
        if op == "OR":
            return np.asarray(l, bool) | np.asarray(r, bool)
        if op == "=":
            return l == r
        if op in ("<>", "!="):
            return l != r
        return {"<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
                ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
                "+": lambda a, b: a + b, "-": lambda a, b: a - b,
                "*": lambda a, b: a * b, "/": lambda a, b: a / b}[op](l, r)
    raise ValueError(f"bad expression node {e}")


# ---------------------------------------------------------------------------
# Arrow-native expression evaluation — the zero-copy fast path for the
# no-join, no-UDF scan subset. At 100 TB the per-batch to_pandas()
# round-trip is the scan stage's main cost; these kernels evaluate the
# common SQL surface directly on the pyarrow batch. _eval above stays
# the semantic definition (and the fallback for UDFs / joins / any
# batch the Arrow path cannot type).
# ---------------------------------------------------------------------------

_ARROW_NODES = {"lit", "col", "qcol", "isnull", "not", "in", "in_set",
                "between", "like", "bin", "cast", "case"}


def _arrow_ok(e) -> bool:
    """True when the expression tree uses only Arrow-evaluable nodes
    (no Python UDFs, no unresolved subqueries, no aggregates)."""
    if not isinstance(e, tuple):
        return True
    if e[0] not in _ARROW_NODES:
        return False
    for part in e[1:]:
        if isinstance(part, tuple):
            if not _arrow_ok(part):
                return False
        elif isinstance(part, list):
            for x in part:
                if isinstance(x, tuple) and len(x) == 2 \
                        and not isinstance(x[0], str):
                    # case WHEN pairs
                    if not (_arrow_ok(x[0]) and _arrow_ok(x[1])):
                        return False
                elif not _arrow_ok(x):
                    return False
    return True


def _aw_bool(v):
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return v if pa.types.is_boolean(v.type) else pc.cast(v, pa.bool_())
    return bool(v)


def _eval_arrow(e, t: pa.Table):
    """Evaluate an expression on a pyarrow batch → Array / scalar."""
    kind = e[0]
    if kind == "lit":
        return e[1]
    if kind == "col":
        if e[1] not in t.column_names:
            raise ValueError(f"unknown column {e[1]!r}")
        return t[e[1]]
    if kind == "qcol":
        if e[2] not in t.column_names:
            raise ValueError(f"unknown column {e[1]}.{e[2]}")
        return t[e[2]]
    if kind == "isnull":
        return pc.is_null(_eval_arrow(e[1], t))
    if kind == "not":
        return pc.invert(_aw_bool(_eval_arrow(e[1], t)))
    if kind in ("in", "in_set"):
        v = _eval_arrow(e[1], t)
        vals = e[2] if kind == "in_set" \
            else [_eval_arrow(x, t) for x in e[2]]
        return pc.is_in(v, value_set=pa.array(list(vals)))
    if kind == "between":
        v = _eval_arrow(e[1], t)
        # null inputs yield False, matching the pandas evaluator
        return pc.fill_null(
            pc.and_kleene(pc.greater_equal(v, _eval_arrow(e[2], t)),
                          pc.less_equal(v, _eval_arrow(e[3], t))), False)
    if kind == "like":
        v = pc.cast(_eval_arrow(e[1], t), pa.string())
        # pandas path yields False for null inputs (fillna) — match it
        return pc.fill_null(
            pc.match_like(v, str(_eval_arrow(e[2], t))), False)
    if kind == "cast":
        v = _eval_arrow(e[1], t)
        ty = e[2]
        if ty in ("BIGINT", "INTEGER", "INT", "SMALLINT"):
            return pc.cast(pc.round(pc.cast(v, pa.float64())), pa.int64())
        if ty in ("DOUBLE", "FLOAT", "REAL", "NUMERIC", "DECIMAL"):
            return pc.cast(v, pa.float64())
        if ty in ("VARCHAR", "TEXT", "STRING", "CHAR"):
            return pc.cast(v, pa.string())
        raise ValueError(f"unsupported CAST type {ty}")
    if kind == "case":
        operand, whens, els = e[1], e[2], e[3]
        res = _eval_arrow(els, t) if els is not None else None
        for w, v in reversed(whens):
            cn = ("bin", "=", operand, w) if operand is not None else w
            # a null condition is "not true": the ELSE applies (both
            # SQL semantics and the pandas evaluator's np.select)
            cond = pc.fill_null(_aw_bool(_eval_arrow(cn, t)), False)
            val = _eval_arrow(v, t)
            if res is None:
                ty = val.type if isinstance(
                    val, (pa.Array, pa.ChunkedArray)) else pa.scalar(val).type
                res = pc.if_else(cond, val, pa.scalar(None, ty))
            else:
                res = pc.if_else(cond, val, res)
        return res
    if kind == "bin":
        op = e[1]
        l = _eval_arrow(e[2], t)
        r = _eval_arrow(e[3], t)
        if op == "AND":
            return pc.and_kleene(_aw_bool(l), _aw_bool(r))
        if op == "OR":
            return pc.or_kleene(_aw_bool(l), _aw_bool(r))
        cmps = {"=": pc.equal, "<>": pc.not_equal, "!=": pc.not_equal,
                "<": pc.less, "<=": pc.less_equal,
                ">": pc.greater, ">=": pc.greater_equal}
        if op in cmps:
            return cmps[op](l, r)
        if op == "/":                    # true division (pandas parity)
            def f64(x):
                return pc.cast(x, pa.float64()) if isinstance(
                    x, (pa.Array, pa.ChunkedArray)) else float(x)
            return pc.divide(f64(l), f64(r))
        return {"+": pc.add, "-": pc.subtract,
                "*": pc.multiply}[op](l, r)
    raise ValueError(f"bad expression node {e}")


def _expr_name(e) -> str:
    if e[0] == "col":
        return e[1]
    if e[0] == "qcol":
        return e[2]
    if e[0] == "func":
        return f"{e[1].lower()}({', '.join(_expr_name(x) for x in e[2])})"
    if e[0] == "lit":
        return str(e[1])
    if e[0] == "agg":
        inner = "*" if e[2] == "*" else _expr_name(e[2])
        return f"{e[1].lower()}({inner})"
    if e[0] == "bin":
        return f"({_expr_name(e[2])} {e[1]} {_expr_name(e[3])})"
    return "expr"


def _collect_aggs(e, found: list):
    if not isinstance(e, tuple):
        return
    if e[0] == "agg":
        found.append(e)
        return
    for part in e[1:]:
        if isinstance(part, tuple):
            _collect_aggs(part, found)
        elif isinstance(part, list):
            for q in part:
                _collect_aggs(q, found)


# A broadcast join side must fit in every worker's heap. OGR's own JOIN
# is a secondary-layer lookup (small side by construction); above this
# row count we refuse rather than silently OOM the cluster — co-shuffle
# both sides by the key instead (stages/join.py patterns).
JOIN_BROADCAST_LIMIT = 5_000_000


def _join_spec(q, tables):
    """Materialize secondary join tables (OGR JOIN semantics: the
    secondary layer is the lookup side, ogr_gensql.cpp:1521-1542 probes
    it per primary feature — here it broadcasts once and each batch
    does a vectorized merge). Returns [(df, how, left_key, right_key)]."""
    specs = []
    for jt, how, on in q.get("joins") or []:
        if jt not in tables:
            raise ValueError(f"unknown join table {jt!r}")
        n_join = tables[jt].count()
        if n_join > JOIN_BROADCAST_LIMIT:
            raise ValueError(
                f"JOIN table {jt!r} has {n_join} rows — too large to "
                f"broadcast (limit {JOIN_BROADCAST_LIMIT}). Co-shuffle "
                "both sides by the join key instead (gdal_ray.stages."
                "join), or raise gdal_ray.functions.sql.JOIN_BROADCAST_LIMIT.")
        jdf = tables[jt].to_pandas()
        if not (isinstance(on, tuple) and on[0] == "bin" and on[1] == "="
                and on[2][0] in ("col", "qcol") and on[3][0] in ("col", "qcol")):
            raise ValueError("JOIN ON must be column = column")

        def side(node):
            # (column, qualifier-or-None)
            return (node[2], node[1]) if node[0] == "qcol" else (node[1], None)

        (a, qa), (b, qb) = side(on[2]), side(on[3])
        if qa == jt or (qb is not None and qb != jt):
            lk, rk = b, a
        elif qb == jt or (qa is not None and qa != jt):
            lk, rk = a, b
        elif b in jdf.columns and a not in jdf.columns:
            lk, rk = a, b
        elif a in jdf.columns and b not in jdf.columns:
            lk, rk = b, a
        else:
            raise ValueError(f"cannot attribute JOIN keys {a}/{b} — "
                             "qualify them (table.column)")
        specs.append((jdf, how, lk, rk))
    return specs


def _apply_joins(df: pd.DataFrame, specs) -> pd.DataFrame:
    for jdf, how, lk, rk in specs:
        if lk == rk:
            df = df.merge(jdf, on=lk, how=how)
        else:
            df = df.merge(jdf, left_on=lk, right_on=rk, how=how)
    return df


def execute_sql(sql: str, tables: dict, as_dataset: bool = False):
    """Run a SELECT against {'name': ray Dataset}; returns a pandas
    DataFrame (results are the reduced side).

    ``as_dataset=True`` returns a ``ray.data.Dataset`` instead. For a
    plain scan with no DISTINCT/ORDER BY/LIMIT the result is the lazy
    mapped Dataset itself — NOTHING is materialized on the driver, the
    scan streams block-by-block no matter how large the layer is (the
    100 TB `SELECT *` path). Reduced results (aggregates, top-k, offset
    slices) are bounded by construction and come back wrapped."""
    return _execute_ast(parse_select(sql), tables, as_dataset)


def _resolve_subqueries(node, tables):
    """Replace ("in_sub", e, subselect) nodes with ("in_set", e, values):
    the subquery runs first (uncorrelated, like the SQLite dialect's
    materialized sub-selects) and its single output column broadcasts
    as a membership set, bounded by JOIN_BROADCAST_LIMIT."""
    if isinstance(node, list):
        # list-valued AST fields (CASE whens, IN literal lists) carry
        # tuple children too — recurse element-wise
        return [_resolve_subqueries(x, tables) for x in node]
    if not isinstance(node, tuple):
        return node
    if node[0] == "in_sub":
        sub = _execute_ast(node[2], tables, False)
        if len(sub.columns) != 1:
            raise ValueError("IN (SELECT ...) must select exactly one "
                             f"column, got {list(sub.columns)}")
        if len(sub) > JOIN_BROADCAST_LIMIT:
            raise ValueError(
                f"IN subquery returned {len(sub)} rows — too large to "
                f"broadcast (limit {JOIN_BROADCAST_LIMIT})")
        vals = sub.iloc[:, 0].dropna().unique().tolist()
        return ("in_set", _resolve_subqueries(node[1], tables), vals)
    return tuple(_resolve_subqueries(x, tables) if isinstance(x, (tuple, list))
                 else x for x in node)


def _execute_ast(q: dict, tables: dict, as_dataset: bool = False):
    if q["table"] not in tables:
        raise ValueError(f"unknown table {q['table']!r}")
    ds = tables[q["table"]]
    join_specs = _join_spec(q, tables)
    q = dict(q)
    q["items"] = [(_resolve_subqueries(e, tables), a)
                  for e, a in q["items"]]
    for key in ("where", "having"):
        if q.get(key) is not None:
            q[key] = _resolve_subqueries(q[key], tables)

    aggs: list = []
    for e, _ in q["items"]:
        _collect_aggs(e, aggs)
    if q.get("having") is not None:
        _collect_aggs(q["having"], aggs)
    has_aggs = bool(aggs)

    where = q["where"]

    if has_aggs or q["group"]:
        res = _run_aggregate(q, ds, join_specs)
        return _wrap_ds(res) if as_dataset else res

    keep = (q["limit"] + q.get("offset", 0)) if q["limit"] is not None else None
    # custom scalar functions registered on the driver must reach the
    # workers: ship a snapshot in the closure and merge on first use
    fsnap = dict(_SQL_FUNCS)

    # Arrow fast path eligibility, decided once: no joins, every
    # referenced expression evaluable by _eval_arrow
    use_arrow = (not join_specs
                 and all(_arrow_ok(e) for e, _ in q["items"])
                 and (where is None or _arrow_ok(where)))

    def scan_arrow(t: pa.Table) -> pa.Table:
        if where is not None:
            mask = _aw_bool(_eval_arrow(where, t))
            t = t.filter(mask)           # nulls drop, like the bool mask
        cols: dict = {}
        for e, alias in q["items"]:
            name = alias or _expr_name(e)
            v = _eval_arrow(e, t)
            if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                v = pa.array([v] * t.num_rows, type=pa.scalar(v).type)
            cols[name] = v
        if q["order"] and not q["distinct"]:
            for c, _ in q["order"]:
                if c not in cols and c in t.column_names:
                    cols[f"__ob_{c}"] = t[c]
        out = pa.table(cols)
        if q["distinct"]:
            out = out.group_by(out.column_names).aggregate([])
        if q["order"] and keep is not None:
            out = out.sort_by([
                (_ob_key_t(out, c), "descending" if d else "ascending")
                for c, d in q["order"]]).slice(0, keep)
        elif keep is not None:
            out = out.slice(0, keep)
        return out

    # plain scan: filter + project per batch, optional partial top-k
    def scan(t: pa.Table) -> pa.Table:
        if use_arrow:
            try:
                return scan_arrow(t)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                    pa.ArrowTypeError):
                pass                     # type corner: pandas decides
        df = t.to_pandas()
        if join_specs:
            df = _apply_joins(df, join_specs)
        if where is not None:
            df = df[np.asarray(_eval(where, df, fsnap), bool)]
        out = pd.DataFrame(index=df.index)
        for e, alias in q["items"]:
            name = alias or _expr_name(e)
            out[name] = _eval(e, df, fsnap)
        # ORDER BY may reference source columns that are not selected
        # (ogr_gensql.cpp sorts on the layer's fields): carry them as
        # hidden keys, dropped after the final sort. DISTINCT forbids
        # hidden keys (they would change row identity).
        if q["order"] and not q["distinct"]:
            for c, _ in q["order"]:
                if c not in out.columns and c in df.columns:
                    out[f"__ob_{c}"] = df[c]
        if q["distinct"]:
            out = out.drop_duplicates()
        if q["order"] and keep is not None:
            # partial top-(limit+offset): every globally-surviving row
            # survives its batch partial
            out = out.sort_values([_ob_key(out, c) for c, _ in q["order"]],
                                  ascending=[not d for _, d in q["order"]]) \
                .head(keep)
        elif keep is not None:
            out = out.head(keep)
        return pa.Table.from_pandas(out, preserve_index=False)

    mapped = ds.map_batches(scan, batch_format="pyarrow")
    if as_dataset and q["limit"] is None and not q.get("offset", 0):
        # identity-sized outputs stay distributed: plain scans stream,
        # DISTINCT runs the exact-dedup shuffle (content-hash salted
        # buckets), un-LIMITed ORDER BY is a Ray range-partition sort.
        # Only top-k / aggregates / OFFSET slices come to the driver.
        out_ds = mapped
        if q["distinct"]:
            out_ds = _distinct_ds(out_ds)
        if q["order"]:
            item_names = [a or _expr_name(e) for e, a in q["items"]]
            keys = [c if c in item_names else f"__ob_{c}"
                    for c, _ in q["order"]]
            out_ds = out_ds.sort(keys,
                                 descending=[d for _, d in q["order"]])
            if any(k.startswith("__ob_") for k in keys):
                out_ds = out_ds.map_batches(
                    lambda t: t.drop_columns(
                        [c for c in t.column_names
                         if c.startswith("__ob_")]),
                    batch_format="pyarrow")
        return out_ds
    res = mapped.to_pandas()
    if len(res) == 0:
        # typed empty result (Ray may drop all-empty block schemas)
        res = pd.DataFrame(
            columns=[a or _expr_name(e) for e, a in q["items"]])
        return _wrap_ds(res) if as_dataset else res
    if q["distinct"]:
        res = res.drop_duplicates()
    if q["order"]:
        res = res.sort_values([_ob_key(res, c) for c, _ in q["order"]],
                              ascending=[not d for _, d in q["order"]])
    res = res[[c for c in res.columns if not c.startswith("__ob_")]]
    off = q.get("offset", 0)
    if q["limit"] is not None:
        res = res.iloc[off:off + q["limit"]]
    elif off:
        res = res.iloc[off:]
    res = res.reset_index(drop=True)
    return _wrap_ds(res) if as_dataset else res


def _wrap_ds(df: pd.DataFrame):
    import ray.data as rd
    return rd.from_pandas(df)


def _distinct_ds(ds):
    """SELECT DISTINCT as a shuffle, not a driver frame: content-hash
    every row (all columns), salt-bucket the hash so identical rows
    co-locate, and drop duplicates per bucket with pandas. The full
    result never lands on one machine."""
    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.to_pandas(), index=False).to_numpy().astype(np.uint64)
        b = ((h * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) \
            % np.uint64(128)
        return t.append_column("__bucket",
                               pa.array(b.astype(np.int64), pa.int64()))

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns="__bucket").drop_duplicates()

    return ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(dedup, batch_format="pandas")


def _ob_key(frame, col):
    return col if col in frame.columns else f"__ob_{col}"


def _ob_key_t(t: pa.Table, col):
    return col if col in t.column_names else f"__ob_{col}"


def _run_aggregate(q, ds, join_specs=()) -> pd.DataFrame:
    """Partial-per-batch grouped aggregation; final combine driver-side."""
    where = q["where"]
    group = q["group"] or []
    aggs: list = []
    for e, _ in q["items"]:
        _collect_aggs(e, aggs)
    if q.get("having") is not None:
        _collect_aggs(q["having"], aggs)   # HAVING may use aggregates
        # that are not in the select list
    # unique partial slots: (fn, input-name)
    slots = []
    for a in aggs:
        key = (a[1], "*" if a[2] == "*" else _expr_name(a[2]))
        if key not in [s[0] for s in slots]:
            slots.append((key, a))

    fsnap = dict(_SQL_FUNCS)
    # GROUP BY may name a computed select alias (GROUP BY bucket where
    # bucket = CASE ... END) — resolve those through the select list
    alias_map = {(alias or _expr_name(e)): e for e, alias in q["items"]}

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if join_specs:
            df = _apply_joins(df, join_specs)
        if where is not None:
            df = df[np.asarray(_eval(where, df, fsnap), bool)]
        work = pd.DataFrame(index=df.index)
        for k in group:
            if k in df.columns:
                work[k] = df[k]
            elif k in alias_map:
                work[k] = _eval(alias_map[k], df, fsnap)
            else:
                raise ValueError(f"unknown GROUP BY column {k!r}")
        for (fn, nm), a in slots:
            base = f"{fn}:{nm}"
            if fn == "COUNT" and a[2] == "*":
                work[base + ":n"] = 1
            else:
                work[base + ":v"] = _eval(a[2], df, fsnap)
        if group:
            g = work.groupby(group, sort=False, dropna=False)
        else:
            g = work.groupby(lambda _: 0)
        out = pd.DataFrame()
        for (fn, nm), a in slots:
            base = f"{fn}:{nm}"
            if fn == "COUNT" and a[2] == "*":
                out[base + "|sum"] = g[base + ":n"].sum()
            else:
                if fn in ("SUM", "AVG"):
                    out[base + "|sum"] = g[base + ":v"].sum()
                    out[base + "|cnt"] = g[base + ":v"].count()
                elif fn in ("STDDEV_POP", "STDDEV_SAMP"):
                    out[base + "|sum"] = g[base + ":v"].sum()
                    out[base + "|sq"] = (g[base + ":v"]
                                         .apply(lambda sr: (sr.astype(float) ** 2).sum()))
                    out[base + "|cnt"] = g[base + ":v"].count()
                elif fn == "MIN":
                    out[base + "|min"] = g[base + ":v"].min()
                elif fn == "MAX":
                    out[base + "|max"] = g[base + ":v"].max()
                elif fn == "COUNT":
                    out[base + "|cnt"] = g[base + ":v"].count()
                elif fn == "COUNTD":
                    # distinct values survive the partial as a list —
                    # the exchange carries per-group uniques, not rows
                    out[base + "|set"] = g[base + ":v"].agg(
                        lambda sr: list(pd.unique(sr.dropna())))
        out = out.reset_index()
        if not group:
            out = out.drop(columns=["index"], errors="ignore")
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if group and (len(parts) == 0 or group[0] not in parts.columns):
        # grouped aggregate over zero rows: zero groups, typed empty
        return pd.DataFrame(
            columns=[a or _expr_name(e) for e, a in q["items"]])
    if not group and len(parts) == 0:
        # SQL semantics: a global aggregate over zero rows yields ONE
        # row (COUNT()=0, SUM/MIN/MAX/AVG=NULL)
        seed = {}
        for (fn, nm), a in slots:
            base = f"{fn}:{nm}"
            if fn == "COUNT" and a[2] == "*":
                seed[base + "|sum"] = [0]
            elif fn in ("SUM", "AVG"):
                seed[base + "|sum"] = [np.nan]
                seed[base + "|cnt"] = [0]
            elif fn in ("STDDEV_POP", "STDDEV_SAMP"):
                seed[base + "|sum"] = [np.nan]
                seed[base + "|sq"] = [np.nan]
                seed[base + "|cnt"] = [0]
            elif fn == "MIN":
                seed[base + "|min"] = [np.nan]
            elif fn == "MAX":
                seed[base + "|max"] = [np.nan]
            elif fn == "COUNT":
                seed[base + "|cnt"] = [0]
            elif fn == "COUNTD":
                seed[base + "|set"] = [[]]
        parts = pd.DataFrame(seed)
    if group:
        g = parts.groupby(group, sort=False, dropna=False)
    else:
        g = parts.groupby(lambda _: 0)
    final = pd.DataFrame()
    for col in parts.columns:
        if col in group:
            continue
        if col.endswith("|sum"):
            # min_count=1: an all-NaN (zero-row seed) sum stays NULL,
            # matching SQL SUM-over-empty semantics
            final[col] = g[col].sum(min_count=1)
        elif col.endswith("|cnt"):
            final[col] = g[col].sum()
        elif col.endswith("|sq"):
            final[col] = g[col].sum(min_count=1)
        elif col.endswith("|min"):
            final[col] = g[col].min()
        elif col.endswith("|max"):
            final[col] = g[col].max()
        elif col.endswith("|set"):
            final[col.replace("|set", "|nuniq")] = g[col].agg(
                lambda sr: len(set().union(*(set(v) for v in sr))))
    final = final.reset_index()
    if not group and "index" in final.columns:
        final = final.drop(columns=["index"])

    # substitute aggregate values into the select expressions
    def agg_value(a):
        fn, inner = a[1], a[2]
        nm = "*" if inner == "*" else _expr_name(inner)
        base = f"{fn}:{nm}"
        if fn == "COUNT" and inner == "*":
            return final[base + "|sum"]
        if fn == "SUM":
            return final[base + "|sum"]
        if fn == "AVG":
            return final[base + "|sum"] / final[base + "|cnt"]
        if fn == "MIN":
            return final[base + "|min"]
        if fn == "MAX":
            return final[base + "|max"]
        if fn == "COUNT":
            return final[base + "|cnt"]
        if fn == "COUNTD":
            return final[base + "|nuniq"]
        if fn in ("STDDEV_POP", "STDDEV_SAMP"):
            n = final[base + "|cnt"].astype(float)
            sm = final[base + "|sum"].astype(float)
            sq = final[base + "|sq"].astype(float)
            # ogr_swq.h:67-75 STDDEV_POP/STDDEV_SAMP; NULL when the
            # sample variant has < 2 rows (SQL semantics)
            var_n = sq - sm * sm / n.where(n > 0)
            if fn == "STDDEV_POP":
                return np.sqrt((var_n / n.where(n > 0)).clip(lower=0.0))
            return np.sqrt((var_n / (n - 1).where(n > 1)).clip(lower=0.0))
        raise ValueError(fn)

    def eval_item(e):
        if e[0] == "agg":
            return agg_value(e)
        if e[0] == "col":
            return final[e[1]]
        if e[0] == "lit":
            return e[1]
        if e[0] == "bin":
            l, r = eval_item(e[2]), eval_item(e[3])
            ops = {"+": lambda a, b: a + b, "-": lambda a, b: a - b,
                   "*": lambda a, b: a * b, "/": lambda a, b: a / b,
                   "=": lambda a, b: a == b, "<>": lambda a, b: a != b,
                   "!=": lambda a, b: a != b,
                   "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
                   ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
                   "AND": lambda a, b: np.asarray(a, bool) & np.asarray(b, bool),
                   "OR": lambda a, b: np.asarray(a, bool) | np.asarray(b, bool)}
            return ops[e[1]](l, r)
        if e[0] == "not":
            return ~np.asarray(eval_item(e[1]), bool)
        if e[0] == "func":
            return _SQL_FUNCS[e[1]](*[eval_item(x) for x in e[2]])
        raise ValueError(e)

    if q.get("having") is not None:
        mask = np.asarray(eval_item(q["having"]), bool)
        final = final[mask].reset_index(drop=True)

    out = pd.DataFrame()
    for e, alias in q["items"]:
        name = alias or _expr_name(e)
        # a computed group key already holds its evaluated value in
        # the combined frame — don't re-evaluate the expression
        if name in group and name in final.columns:
            out[name] = final[name]
        else:
            out[name] = eval_item(e)
    if q["order"]:
        out = out.sort_values([c for c, _ in q["order"]],
                              ascending=[not d for _, d in q["order"]])
    if q["limit"] is not None:
        out = out.head(q["limit"])
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# SQLITE dialect
# ---------------------------------------------------------------------------

def execute_sql_sqlite(sql: str, tables: dict,
                       batch_size: int = 8192) -> pd.DataFrame:
    """The SQLITE dialect (ogr/ogrsf_frmts/sqlite/ogrsqliteexecutesql
    .cpp): copy each referenced layer into a temporary SQLite database
    and run the statement there — full SQLite expressiveness
    (subqueries, CASE, window functions) in exchange for materializing
    the inputs, which is EXACTLY the reference's tradeoff (it loads
    each layer into sqlite the same way).

    Scale contract: inputs must be bounded (a filtered layer, a lookup
    table) — the Ray side streams blocks into the db so driver memory
    holds one batch + the db, never a full-table driver list. For unbounded
    scans use the native dialect (execute_sql), which compiles to
    map_batches partials.
    """
    import sqlite3

    con = sqlite3.connect(":memory:")
    try:
        for name, ds in tables.items():
            if not re.search(rf"\b{re.escape(name)}\b", sql):
                continue                      # prune unreferenced layers
            first = True
            for b in ds.iter_batches(batch_format="pandas",
                                     batch_size=batch_size):
                if first:
                    cols = ", ".join(f'"{c}"' for c in b.columns)
                    con.execute(f'CREATE TABLE "{name}" ({cols})')
                    ins = (f'INSERT INTO "{name}" VALUES '
                           f'({", ".join("?" * len(b.columns))})')
                    first = False
                con.executemany(ins, b.itertuples(index=False, name=None))
        cur = con.execute(sql)
        names = [d[0] for d in cur.description]
        return pd.DataFrame(cur.fetchall(), columns=names)
    finally:
        con.close()
