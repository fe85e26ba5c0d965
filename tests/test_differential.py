"""Differential SQL fuzzing: Hypothesis generates random predicate/aggregate
queries from an ANSI-neutral subset, and each one runs on BOTH engines —
Spark over the registered temp views, DuckDB over the same parquet — with
results compared group-by-group.

Why this exists on top of tests/test_parity.py: the parity suite checks the
269 FIXED registry queries; this suite samples the much larger space of
filter/boolean-algebra/aggregate combinations around them, so a divergence
in the engine mapping (timestamp literal handling, AND/OR/NOT precedence,
float aggregation, group-key typing) shows up even if no registry query
happens to hit it. The generated subset is deliberately dialect-neutral:
comparisons, boolean algebra, IN lists, timestamp literals, count/min/max/
sum — the semantics PARITY.md already pins for the fixed suite.

Float discipline: sums are compared with relative tolerance (partial-agg
addition order differs between engines by design — PARITY.md); counts and
min/max exactly. No rounding in the generated SQL, so round-tie divergence
(PARITY rule: never round per-row arithmetic) cannot produce false alarms.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

value_atom = st.builds(
    lambda op, x: f"value {op} {x}",
    st.sampled_from(["<", "<=", ">", ">=", "="]),
    st.integers(min_value=-50, max_value=150),
)
user_atom = st.builds(
    lambda op, u: f"user_id {op} {u}",
    st.sampled_from(["<", "<=", ">", ">="]),
    st.integers(min_value=0, max_value=160),
)
type_atom = st.one_of(
    st.builds(lambda t: f"event_type = '{t}'", st.sampled_from(EVENT_TYPES)),
    st.builds(
        lambda ts: "event_type IN (" + ", ".join(f"'{t}'" for t in sorted(ts)) + ")",
        st.sets(st.sampled_from(EVENT_TYPES), min_size=1, max_size=3),
    ),
)
ts_atom = st.builds(
    lambda op, d, h: f"ts {op} TIMESTAMP '2024-01-{d:02d} {h:02d}:00:00'",
    st.sampled_from(["<", ">="]),
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=0, max_value=23),
)
atom = st.one_of(value_atom, user_atom, type_atom, ts_atom)

predicate = st.recursive(
    atom,
    lambda children: st.one_of(
        st.builds(lambda a, b: f"({a}) AND ({b})", children, children),
        st.builds(lambda a, b: f"({a}) OR ({b})", children, children),
        st.builds(lambda a: f"NOT ({a})", children),
    ),
    max_leaves=4,
)

group_key = st.sampled_from([None, "event_type", "user_id"])


def _sql(pred: str, key: str | None) -> str:
    aggs = "count(*) AS n, min(value) AS mn, max(value) AS mx, sum(value) AS s"
    if key is None:
        return f"SELECT {aggs} FROM events WHERE {pred}"
    return f"SELECT {key} AS k, {aggs} FROM events WHERE {pred} GROUP BY {key}"


def _rows(records):
    out = {}
    for r in records:
        r = list(r)
        key = str(r[0]) if len(r) == 5 else ""
        out[key] = r[-4:]
    return out


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicate, key=group_key)
def test_generated_queries_agree_across_engines(spark, duck, sf_dir, pred, key):
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    sql = _sql(pred, key)
    s_rows = _rows(tuple(r) for r in spark.sql(sql).collect())
    d_rows = _rows(map(tuple, duck.execute(sql).fetchall()))
    assert set(s_rows) == set(d_rows), f"group keys diverge for: {sql}"
    for k in s_rows:
        (sn, smn, smx, ss), (dn, dmn, dmx, ds) = s_rows[k], d_rows[k]
        assert sn == dn, f"count diverges for key {k!r}: {sql}"
        if sn == 0:
            continue  # all aggregates NULL in both engines
        assert smn == dmn and smx == dmx, f"min/max diverge for key {k!r}: {sql}"
        assert math.isclose(ss, ds, rel_tol=1e-9, abs_tol=1e-6), (
            f"sum diverges for key {k!r}: {ss} vs {ds}: {sql}"
        )


WIN_FUNCS = ["sum", "min", "max", "count"]

win_spec = st.builds(
    lambda fn, prec: (fn, prec),
    st.sampled_from(WIN_FUNCS),
    st.integers(min_value=0, max_value=5),
)


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=win_spec, ulim=st.integers(min_value=1, max_value=6))
def test_generated_window_frames_agree_across_engines(spark, duck, sf_dir, spec, ulim):
    """Same differential drive over ROWS-frame window functions: per-user
    ordered frames with a deterministic (ts, event_id) tie-break — the
    ordering discipline every fixed window query in the registry uses."""
    from rvi_big_data_api_spark.io import load

    fn, prec = spec
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    sql = (
        f"SELECT event_id, {fn}(value) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        f"ROWS BETWEEN {prec} PRECEDING AND CURRENT ROW) AS w "
        f"FROM events WHERE user_id <= {ulim}"
    )
    s = {int(r[0]): r[1] for r in spark.sql(sql).collect()}
    d = {int(r[0]): r[1] for r in duck.execute(sql).fetchall()}
    assert set(s) == set(d)
    for k in s:
        if fn == "count":
            assert int(s[k]) == int(d[k]), f"count frame diverges at event {k}: {sql}"
        elif fn in ("min", "max"):
            assert s[k] == d[k], f"{fn} frame diverges at event {k}: {sql}"
        else:
            assert math.isclose(s[k], d[k], rel_tol=1e-9, abs_tol=1e-6), (
                f"sum frame diverges at event {k}: {s[k]} vs {d[k]}: {sql}"
            )


order_atom = st.one_of(
    st.builds(
        lambda op, x: f"o.o_totalprice {op} {x}",
        st.sampled_from(["<", ">="]),
        st.integers(min_value=1000, max_value=400_000),
    ),
    st.builds(
        lambda ss: "o.o_orderstatus IN (" + ", ".join(f"'{s}'" for s in sorted(ss)) + ")",
        st.sets(st.sampled_from(["O", "F", "P"]), min_size=1, max_size=2),
    ),
)
cust_atom = st.builds(
    lambda op, x: f"c.c_acctbal {op} {x}",
    st.sampled_from(["<", ">="]),
    st.integers(min_value=-900, max_value=9900),
)


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    opred=order_atom,
    cpred=cust_atom,
    left=st.booleans(),
)
def test_generated_joins_agree_across_engines(spark, duck, sf_dir, opred, cpred, left):
    """Differential drive over the join mapping: customer x orders with
    generated predicates under INNER and LEFT join shapes. For LEFT joins
    the orders-side predicate moves into ON (the semantics-preserving
    placement; in WHERE it would reduce to INNER) and unmatched customers
    must survive with NULL-extended aggregates in BOTH engines."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    if left:
        sql = (
            "SELECT c.c_mktsegment AS k, count(o.o_orderkey) AS n, "
            "sum(o.o_totalprice) AS s "
            f"FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND ({opred}) "
            f"WHERE {cpred} GROUP BY c.c_mktsegment"
        )
    else:
        sql = (
            "SELECT c.c_mktsegment AS k, count(o.o_orderkey) AS n, "
            "sum(o.o_totalprice) AS s "
            "FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey "
            f"WHERE ({opred}) AND ({cpred}) GROUP BY c.c_mktsegment"
        )
    s_rows = {r[0]: (r[1], r[2]) for r in spark.sql(sql).collect()}
    d_rows = {r[0]: (r[1], r[2]) for r in duck.execute(sql).fetchall()}
    assert set(s_rows) == set(d_rows), f"group keys diverge: {sql}"
    for k in s_rows:
        (sn, ss), (dn, ds) = s_rows[k], d_rows[k]
        assert sn == dn, f"count diverges for {k!r}: {sn} vs {dn}: {sql}"
        if ss is None or ds is None:
            assert ss is None and ds is None, f"null sum diverges for {k!r}: {sql}"
        else:
            assert math.isclose(ss, ds, rel_tol=1e-9, abs_tol=1e-6), (
                f"sum diverges for {k!r}: {ss} vs {ds}: {sql}"
            )


setop = st.sampled_from(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(op=setop, p1=atom, p2=atom)
def test_generated_set_ops_agree_across_engines(spark, duck, sf_dir, op, p1, p2):
    """Differential drive over the set-operation mapping: two generated
    event slices combined under UNION [ALL] / INTERSECT / EXCEPT, compared
    as sorted multisets (bag semantics for ALL, set semantics otherwise
    — identical definitions in both engines)."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    sql = (
        f"SELECT user_id, event_type FROM events WHERE {p1} "
        f"{op} "
        f"SELECT user_id, event_type FROM events WHERE {p2}"
    )
    s = sorted(map(tuple, spark.sql(sql).collect()))
    d = sorted(map(tuple, duck.execute(sql).fetchall()))
    assert s == d, f"set op diverges ({len(s)} vs {len(d)} rows): {sql}"


str_fn = st.sampled_from(
    [
        "upper(event_type)",
        "lower(event_type)",
        "substr(event_type, 2)",
        "substr(event_type, 1, 3)",
        "length(event_type)",
        "trim(event_type)",
        "concat(event_type, '_', user_id)",
        "replace(event_type, 'c', 'X')",
        "reverse(event_type)",
        "left(event_type, 2)",
        "right(event_type, 2)",
    ]
)


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=str_fn, pred=atom)
def test_generated_string_exprs_agree_across_engines(spark, duck, sf_dir, expr, pred):
    """Differential drive over the dialect-neutral scalar-string subset
    (1-based substr, left/right, replace, concat with implicit int cast) —
    the functions the fixed fn_string query uses, sampled across predicates."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    sql = f"SELECT event_id, {expr} AS v FROM events WHERE {pred}"
    s = sorted((int(r[0]), str(r[1])) for r in spark.sql(sql).collect())
    d = sorted((int(r[0]), str(r[1])) for r in duck.execute(sql).fetchall())
    assert s == d, f"string expr diverges: {sql}"


# Both-dialect temporal subset. Deliberately excluded as NOT neutral (the
# exclusion is itself a finding, PARITY-style): strftime/date_format and
# epoch() exist in only one engine; dayofweek numbers Sunday differently
# (Spark 1-7 vs DuckDB 0-6).
dt_fn = st.sampled_from(
    [
        "year(ts)",
        "month(ts)",
        "day(ts)",
        "hour(ts)",
        "minute(ts)",
        "quarter(ts)",
        "weekofyear(ts)",
        # through DATE first: DuckDB's date_trunc('day') yields DATE while
        # Spark's yields TIMESTAMP — the common renderable type is DATE
        "cast(cast(date_trunc('day', ts) AS DATE) AS STRING)",
        "cast(date_trunc('hour', ts) AS STRING)",
        "cast(last_day(ts) AS STRING)",
    ]
)


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=dt_fn, pred=atom)
def test_generated_datetime_exprs_agree_across_engines(spark, duck, sf_dir, expr, pred):
    """Differential drive over the dialect-neutral temporal subset — the
    expressions PARITY.md's temporal conventions are built on (UTC session,
    second-truncated epochs, strftime-formatted outputs)."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    sql = f"SELECT event_id, {expr} AS v FROM events WHERE {pred}"
    s = sorted((int(r[0]), str(r[1])) for r in spark.sql(sql).collect())
    d = sorted((int(r[0]), str(r[1])) for r in duck.execute(sql).fetchall())
    assert s == d, f"datetime expr diverges: {sql}"


agg_fn = st.sampled_from(
    [
        ("count(DISTINCT user_id)", "exact"),
        ("count(*) FILTER (WHERE value > 100)", "exact"),
        ("avg(value)", "close"),
        ("stddev(value)", "close"),
        ("var_samp(value)", "close"),
        ("sum(value * value)", "close"),
        ("min(value)", "exact"),
        ("max(value)", "exact"),
    ]
)


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=agg_fn, pred=atom, key=group_key)
def test_generated_aggregates_agree_across_engines(spark, duck, sf_dir, spec, pred, key):
    """Differential drive over the aggregate family: moment aggregates with
    float tolerance (partial-agg fold order differs by design), counts and
    extrema exactly."""
    from rvi_big_data_api_spark.io import load

    expr, kind = spec
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    k_sel = f"{key} AS k, " if key else ""
    k_grp = f" GROUP BY {key}" if key else ""
    sql = f"SELECT {k_sel}{expr} AS v FROM events WHERE {pred}{k_grp}"
    def rows(recs):
        out = {}
        for r in recs:
            r = list(r)
            out[str(r[0]) if len(r) == 2 else ""] = r[-1]
        return out
    s = rows(spark.sql(sql).collect())
    d = rows(map(list, duck.execute(sql).fetchall()))
    assert set(s) == set(d), f"group keys diverge: {sql}"
    for gk in s:
        sv, dv = s[gk], d[gk]
        if sv is None or dv is None:
            assert sv is None and dv is None, f"null diverges for {gk!r}: {sql}"
        elif kind == "exact":
            assert sv == dv, f"{expr} diverges for {gk!r}: {sv} vs {dv}: {sql}"
        else:
            assert math.isclose(float(sv), float(dv), rel_tol=1e-9, abs_tol=1e-9), (
                f"{expr} diverges for {gk!r}: {sv} vs {dv}: {sql}"
            )


grouping_shape = st.sampled_from(
    [
        "ROLLUP (event_type, user_id % 4)",
        "CUBE (event_type, user_id % 4)",
        "GROUPING SETS ((event_type), (user_id % 4), ())",
        "GROUPING SETS ((event_type, user_id % 4), (event_type), ())",
    ]
)


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(shape=grouping_shape, pred=atom)
def test_generated_grouping_sets_agree_across_engines(spark, duck, sf_dir, shape, pred):
    """Differential drive over multi-dimensional grouping: ROLLUP / CUBE /
    GROUPING SETS with the GROUPING() provenance marker (PARITY rule 20's
    bitmask equivalence, sampled instead of fixed). Super-aggregate rows
    carry NULL group keys, so rows are keyed by (marker, keys) — the
    marker disambiguates genuine NULLs from rollup NULLs in both engines."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    # per-column GROUPING(col): the multi-arg bitmask form is grouping_id()
    # in Spark vs GROUPING(a, b) in DuckDB (PARITY rule 20) — not neutral
    sql = (
        "SELECT event_type AS k1, user_id % 4 AS k2, "
        "GROUPING(event_type) AS g1, GROUPING(user_id % 4) AS g2, "
        "count(*) AS n, sum(value) AS s "
        f"FROM events WHERE {pred} GROUP BY {shape}"
    )
    def rows(recs):
        # n == 0 occurs only as DuckDB's empty-input grand-total row — Spark
        # emits NOTHING for grouping sets over zero input rows (PARITY rule
        # 23, found by this fuzzer); normalize it away on both sides
        return {
            (str(r[0]), str(r[1]), int(r[2]), int(r[3])): (int(r[4]), r[5])
            for r in recs
            if int(r[4]) > 0
        }
    s = rows(spark.sql(sql).collect())
    d = rows(duck.execute(sql).fetchall())
    assert set(s) == set(d), f"grouping rows diverge: {sql}"
    for k in s:
        assert s[k][0] == d[k][0], f"count diverges for {k}: {sql}"
        sv, dv = s[k][1], d[k][1]
        if sv is None or dv is None:
            assert sv is None and dv is None, f"null sum diverges for {k}: {sql}"
        else:
            assert math.isclose(sv, dv, rel_tol=1e-9, abs_tol=1e-6), (
                f"sum diverges for {k}: {sv} vs {dv}: {sql}"
            )


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred=atom,
    hmin=st.integers(min_value=1, max_value=50),
    k=st.integers(min_value=1, max_value=20),
)
def test_generated_having_limit_agree_across_engines(spark, duck, sf_dir, pred, hmin, k):
    """Differential drive over HAVING + deterministic ORDER BY ... LIMIT:
    the top-k contract every registry limit query follows (unique-key
    tie-break so LIMIT is well-defined in both engines)."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    sql = (
        "SELECT user_id, count(*) AS n FROM events "
        f"WHERE {pred} GROUP BY user_id HAVING count(*) >= {hmin} "
        f"ORDER BY n DESC, user_id ASC LIMIT {k}"
    )
    s = [(int(r[0]), int(r[1])) for r in spark.sql(sql).collect()]
    d = [(int(r[0]), int(r[1])) for r in duck.execute(sql).fetchall()]
    assert s == d, f"having/limit diverges: {sql}"


RANK_FUNCS = ["row_number()", "rank()", "dense_rank()"]

rank_spec = st.one_of(
    st.sampled_from(RANK_FUNCS),
    st.builds(lambda n: f"ntile({n})", st.integers(min_value=1, max_value=7)),
    st.builds(
        lambda fn, off: f"{fn}(value, {off})",
        st.sampled_from(["lag", "lead"]),
        st.integers(min_value=1, max_value=3),
    ),
)


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=rank_spec, ulim=st.integers(min_value=1, max_value=6))
def test_generated_ranking_windows_agree_across_engines(spark, duck, sf_dir, spec, ulim):
    """Differential drive over ranking/offset window functions. The ORDER BY
    is (ts, event_id) — a TOTAL order — so row_number/ntile/lag/lead are
    well-defined in both engines (PARITY.md's determinism rule for every
    registry window query); rank/dense_rank are deterministic under any
    order. NULLs from lag/lead edges compare as None == None."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    sql = (
        f"SELECT event_id, {spec} OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id) AS w "
        f"FROM events WHERE user_id <= {ulim}"
    )
    s = {int(r[0]): r[1] for r in spark.sql(sql).collect()}
    d = {int(r[0]): r[1] for r in duck.execute(sql).fetchall()}
    assert set(s) == set(d)
    for k in s:
        sv, dv = s[k], d[k]
        if sv is None or dv is None:
            assert sv is None and dv is None, f"NULL edge diverges at {k}: {sql}"
        elif spec.startswith(("lag", "lead")):
            assert math.isclose(sv, dv, rel_tol=1e-9, abs_tol=1e-9), (
                f"offset diverges at {k}: {sv} vs {dv}: {sql}"
            )
        else:
            assert int(sv) == int(dv), f"rank diverges at {k}: {sv} vs {dv}: {sql}"


corr_qty = st.integers(min_value=10, max_value=50)
corr_shape = st.sampled_from(["exists", "not_exists", "scalar_max", "in_list"])


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(shape=corr_shape, qty=corr_qty, cap=st.integers(min_value=1000, max_value=9000))
def test_generated_correlated_subqueries_agree_across_engines(
    spark, duck, sf_dir, shape, qty, cap
):
    """Differential drive over correlated subquery shapes — the decorrelation
    rewrites (EXISTS/NOT EXISTS -> semi/anti join, scalar agg -> left join +
    group) are where optimizers historically diverge; both engines must
    produce the same orderkey set for every generated instance."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    inner = f"SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= {qty}"
    if shape == "exists":
        where = f"EXISTS ({inner})"
    elif shape == "not_exists":
        where = f"NOT EXISTS ({inner})"
    elif shape == "scalar_max":
        where = (
            "(SELECT max(l.l_extendedprice) FROM lineitem l "
            f"WHERE l.l_orderkey = o.o_orderkey) >= {cap}"
        )
    else:  # in_list
        where = (
            "o.o_orderkey IN (SELECT l.l_orderkey FROM lineitem l "
            f"WHERE l.l_quantity >= {qty})"
        )
    sql = f"SELECT o.o_orderkey FROM orders o WHERE {where} AND o.o_orderkey < 5000"
    s = sorted(int(r[0]) for r in spark.sql(sql).collect())
    d = sorted(int(r[0]) for r in duck.execute(sql).fetchall())
    assert s == d, f"correlated subquery diverges ({len(s)} vs {len(d)} rows): {sql}"


# --- dual-dialect array/HOF family -----------------------------------------
# Unlike the families above (identical SQL text on both engines), higher-
# order array functions have different NAMES per dialect (transform/filter/
# aggregate vs list_transform/list_filter/list_sum), so each generated
# pipeline is rendered twice from one op list. Constants vary via
# hypothesis; the pipeline applies 0-3 element-wise ops to the embedding
# array (cast to DOUBLE both sides) and collapses with a scalar reducer.

ARR_BASE = {
    "spark": "CAST(embedding AS ARRAY<DOUBLE>)",
    "duck": "embedding::DOUBLE[]",
}

def _op_add(c):
    return {
        "spark": "transform({0}, x -> x + " + str(c) + ")",
        "duck": "list_transform({0}, x -> x + " + str(c) + ")",
    }

def _op_mul(c):
    return {
        "spark": "transform({0}, x -> x * " + str(c) + ")",
        "duck": "list_transform({0}, x -> x * " + str(c) + ")",
    }

def _op_filter_gt(c):
    return {
        "spark": "filter({0}, x -> x > " + str(c) + ")",
        "duck": "list_filter({0}, x -> x > " + str(c) + ")",
    }

def _op_sort():
    return {"spark": "array_sort({0})", "duck": "list_sort({0})"}

def _op_abs():
    return {
        "spark": "transform({0}, x -> abs(x))",
        "duck": "list_transform({0}, x -> abs(x))",
    }

def _op_slice(k):
    # Spark slice(arr, 1, k) == DuckDB arr[1:k] (both 1-based, length-clamped)
    return {"spark": "slice({0}, 1, " + str(k) + ")", "duck": "({0})[1:" + str(k) + "]"}

arr_op = st.one_of(
    st.builds(_op_add, st.integers(min_value=-3, max_value=3)),
    st.builds(_op_mul, st.integers(min_value=-2, max_value=2)),
    st.builds(_op_filter_gt, st.sampled_from([-0.2, -0.05, 0.0, 0.05, 0.2])),
    st.builds(_op_sort),
    st.builds(_op_abs),
    st.builds(_op_slice, st.integers(min_value=1, max_value=8)),
)

ARR_REDUCERS = {
    "sum": {
        "spark": "aggregate({0}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)",
        "duck": "coalesce(list_sum({0}), 0)",
    },
    "size": {"spark": "size({0})", "duck": "len({0})"},
    "maxv": {"spark": "array_max({0})", "duck": "list_aggregate({0}, 'max')"},
}


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(arr_op, min_size=0, max_size=3),
    red=st.sampled_from(sorted(ARR_REDUCERS)),
)
def test_generated_array_hof_pipelines_agree_across_engines(spark, duck, sf_dir, ops, red):
    """Each generated pipeline renders once per dialect from the same op
    list; per-vector scalars must agree (floats to 1e-9 relative — the
    element order is identical on both sides, so even the fold order
    matches; NULL reducer edges — max/sum of a filtered-empty array —
    must be NULL/zero on BOTH engines)."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")

    def render(engine):
        e = ARR_BASE[engine]
        for op in ops:
            e = op[engine].format(e)
        e = ARR_REDUCERS[red][engine].format(e)
        return f"SELECT vec_id, {e} AS v FROM embeddings WHERE vec_id < 120"

    s = {int(r[0]): r[1] for r in spark.sql(render("spark")).collect()}
    d = {int(r[0]): r[1] for r in duck.execute(render("duck")).fetchall()}
    assert set(s) == set(d)
    for k in s:
        sv, dv = s[k], d[k]
        if sv is None or dv is None:
            assert sv is None and dv is None, (k, sv, dv, render("spark"))
        elif red == "size":
            assert int(sv) == int(dv), (k, sv, dv, render("spark"))
        else:
            assert math.isclose(float(sv), float(dv), rel_tol=1e-9, abs_tol=1e-9), (
                k, sv, dv, render("spark"),
            )


# --- map higher-order functions (VERDICT r5 item 8: the round-5 function-
# surface wave had parity rows but no fuzz family). Spark side: a real MAP
# with transform_values / map_filter chains. DuckDB side: maps carry no HOF
# surface, so the map is mirrored as a LIST OF STRUCT {k, v} and every op
# maps to list_transform / list_filter over entries — the same entry-level
# semantics fn_map_hof's fixed parity row pins, here sampled over random op
# chains. Values are integer arithmetic (cents, small moduli), so every
# comparison is exact; the entries_str reducer sorts entries before
# rendering (map iteration order is NOT part of either engine's contract).
MAP_BASE = {
    "spark": "map('a', vc, 'b', m7, 'c', u5)",
    "duck": "[{'k': 'a', 'v': vc}, {'k': 'b', 'v': m7}, {'k': 'c', 'v': u5}]",
}

def _mop_add(c):
    return {
        "spark": "transform_values(@, (k, v) -> v + " + str(c) + ")",
        "duck": "list_transform(@, e -> {'k': e.k, 'v': e.v + " + str(c) + "})",
    }

def _mop_mul(c):
    return {
        "spark": "transform_values(@, (k, v) -> v * " + str(c) + ")",
        "duck": "list_transform(@, e -> {'k': e.k, 'v': e.v * " + str(c) + "})",
    }

def _mop_filter_mod(m, r):
    return {
        "spark": "map_filter(@, (k, v) -> v % " + str(m) + " = " + str(r) + ")",
        "duck": "list_filter(@, e -> e.v % " + str(m) + " = " + str(r) + ")",
    }

def _mop_drop_key(key):
    return {
        "spark": "map_filter(@, (k, v) -> k != '" + key + "')",
        "duck": "list_filter(@, e -> e.k != '" + key + "')",
    }

map_op = st.one_of(
    st.builds(_mop_add, st.integers(min_value=-3, max_value=3)),
    st.builds(_mop_mul, st.integers(min_value=-2, max_value=2)),
    st.builds(
        _mop_filter_mod,
        st.sampled_from([2, 3, 5]),
        st.integers(min_value=0, max_value=1),
    ),
    st.builds(_mop_drop_key, st.sampled_from(["a", "b", "c"])),
)

MAP_REDUCERS = {
    "sumv": {
        "spark": "aggregate(map_values(@), 0L, (acc, x) -> acc + x)",
        "duck": "coalesce(list_sum(list_transform(@, e -> e.v)), 0)",
    },
    "size": {"spark": "size(@)", "duck": "len(@)"},
    "entries_str": {
        "spark": (
            "array_join(array_sort(transform(map_entries(@),"
            " e -> concat_ws('=', e.key, cast(e.value as string)))), ',')"
        ),
        # coalesce: DuckDB's array_to_string([]) is NULL where Spark's
        # array_join([]) is '' — the empty-map edge must render '' on both
        "duck": (
            "coalesce(array_to_string(list_sort("
            "list_transform(@, e -> e.k || '=' || e.v)), ','), '')"
        ),
    },
}


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(map_op, min_size=0, max_size=3),
    red=st.sampled_from(sorted(MAP_REDUCERS)),
)
def test_generated_map_hof_pipelines_agree_across_engines(spark, duck, sf_dir, ops, red):
    """Each generated map-HOF chain renders once per dialect from the same
    op list; per-row scalars must agree EXACTLY (integer values — no float
    tolerance needed). Empty-map edges (every entry filtered away) must
    reduce identically: sum 0, size 0, entries_str ''."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")

    def render(engine):
        e = MAP_BASE[engine]
        for op in ops:
            e = op[engine].replace("@", e)
        e = MAP_REDUCERS[red][engine].replace("@", e)
        return (
            "WITH base AS (SELECT event_id,"
            " cast(floor(value * 100 + 0.5) as bigint) AS vc,"
            " cast(event_id % 7 as bigint) AS m7,"
            " cast(user_id % 5 as bigint) AS u5"
            " FROM events WHERE event_id < 150)"
            f" SELECT event_id, {e} AS v FROM base"
        )

    s = {int(r[0]): r[1] for r in spark.sql(render("spark")).collect()}
    d = {int(r[0]): r[1] for r in duck.execute(render("duck")).fetchall()}
    assert set(s) == set(d)
    for k in s:
        sv, dv = s[k], d[k]
        if red == "entries_str":
            assert str(sv) == str(dv), (k, sv, dv, render("spark"))
        else:
            assert int(sv) == int(dv), (k, sv, dv, render("spark"))


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred=atom,
    m=st.integers(min_value=0, max_value=40),
    k=st.integers(min_value=1, max_value=15),
)
def test_generated_limit_offset_pages_agree_across_engines(spark, duck, sf_dir, pred, m, k):
    """Differential drive over LIMIT k OFFSET m pagination (the limit_offset
    contract): with a unique-key total order, page (m, k) must be identical
    in both engines, and consecutive pages must tile the head with no gap or
    overlap."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    base = (
        "SELECT event_id, user_id FROM events "
        f"WHERE {pred} ORDER BY user_id ASC, event_id ASC"
    )
    page_sql = f"{base} LIMIT {k} OFFSET {m}"
    s = [(int(r[0]), int(r[1])) for r in spark.sql(page_sql).collect()]
    d = [(int(r[0]), int(r[1])) for r in duck.execute(page_sql).fetchall()]
    assert s == d, f"page diverges: {page_sql}"
    head = [
        (int(r[0]), int(r[1]))
        for r in spark.sql(f"{base} LIMIT {m + k}").collect()
    ]
    assert s == head[m:], f"page is not the head slice: {page_sql}"


# --- bivariate / regression aggregates --------------------------------------
# eval_regression_metrics leans on regr_slope/regr_intercept mapping between
# engines; fuzz the whole bivariate family (corr, covar, regr_*) over random
# predicates and x/y derivations so the pairing is pinned beyond the one
# fixed registry query.
xy_spec = st.sampled_from(
    [
        ("value", "user_id % 53"),
        ("value", "event_id % 31"),
        ("value * 2 + 1", "user_id % 17"),
        ("value", "value * value"),
        ("event_id % 101", "user_id % 29"),
    ]
)
bivar_fn = st.sampled_from(
    [
        "corr({y}, {x})",
        "covar_samp({y}, {x})",
        "covar_pop({y}, {x})",
        "regr_slope({y}, {x})",
        "regr_intercept({y}, {x})",
        "regr_r2({y}, {x})",
        "regr_count({y}, {x})",
        "regr_avgx({y}, {x})",
        "regr_avgy({y}, {x})",
    ]
)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(fn=bivar_fn, xy=xy_spec, pred=atom, key=group_key)
def test_generated_bivariate_aggregates_agree_across_engines(
    spark, duck, sf_dir, fn, xy, pred, key
):
    """Differential drive over the bivariate-aggregate family: corr / covar /
    regr_* agree between engines (float tolerance; regr_count exactly).
    Degenerate groups (single row, zero x-variance) must go NULL in BOTH."""
    from rvi_big_data_api_spark.io import load

    x, y = xy
    expr = fn.format(x=x, y=y)
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    k_sel = f"{key} AS k, " if key else ""
    k_grp = f" GROUP BY {key}" if key else ""
    sql = f"SELECT {k_sel}{expr} AS v FROM events WHERE {pred}{k_grp}"

    def rows(recs):
        out = {}
        for r in recs:
            r = list(r)
            out[str(r[0]) if len(r) == 2 else ""] = r[-1]
        return out

    s = rows(spark.sql(sql).collect())
    d = rows(map(list, duck.execute(sql).fetchall()))
    assert set(s) == set(d), f"group keys diverge: {sql}"
    for gk in s:
        sv, dv = s[gk], d[gk]
        if sv is None or dv is None:
            # corr/regr of a constant or single point: NULL in both engines
            assert (sv is None) == (dv is None) or (
                dv is not None and math.isnan(float(dv))
            ) or (sv is not None and math.isnan(float(sv))), (
                f"null diverges for {gk!r}: {sv} vs {dv}: {sql}"
            )
        elif fn.startswith("regr_count"):
            assert int(sv) == int(dv), f"{expr} diverges for {gk!r}: {sql}"
        else:
            assert math.isclose(float(sv), float(dv), rel_tol=1e-7, abs_tol=1e-7), (
                f"{expr} diverges for {gk!r}: {sv} vs {dv}: {sql}"
            )


# --- exact percentiles ------------------------------------------------------
# feature_scaling / feature_quantile_bin / agg_percentile lean on the
# percentile ↔ quantile_cont pairing; fuzz it across random fractions,
# predicates, and group keys. The two engines spell the function differently,
# so this family generates structurally identical SQL per dialect.
pct_fraction = st.sampled_from(
    [0.0, 0.01, 0.1, 0.25, 0.5, 0.739, 0.75, 0.9, 0.99, 1.0]
)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(p=pct_fraction, pred=atom, key=group_key)
def test_generated_percentiles_agree_across_engines(spark, duck, sf_dir, p, pred, key):
    """Exact linear-interpolation percentile agrees between engines for any
    fraction in [0, 1] — including the 0/1 endpoints (min/max) and
    fractions that land between rows."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    k_sel = f"{key} AS k, " if key else ""
    k_grp = f" GROUP BY {key}" if key else ""
    s_sql = f"SELECT {k_sel}percentile(value, {p}) AS v FROM events WHERE {pred}{k_grp}"
    d_sql = f"SELECT {k_sel}quantile_cont(value, {p}) AS v FROM events WHERE {pred}{k_grp}"

    def rows(recs):
        out = {}
        for r in recs:
            r = list(r)
            out[str(r[0]) if len(r) == 2 else ""] = r[-1]
        return out

    s = rows(spark.sql(s_sql).collect())
    d = rows(map(list, duck.execute(d_sql).fetchall()))
    assert set(s) == set(d), f"group keys diverge: {s_sql}"
    for gk in s:
        sv, dv = s[gk], d[gk]
        if sv is None or dv is None:
            assert sv is None and dv is None, f"null diverges for {gk!r}: {s_sql}"
        else:
            assert math.isclose(float(sv), float(dv), rel_tol=1e-9, abs_tol=1e-9), (
                f"percentile({p}) diverges for {gk!r}: {sv} vs {dv}: {s_sql}"
            )


# --------------------------------------------------------------------------
# As-of joins: Spark (ineq join + max_by/min_by nearest) vs DuckDB's NATIVE
# ASOF JOIN — two genuinely independent implementations of the same
# semantics. The as-of axis is the packed (sec, event_id) BIGINT (PARITY
# rule 7's tie-break trick), so the nearest match is UNIQUE and no
# tie-break convention can diverge. Tolerance is applied post-hoc on the
# DuckDB side (the nearest directional match is stale ⟺ no match within
# the bound exists), matching the Spark side's join-time bound.
# --------------------------------------------------------------------------

asof_spec = st.builds(
    lambda direction, tol_s, umod: (direction, tol_s, umod),
    st.sampled_from(["backward", "forward"]),
    st.integers(min_value=60, max_value=86_400),
    st.integers(min_value=2, max_value=7),
)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=asof_spec)
def test_generated_asof_joins_agree_across_engines(spark, duck, sf_dir, spec):
    import pyspark.sql.functions as F
    from rvi_big_data_api_spark.io import load

    direction, tol_s, umod = spec
    tol = tol_s * 2_097_152

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % umod == 0)
    key = (F.unix_timestamp("ts") * 2_097_152 + F.col("event_id")).alias("k")
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), key
    )
    quotes = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("q_user"), F.col("event_id").alias("qid"), key
    ).select("q_user", "qid", F.col("k").alias("qk"))

    if direction == "backward":
        cond = (F.col("qk") <= F.col("k")) & (F.col("qk") >= F.col("k") - tol)
        pick = F.max_by("qid", F.col("qk"))
    else:
        cond = (F.col("qk") >= F.col("k")) & (F.col("qk") <= F.col("k") + tol)
        pick = F.min_by("qid", F.col("qk"))
    joined = probes.join(
        quotes, (probes.user_id == quotes.q_user) & cond, "left"
    ).groupBy("pid").agg(pick.alias("match"))
    s_rows = {(r.pid, r.match) for r in joined.collect()}

    op, agg = ("<=", "max") if direction == "backward" else (">=", "min")
    guard = (
        f"q.k >= p.k - {tol}" if direction == "backward" else f"q.k <= p.k + {tol}"
    )
    d_rows = set(
        map(
            tuple,
            duck.execute(f"""
        WITH base AS (
            SELECT user_id, event_id, event_type,
                   epoch(date_trunc('second', ts))::BIGINT * 2097152 + event_id AS k
            FROM events WHERE user_id % {umod} = 0
        ),
        p AS (SELECT user_id, event_id AS pid, k FROM base
              WHERE event_type = 'purchase'),
        q AS (SELECT user_id, event_id AS qid, k FROM base
              WHERE event_type = 'click')
        SELECT p.pid,
               CASE WHEN q.k IS NOT NULL AND {guard} THEN q.qid END AS match
        FROM p ASOF LEFT JOIN q
          ON p.user_id = q.user_id AND q.k {op} p.k
        """).fetchall(),
        )
    )
    assert s_rows == d_rows, f"asof {direction} tol={tol_s}s u%{umod}"


# --------------------------------------------------------------------------
# Interval-overlap joins: generated window lengths/offsets, Spark range
# join vs DuckDB's native range join on the SAME half-open overlap
# predicate (a.start < b.end AND b.start < a.end) — exercises boundary
# semantics (touching intervals must NOT match) across engines.
# --------------------------------------------------------------------------

overlap_spec = st.builds(
    lambda la, lb, umod: (la, lb, umod),
    st.integers(min_value=300, max_value=7200),    # purchase window len (s)
    st.integers(min_value=300, max_value=7200),    # error window len (s)
    st.integers(min_value=3, max_value=9),
)


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=overlap_spec)
def test_generated_interval_overlaps_agree_across_engines(spark, duck, sf_dir, spec):
    import pyspark.sql.functions as F
    from rvi_big_data_api_spark.io import load

    la, lb, umod = spec
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % umod == 0)
    sec = F.unix_timestamp("ts")
    a = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("ua"), F.col("event_id").alias("aid"),
        sec.alias("a_start"), (sec + la).alias("a_end"),
    )
    b = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("ub"), F.col("event_id").alias("bid"),
        sec.alias("b_start"), (sec + lb).alias("b_end"),
    )
    joined = a.join(
        b,
        (F.col("ua") == F.col("ub"))
        & (F.col("a_start") < F.col("b_end"))
        & (F.col("b_start") < F.col("a_end")),
    ).select("aid", "bid")
    s_rows = {(r.aid, r.bid) for r in joined.collect()}

    d_rows = set(
        map(
            tuple,
            duck.execute(f"""
        WITH base AS (
            SELECT user_id, event_id, event_type,
                   epoch(date_trunc('second', ts))::BIGINT AS sec
            FROM events WHERE user_id % {umod} = 0
        ),
        a AS (SELECT user_id, event_id AS aid, sec AS s, sec + {la} AS e
              FROM base WHERE event_type = 'purchase'),
        b AS (SELECT user_id, event_id AS bid, sec AS s, sec + {lb} AS e
              FROM base WHERE event_type = 'error')
        SELECT a.aid, b.bid FROM a JOIN b
          ON a.user_id = b.user_id AND a.s < b.e AND b.s < a.e
        """).fetchall(),
        )
    )
    assert s_rows == d_rows, f"overlap la={la} lb={lb} u%{umod}"


# --------------------------------------------------------------------------
# Session windows: generated gap G — Spark's session_window aggregate vs
# DuckDB window-algebra sessionization (gap_flag running sum), compared as
# (user, n_sessions, total_events). PARITY rule 13's boundary convention
# (session_window merges iff diff < G; the algebra splits at diff >= G)
# holds for every generated G, not just the registered fixture's.
# --------------------------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    gap_s=st.integers(min_value=600, max_value=86_400),
    umod=st.integers(min_value=5, max_value=11),
)
def test_generated_session_gaps_agree_across_engines(spark, duck, sf_dir, gap_s, umod):
    import pyspark.sql.functions as F
    from rvi_big_data_api_spark.io import load

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") % umod == 1)
        .select("user_id", F.date_trunc("second", "ts").alias("ts"))
    )
    sess = (
        ev.groupBy("user_id", F.session_window("ts", f"{gap_s} seconds"))
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n").alias("n_events"),
        )
    )
    s_rows = {(r.user_id, r.n_sessions, r.n_events) for r in sess.collect()}

    d_rows = set(
        map(
            tuple,
            duck.execute(f"""
        WITH o AS (
            SELECT user_id, epoch(date_trunc('second', ts))::BIGINT AS sec
            FROM events WHERE user_id % {umod} = 1
        ),
        flagged AS (
            SELECT user_id,
                   CASE WHEN sec - lag(sec) OVER w >= {gap_s} OR
                             lag(sec) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_s
            FROM o WINDOW w AS (PARTITION BY user_id ORDER BY sec)
        )
        SELECT user_id, sum(new_s)::BIGINT AS n_sessions,
               count(*)::BIGINT AS n_events
        FROM flagged GROUP BY user_id
        """).fetchall(),
        )
    )
    assert s_rows == d_rows, f"session gap={gap_s}s u%{umod}"

# --------------------------------------------------------------------------
# Time-series family (VERDICT r6 item 6): the ts ops (ts_autocorrelation /
# ts_period_over_period / ts_decompose_classical) have parity rows and
# invariants but had no generated-query fuzz. Both tests run ONE dialect-
# neutral SQL string on BOTH engines: the series is a per-bucket count from
# events (date_trunc/hour are shared spellings), the lag is a shared window
# function, and Pearson corr parity is already pinned by the bivariate
# family above.
# --------------------------------------------------------------------------

ts_bucket = st.sampled_from(["day", "hour"])


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    bucket=ts_bucket,
    lag=st.integers(min_value=1, max_value=10),
    pred=atom,
)
def test_generated_acf_lags_agree_across_engines(spark, duck, sf_dir, bucket, lag, pred):
    """Lag-L autocorrelation of a bucketed count series agrees across
    engines for random buckets (daily/hourly — the seasonal-period axis)
    and random lags — the ts_autocorrelation shape beyond its fixed lags."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    sql = f"""
        WITH series AS (
            SELECT date_trunc('{bucket}', ts) AS t,
                   CAST(count(*) AS DOUBLE) AS x
            FROM events WHERE {pred} GROUP BY date_trunc('{bucket}', ts)
        ),
        lagged AS (
            SELECT x, lag(x, {lag}) OVER (ORDER BY t) AS lx FROM series
        )
        SELECT corr(x, lx) AS r, count(lx) AS n FROM lagged
    """
    s_r, s_n = spark.sql(sql).collect()[0]
    d_r, d_n = duck.execute(sql).fetchall()[0]
    assert s_n == d_n, f"pair count diverges: {sql}"
    if s_r is None or d_r is None:
        # degenerate series (too short / zero variance) must be NULL in both
        assert s_r is None and d_r is None, f"null corr diverges: {sql}"
    else:
        assert math.isclose(float(s_r), float(d_r), rel_tol=1e-7, abs_tol=1e-9), (
            f"acf lag={lag} bucket={bucket} diverges: {s_r} vs {d_r}: {sql}"
        )


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    period=st.integers(min_value=1, max_value=14),
    pred=atom,
)
def test_generated_pop_growth_agree_across_engines(spark, duck, sf_dir, period, pred):
    """Period-over-period integer-ppm growth (rule 25's all-integer DIV
    discipline) agrees EXACTLY across engines for random periods — the
    ts_period_over_period shape beyond its fixed 1/7 lags. Only the DIV
    spelling differs per dialect (Spark `DIV`, DuckDB `//`)."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")

    def sql(div: str) -> str:
        return f"""
        WITH series AS (
            SELECT date_trunc('day', ts) AS day, count(*) AS n
            FROM events WHERE {pred} GROUP BY date_trunc('day', ts)
        )
        SELECT CAST(day AS DATE) AS day,
               ((n - lag(n, {period}) OVER (ORDER BY day)) * 1000000)
                   {div} lag(n, {period}) OVER (ORDER BY day) AS ppm
        FROM series
        """

    s = {(str(r[0]), r[1]) for r in spark.sql(sql("DIV")).collect()}
    d = {(str(r[0]), r[1]) for r in duck.execute(sql("//")).fetchall()}
    assert s == d, f"pop period={period} diverges: {pred}"


# --------------------------------------------------------------------------
# Stats family (VERDICT r6 item 6): one-way ANOVA's F statistic from the
# two-level aggregate decomposition (SSB/SSW from per-group sums — the
# stats_anova_oneway construction) over random group counts and
# predicates; one dialect-neutral SQL string runs on both engines.
# --------------------------------------------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    k=st.integers(min_value=2, max_value=8),
    pred=atom,
)
def test_generated_anova_f_agrees_across_engines(spark, duck, sf_dir, k, pred):
    """One-way ANOVA F over hash-assigned groups (user_id % k) agrees
    across engines for random group counts — fuzzing the grand-mean /
    between / within sum-of-squares arithmetic stats_anova_oneway fixes at
    one grouping."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    sql = f"""
        WITH g AS (
            SELECT user_id % {k} AS grp, CAST(value AS DOUBLE) AS v
            FROM events WHERE {pred}
        ),
        per AS (
            SELECT grp, count(*) AS n, avg(v) AS m,
                   sum(v * v) AS ss, sum(v) AS s
            FROM g GROUP BY grp
        ),
        tot AS (
            SELECT sum(n) AS n_tot, sum(s) / sum(n) AS gm,
                   count(*) AS k_eff
            FROM per
        )
        SELECT sum(n * (m - gm) * (m - gm)) AS ssb,
               sum(ss - n * m * m) AS ssw,
               max(k_eff) AS k_eff, max(n_tot) AS n_tot
        FROM per CROSS JOIN tot
    """
    s_row = spark.sql(sql).collect()[0]
    d_row = duck.execute(sql).fetchall()[0]
    s_ssb, s_ssw, s_k, s_n = s_row
    d_ssb, d_ssw, d_k, d_n = d_row
    assert (s_k, s_n) == (d_k, d_n), f"group/row counts diverge: {sql}"
    if s_ssb is None or d_ssb is None:
        assert s_ssb is None and d_ssb is None, f"empty-input diverges: {sql}"
        return
    for name, sv, dv in [("ssb", s_ssb, d_ssb), ("ssw", s_ssw, d_ssw)]:
        assert math.isclose(float(sv), float(dv), rel_tol=1e-7, abs_tol=1e-6), (
            f"{name} diverges (k={k}): {sv} vs {dv}: {sql}"
        )
    # the F statistic itself (guarding the degenerate denominators)
    if s_k > 1 and s_n > s_k and float(s_ssw) > 0:
        s_f = (float(s_ssb) / (s_k - 1)) / (float(s_ssw) / (s_n - s_k))
        d_f = (float(d_ssb) / (d_k - 1)) / (float(d_ssw) / (d_n - d_k))
        assert math.isclose(s_f, d_f, rel_tol=1e-6, abs_tol=1e-9), (k, s_f, d_f)

# --------------------------------------------------------------------------
# Sketch family (round 7): agg_countmin / agg_bloom_filter rest on the
# cross-engine md5 hash discipline (PARITY rule 18 family). The fixed
# registry queries pin ONE geometry each; this family samples the geometry
# space (depth, width, member count, predicate) and re-checks both the
# engine agreement and the sketches' one-sided guarantees at every sample.
# --------------------------------------------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    d=st.integers(min_value=2, max_value=6),
    w=st.sampled_from([16, 32, 64, 128]),
    pred=atom,
)
def test_generated_countmin_geometries_agree_across_engines(spark, duck, sf_dir, d, w, pred):
    """Count-Min sketches of random (depth, width) over a random event
    slice: per-key estimates agree across engines AND never undercount."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    spark_sql = f"""
        WITH ev AS (SELECT user_id FROM events WHERE {pred}),
        js AS (SELECT explode(sequence(0, {d - 1})) AS j),
        cells AS (
            SELECT j, conv(substring(md5(cast(concat(cast(j AS STRING), ':',
                                    cast(user_id AS STRING)) AS BINARY)), 1, 8),
                           16, 10) % {w} AS bucket,
                   count(*) AS cell_n
            FROM ev CROSS JOIN js GROUP BY 1, 2
        ),
        truth AS (SELECT user_id, count(*) AS true_n FROM ev GROUP BY 1)
        SELECT t.user_id, t.true_n, min(c.cell_n) AS cms_n
        FROM truth t CROSS JOIN js
        JOIN cells c
          ON c.j = js.j
         AND c.bucket = conv(substring(md5(cast(concat(cast(js.j AS STRING), ':',
                                    cast(t.user_id AS STRING)) AS BINARY)), 1, 8),
                             16, 10) % {w}
        GROUP BY t.user_id, t.true_n
    """
    duck_sql = f"""
        WITH ev AS (SELECT user_id FROM events WHERE {pred}),
        cells AS (
            SELECT j, ('0x' || substr(md5(j::VARCHAR || ':' || user_id::VARCHAR),
                                      1, 8))::BIGINT % {w} AS bucket,
                   count(*)::BIGINT AS cell_n
            FROM ev CROSS JOIN range({d}) AS r(j) GROUP BY 1, 2
        ),
        truth AS (SELECT user_id, count(*)::BIGINT AS true_n FROM ev GROUP BY 1)
        SELECT t.user_id, t.true_n, min(c.cell_n)::BIGINT AS cms_n
        FROM truth t CROSS JOIN range({d}) AS r(j)
        JOIN cells c
          ON c.j = r.j
         AND c.bucket = ('0x' || substr(md5(r.j::VARCHAR || ':'
                                            || t.user_id::VARCHAR), 1, 8))::BIGINT
                        % {w}
        GROUP BY t.user_id, t.true_n
    """
    s_rows = {
        (r.user_id, r.true_n, r.cms_n) for r in spark.sql(spark_sql).collect()
    }
    d_rows = set(map(tuple, duck.execute(duck_sql).fetchall()))
    assert s_rows == d_rows, f"CMS d={d} w={w} pred={pred}"
    for _uid, true_n, cms_n in s_rows:
        assert cms_n >= true_n, f"CMS undercounted: d={d} w={w} pred={pred}"


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    m=st.sampled_from([32, 64, 128, 256]),
    k=st.integers(min_value=1, max_value=4),
    umod=st.integers(min_value=2, max_value=9),
)
def test_generated_bloom_geometries_agree_across_engines(spark, duck, sf_dir, m, k, umod):
    """Bloom filters of random (m, k) over a random member slice (users
    with user_id % umod == 0): per-probe membership verdicts agree across
    engines and never produce a false negative."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    spark_sql = f"""
        WITH members AS (SELECT DISTINCT user_id FROM events
                         WHERE user_id % {umod} = 0),
        ks AS (SELECT explode(sequence(0, {k - 1})) AS k),
        posset AS (
            SELECT DISTINCT conv(substring(md5(cast(concat('b', cast(k AS STRING), ':',
                                cast(user_id AS STRING)) AS BINARY)), 1, 8),
                                16, 10) % {m} AS pos
            FROM members CROSS JOIN ks
        ),
        probes AS (SELECT DISTINCT user_id FROM events)
        SELECT p.user_id,
               CASE WHEN sum(CASE WHEN s.pos IS NOT NULL THEN 1 ELSE 0 END) = {k}
                    THEN 1 ELSE 0 END AS bloom_pos,
               max(CASE WHEN p.user_id % {umod} = 0 THEN 1 ELSE 0 END) AS is_member
        FROM probes p CROSS JOIN ks
        LEFT JOIN posset s
          ON s.pos = conv(substring(md5(cast(concat('b', cast(ks.k AS STRING), ':',
                          cast(p.user_id AS STRING)) AS BINARY)), 1, 8), 16, 10) % {m}
        GROUP BY p.user_id
    """
    duck_sql = f"""
        WITH members AS (SELECT DISTINCT user_id FROM events
                         WHERE user_id % {umod} = 0),
        posset AS (
            SELECT DISTINCT ('0x' || substr(md5('b' || kk.k::VARCHAR || ':'
                              || user_id::VARCHAR), 1, 8))::BIGINT % {m} AS pos
            FROM members CROSS JOIN range({k}) AS kk(k)
        ),
        probes AS (SELECT DISTINCT user_id FROM events)
        SELECT p.user_id,
               CASE WHEN sum(CASE WHEN s.pos IS NOT NULL THEN 1 ELSE 0 END) = {k}
                    THEN 1 ELSE 0 END AS bloom_pos,
               max(CASE WHEN p.user_id % {umod} = 0 THEN 1 ELSE 0 END) AS is_member
        FROM probes p CROSS JOIN range({k}) AS kk(k)
        LEFT JOIN posset s
          ON s.pos = ('0x' || substr(md5('b' || kk.k::VARCHAR || ':'
                      || p.user_id::VARCHAR), 1, 8))::BIGINT % {m}
        GROUP BY p.user_id
    """
    s_rows = {
        (r.user_id, r.bloom_pos, r.is_member) for r in spark.sql(spark_sql).collect()
    }
    d_rows = set(map(tuple, duck.execute(duck_sql).fetchall()))
    assert s_rows == d_rows, f"Bloom m={m} k={k} umod={umod}"
    for _uid, bloom_pos, is_member in s_rows:
        if is_member:
            assert bloom_pos == 1, f"Bloom false negative: m={m} k={k} umod={umod}"


# --------------------------------------------------------------------------
# Histogram-quantile family (round 7): agg_quantile_histogram pins three
# fixed quantiles; this samples the (quantile, predicate, key) space with
# the same integer-ceiling order-statistic construction on both engines.
# --------------------------------------------------------------------------


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    qnum=st.integers(min_value=1, max_value=99),
    pred=atom,
    key=st.sampled_from(["event_type", "user_id % 7"]),
)
def test_generated_histogram_quantiles_agree_across_engines(spark, duck, sf_dir, qnum, pred, key):
    """The q-th discrete quantile from the cumulative cents histogram —
    random q, random slice, random group key — matches exactly (integer
    ceilings, no interpolation anywhere)."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    # ceil(q*n/100) with pure integer math: (q*n + 99) DIV 100 — spelled
    # per-dialect (DuckDB `//`, Spark `DIV`), everything else identical:
    s_sql = f"""
        WITH hist AS (
            SELECT {key} AS k, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                   count(*) AS cnt
            FROM events WHERE {pred} GROUP BY 1, 2
        ),
        cum AS (
            SELECT k, cents,
                   sum(cnt) OVER (PARTITION BY k ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
                   sum(cnt) OVER (PARTITION BY k) AS n
            FROM hist
        )
        SELECT k, max(n) AS n,
               min(CASE WHEN cum_n >= ({qnum} * n + 99) DIV 100 THEN cents END)
                   AS q_cents
        FROM cum GROUP BY k
    """
    d_sql = f"""
        WITH hist AS (
            SELECT {key} AS k, floor(value * 100 + 0.5)::BIGINT AS cents,
                   count(*)::BIGINT AS cnt
            FROM events WHERE {pred} GROUP BY 1, 2
        ),
        cum AS (
            SELECT k, cents,
                   sum(cnt) OVER (PARTITION BY k ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                       AS cum_n,
                   sum(cnt) OVER (PARTITION BY k)::BIGINT AS n
            FROM hist
        )
        SELECT k, max(n)::BIGINT AS n,
               min(CASE WHEN cum_n >= ({qnum} * n + 99) // 100 THEN cents END)::BIGINT
                   AS q_cents
        FROM cum GROUP BY k
    """
    s_rows = {(r.k, r.n, r.q_cents) for r in spark.sql(s_sql).collect()}
    d_rows = set(map(tuple, duck.execute(d_sql).fetchall()))
    assert s_rows == d_rows, f"q={qnum} key={key} pred={pred}"


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    t1=st.integers(min_value=3, max_value=15),
    t2=st.integers(min_value=16, max_value=29),
    win=st.integers(min_value=1, max_value=3),
)
def test_generated_snapshot_diffs_agree_across_engines(spark, duck, sf_dir, t1, t2, win):
    """cdc_snapshot_diff's full-outer changeset derivation at random
    cutoffs/window widths — the I/U/D classification and exact-integer
    unchanged-suppression agree across engines."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    body = """
        WITH s1 AS (
            SELECT user_id, count(*) AS n
            FROM events WHERE day(ts) >= {lo1} AND day(ts) < {t1}
            GROUP BY user_id
        ),
        s2 AS (
            SELECT user_id, count(*) AS n
            FROM events WHERE day(ts) >= {lo2} AND day(ts) < {t2}
            GROUP BY user_id
        )
        SELECT coalesce(s1.user_id, s2.user_id) AS user_id,
               CASE WHEN s1.user_id IS NULL THEN 'insert'
                    WHEN s2.user_id IS NULL THEN 'delete'
                    ELSE 'update' END AS change_type,
               s1.n AS old_n, s2.n AS new_n
        FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
        WHERE s1.user_id IS NULL OR s2.user_id IS NULL OR s1.n != s2.n
    """
    sql = body.format(lo1=t1 - win, t1=t1, lo2=t2 - win, t2=t2)
    s_rows = {
        (r.user_id, r.change_type, r.old_n, r.new_n)
        for r in spark.sql(sql).collect()
    }
    d_rows = set(map(tuple, duck.execute(sql).fetchall()))
    assert s_rows == d_rows, f"t1={t1} t2={t2} win={win}"


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cell=st.sampled_from([5.0, 10.0, 20.0, 30.0]),
    pred=atom,
)
def test_generated_spatial_islands_agree_across_engines(spark, duck, sf_dir, cell, pred):
    """geo_dwell_segments' island algebra at random cell sizes over random
    event slices: per-(user, cell) visit counts and fix counts agree
    across engines (one dialect-neutral SQL string on both)."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    sql = f"""
        WITH fixes AS (
            SELECT user_id,
                   CAST(floor(((value - floor(value / 170.0) * 170.0) - 85.0)
                              / {cell}) AS BIGINT) AS latc,
                   ts, event_id
            FROM events WHERE {pred}
        ),
        flagged AS (
            SELECT user_id, latc,
                   CASE WHEN lag(latc) OVER w IS NULL
                             OR lag(latc) OVER w != latc
                        THEN 1 ELSE 0 END AS new_seg
            FROM fixes WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, latc,
               CAST(sum(new_seg) AS BIGINT) AS n_visits,
               CAST(count(*) AS BIGINT) AS n_fixes
        FROM flagged GROUP BY user_id, latc
    """
    s_rows = {
        (r.user_id, r.latc, r.n_visits, r.n_fixes) for r in spark.sql(sql).collect()
    }
    d_rows = set(map(tuple, duck.execute(sql).fetchall()))
    assert s_rows == d_rows, f"cell={cell} pred={pred}"


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cutoff=st.integers(min_value=5, max_value=27),
    umod=st.integers(min_value=2, max_value=7),
)
def test_generated_markov_holdouts_agree_across_engines(spark, duck, sf_dir, cutoff, umod):
    """seq_markov_holdout's train/score shape at random cutoff days over
    random user slices — Laplace-smoothed transition log-likelihoods agree
    across engines (ONE dialect-neutral SQL string; ln is the only
    transcendental, compared after a 6-dp round per rule 8)."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    sql = f"""
        WITH ordered AS (
            SELECT user_id, event_type, day(ts) AS d, ts, event_id
            FROM events WHERE user_id % {umod} = 0
        ),
        train AS (
            SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_ft FROM (
                SELECT lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS from_type,
                       event_type AS to_type
                FROM ordered WHERE d < {cutoff}
            ) WHERE from_type IS NOT NULL GROUP BY from_type, to_type
        ),
        train_from AS (
            SELECT from_type, CAST(sum(n_ft) AS BIGINT) AS n_f FROM train GROUP BY from_type
        ),
        states AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS s FROM events),
        test AS (
            SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_obs FROM (
                SELECT lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS from_type,
                       event_type AS to_type
                FROM ordered WHERE d >= {cutoff}
            ) WHERE from_type IS NOT NULL GROUP BY from_type, to_type
        )
        SELECT CAST(sum(t.n_obs) AS BIGINT) AS n_test,
               round(-sum(t.n_obs * ln((coalesce(tr.n_ft, 0) + 1)
                          / CAST(coalesce(tf.n_f, 0) + states.s AS DOUBLE)))
                     / sum(t.n_obs), 6) AS avg_nll
        FROM test t
        LEFT JOIN train tr ON tr.from_type = t.from_type AND tr.to_type = t.to_type
        LEFT JOIN train_from tf ON tf.from_type = t.from_type
        CROSS JOIN states
    """
    s_rows = [(r.n_test, r.avg_nll) for r in spark.sql(sql).collect()]
    d_rows = duck.execute(sql).fetchall()
    assert s_rows == [tuple(r) for r in d_rows], f"cutoff={cutoff} umod={umod}"


# --------------------------------------------------------------------------
# Chunk-band family (round 8, VERDICT r7 item 9): mm_phash_band /
# corpus_multimodal_pipeline pin ONE (chunk width, chunk count, band
# threshold, mutation) geometry; this samples the space — random widths,
# thresholds, and mutation suffixes — with the same staged
# originals+variants universe, positional chunk fingerprints, and (k, hash)
# band join on both engines. Catches the failure class a fixed geometry
# can't: off-by-one chunk boundaries, threshold fencepost, hex-case or
# md5-domain drift between the dialects.
# --------------------------------------------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    width=st.integers(min_value=8, max_value=96),
    nchunks=st.integers(min_value=4, max_value=16),
    thresh=st.integers(min_value=2, max_value=6),
    mut=st.sampled_from([" v2", "!", " rev-B", "xx"]),
    nmut=st.integers(min_value=5, max_value=25),
)
def test_generated_chunk_bands_agree_across_engines(
    spark, duck, sf_dir, width, nchunks, thresh, mut, nmut
):
    """mm_phash_band's banding algebra at a random geometry: stage
    originals (eid = doc*10) plus tail-mutated variants (eid = doc*10+2,
    random suffix) straight from the documents table, fingerprint each
    entity as md5s of `width`-hex-char positional slices, pair entities
    sharing >= `thresh` of the `nchunks` chunk hashes through the
    (k, hash) inverted index, and score integer Jaccard ppm. Both engines
    run the same dialect-split SQL; pair sets and ppm must agree exactly."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    # only the chunk expansion and integer division are dialect-split
    common_entities = f"""
        SELECT doc_id * 10 + 0 AS eid, {{hex_fn}} AS hx
        FROM documents WHERE doc_id < 30
        UNION ALL
        SELECT doc_id * 10 + 2 AS eid, {{hex_mut_fn}} AS hx
        FROM documents WHERE doc_id < {nmut}
    """
    tail = f"""
    ,
    sizes AS (SELECT eid, CAST(count(*) AS BIGINT) AS n_chunks FROM chunks GROUP BY eid),
    pairs AS (
        SELECT a.eid AS eid_a, b.eid AS eid_b, CAST(count(*) AS BIGINT) AS n_shared
        FROM chunks a JOIN chunks b
          ON a.k = b.k AND a.ch = b.ch AND a.eid < b.eid
        GROUP BY a.eid, b.eid
        HAVING count(*) >= {thresh}
    )
    SELECT p.eid_a, p.eid_b, p.n_shared,
           CAST(p.n_shared * 1000000 {{intdiv}}
                nullif(sa.n_chunks + sb.n_chunks - p.n_shared, 0) AS BIGINT)
               AS ppm
    FROM pairs p
    JOIN sizes sa ON sa.eid = p.eid_a
    JOIN sizes sb ON sb.eid = p.eid_b
    """
    s_sql = (
        "WITH entities AS ("
        + common_entities.format(
            hex_fn="hex(cast(text as binary))",
            hex_mut_fn=f"hex(cast(concat(text, '{mut}') as binary))",
        )
        + f"""),
    chunks AS (
        SELECT eid, k, md5(cast(substr(hx, k * {width} + 1, {width}) as binary)) AS ch
        FROM entities
        LATERAL VIEW explode(sequence(0, {nchunks - 1})) t AS k
        WHERE k * {width} < length(hx)
    )"""
        + tail.format(intdiv="DIV")
    )
    d_sql = (
        "WITH entities AS ("
        + common_entities.format(
            hex_fn="to_hex(text::BLOB)",
            hex_mut_fn=f"to_hex((text || '{mut}')::BLOB)",
        )
        + f"""),
    chunks AS (
        SELECT eid, r.k AS k, md5(substr(hx, r.k * {width} + 1, {width})) AS ch
        FROM entities CROSS JOIN range({nchunks}) AS r(k)
        WHERE r.k * {width} < length(hx)
    )"""
        + tail.format(intdiv="//")
    )
    s_rows = {
        (r.eid_a, r.eid_b, r.n_shared, r.ppm) for r in spark.sql(s_sql).collect()
    }
    d_rows = set(map(tuple, duck.execute(d_sql).fetchall()))
    assert s_rows == d_rows, (
        f"w={width} k={nchunks} t={thresh} mut={mut!r} nmut={nmut}: "
        f"spark-only={sorted(s_rows - d_rows)[:5]} duck-only={sorted(d_rows - s_rows)[:5]}"
    )
    # structural floor: tail mutation preserves every COMPLETE prefix chunk
    # of the original, so a pair shares min(nchunks, floor(L/width)) chunks;
    # when the sampled threshold is at or below that floor, every mutated
    # doc's original<->variant pair must surface (fixture docs are >= 108
    # hex chars at every sf; 60 keeps the bound conservative)
    if thresh <= min(nchunks, 60 // width):
        expected = {(d * 10, d * 10 + 2) for d in range(nmut)}
        got = {(a, b) for a, b, _, _ in s_rows}
        assert expected <= got, sorted(expected - got)[:5]


# --------------------------------------------------------------------------
# Deletion-neighborhood family (round 8): er_record_linkage pins ONE
# (window start, mutation modulus, variant density) geometry; this samples
# the space — random window origins, mutation positions, and dirty-record
# densities — with the same in-plan originals+variants universe, SymSpell
# deletion keys, and length-gated single-deletion verify on both engines.
# Catches the failure class a fixed geometry can't: substr off-by-one
# between the dialects' deletion expansion, length-gate fenceposts, and
# any levenshtein semantic drift.
# --------------------------------------------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ws=st.integers(min_value=5, max_value=12),
    mmod=st.integers(min_value=2, max_value=6),
    vmod=st.sampled_from([2, 3, 4]),
)
def test_generated_deletion_linkage_agrees_across_engines(
    spark, duck, sf_dir, ws, mmod, vmod
):
    """er_record_linkage's deletion-key algebra at a random geometry:
    originals plus variants dropping ONE char at position ws+(key%mmod)
    inside the window starting at ws, linked through self-key = deletion-
    key collisions with the |Δlen|=1 single-deletion verify. Pair sets
    must agree exactly between engines, and every generated variant must
    link back to its base (the blocking-recall floor: the drop position is
    inside the window by construction, so the base's deletion
    neighborhood always contains the variant's window)."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    base_univ = f"""
        SELECT c_custkey AS rec_id, lower(c_name) AS name, c_nationkey AS nation
        FROM customer
        UNION ALL
        SELECT c_custkey + 10000000 AS rec_id,
               substr(lower(c_name), 1, {ws - 1} + c_custkey % {mmod})
                 || substr(lower(c_name), {ws + 1} + c_custkey % {mmod}, 50) AS name,
               c_nationkey AS nation
        FROM customer WHERE c_custkey % {vmod} = 0
    """
    tail = f"""
    ,
    cand AS (
        SELECT DISTINCT d.rec_id AS id_a, s.rec_id AS id_b,
               d.name AS name_a, s.name AS name_b
        FROM dels d
        JOIN windows s
          ON d.nation = s.nation AND d.delkey = s.w
         AND length(s.name) + 1 = length(d.name)
    )
    SELECT id_a, id_b FROM cand WHERE levenshtein(name_a, name_b) = 1
    """
    s_sql = (
        f"WITH dirty AS ({base_univ}), "
        f"windows AS (SELECT rec_id, name, nation, substr(name, {ws}, 50) AS w FROM dirty), "
        f"""dels AS (
            SELECT DISTINCT rec_id, name, nation,
                   concat(substr(w, 1, i), substr(w, i + 2, 50)) AS delkey
            FROM windows
            LATERAL VIEW explode(sequence(0, length(w) - 1)) t AS i
        )"""
        + tail
    )
    d_sql = (
        f"WITH dirty AS ({base_univ}), "
        f"windows AS (SELECT rec_id, name, nation, substr(name, {ws}, 50) AS w FROM dirty), "
        f"""dels AS (
            SELECT DISTINCT rec_id, name, nation,
                   substr(w, 1, i) || substr(w, i + 2, 50) AS delkey
            FROM windows, unnest(range(len(w))) t(i)
        )"""
        + tail
    )
    s_rows = {(r.id_a, r.id_b) for r in spark.sql(s_sql).collect()}
    d_rows = set(map(tuple, duck.execute(d_sql).fetchall()))
    assert s_rows == d_rows, (
        f"ws={ws} mmod={mmod} vmod={vmod}: "
        f"spark-only={sorted(s_rows - d_rows)[:5]} duck-only={sorted(d_rows - s_rows)[:5]}"
    )
    n_var = duck.execute(
        f"SELECT count(*) FROM customer WHERE c_custkey % {vmod} = 0"
    ).fetchone()[0]
    true_pairs = {(a, b) for a, b in s_rows if b - 10000000 == a}
    assert len(true_pairs) == n_var, (
        f"recall floor broken: {len(true_pairs)}/{n_var} at ws={ws} mmod={mmod} vmod={vmod}"
    )


# --------------------------------------------------------------------------
# SAX-geometry family (round 8): ts_sax pins ONE (W=8, quartile
# breakpoints) geometry; this samples segment counts, breakpoint scales
# and user slices — same integer PAA + identical-expression-tree float
# z-comparison on both engines. Catches segment-assignment fenceposts
# ((r*W) div n coverage), PAA integer-division drift, and any breakpoint
# comparison asymmetry between the dialects.
# --------------------------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    w=st.integers(min_value=2, max_value=12),
    bp=st.sampled_from([0.4307, 0.6745, 0.9674, 1.2816]),
    umod=st.integers(min_value=1, max_value=4),
)
def test_generated_sax_words_agree_across_engines(spark, duck, sf_dir, w, bp, umod):
    """SAX at a random geometry: W PAA segments over each user's daily
    cents series (users sliced by id % umod), symbols at ±bp and 0.
    Words must agree exactly — the float z-comparisons are identical
    expression trees over exact integers, so any disagreement is a real
    algebra bug, not tolerance."""
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    body = f"""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE user_id % {umod} = 0 GROUP BY 1, 2
    ),
    indexed AS (
        SELECT user_id, cents,
               row_number() OVER (PARTITION BY user_id ORDER BY day) - 1 AS r,
               count(*) OVER (PARTITION BY user_id) AS n_days
        FROM daily
    ),
    paa AS (
        SELECT user_id, (r * {w}) {{intdiv}} n_days AS seg,
               CAST(sum(cents) {{intdiv}} count(*) AS BIGINT) AS m
        FROM indexed WHERE n_days >= {w}
        GROUP BY user_id, (r * {w}) {{intdiv}} n_days
    ),
    stats AS (
        SELECT user_id, CAST(sum(m) AS BIGINT) AS s,
               CAST(sum(m * m) AS BIGINT) AS s2
        FROM paa GROUP BY user_id
    ),
    symbols AS (
        SELECT p.user_id, p.seg,
               CASE WHEN (st.s2 - st.s / {w}.0 * st.s) <= 0 THEN 'c'
                    WHEN (p.m - st.s / {w}.0)
                         < -{bp} * sqrt((st.s2 - st.s / {w}.0 * st.s) / {w}.0)
                         THEN 'a'
                    WHEN (p.m - st.s / {w}.0) < 0 THEN 'b'
                    WHEN (p.m - st.s / {w}.0)
                         < {bp} * sqrt((st.s2 - st.s / {w}.0 * st.s) / {w}.0)
                         THEN 'c'
                    ELSE 'd' END AS sym
        FROM paa p JOIN stats st ON p.user_id = st.user_id
    )
    SELECT user_id, {{word}} AS word FROM symbols GROUP BY user_id
    """
    s_sql = body.format(
        intdiv="DIV",
        word="listagg(sym, '') WITHIN GROUP (ORDER BY seg)",
    )
    d_sql = body.format(intdiv="//", word="string_agg(sym, '' ORDER BY seg)")
    s_rows = {(r.user_id, r.word) for r in spark.sql(s_sql).collect()}
    d_rows = set(map(tuple, duck.execute(d_sql).fetchall()))
    assert s_rows == d_rows, (
        f"w={w} bp={bp} umod={umod}: "
        f"spark-only={sorted(s_rows - d_rows)[:3]} duck-only={sorted(d_rows - s_rows)[:3]}"
    )
    for _, word in s_rows:
        assert len(word) == w


# --------------------------------------------------------------------------
# BPE-round family (round 8): text_bpe_train pins K=3 rounds over the full
# corpus; this samples ONE round at random corpus slices — same lead()
# bigram counts, total-order argmax, and gaps-and-islands greedy leftmost
# application on both engines. The island odd-rank trick is the riskiest
# algebra in the op (it replaces a sequential scan); the family checks the
# selected merge POSITIONS and the rebuilt token count, where an island
# fencepost would show first.
# --------------------------------------------------------------------------


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    dmod=st.integers(min_value=1, max_value=5),
    off=st.integers(min_value=0, max_value=3),
)
def test_generated_bpe_rounds_agree_across_engines(spark, duck, sf_dir, dmod, off):
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    body = f"""
    WITH t0 AS (
        SELECT doc_id, pos, tok FROM ({{explode}}) x
        WHERE doc_id % {dmod} = {off % dmod}
    ),
    big AS (
        SELECT doc_id, pos, tok,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM t0
    ),
    cnt AS (
        SELECT tok AS l, nxt AS r, CAST(count(*) AS BIGINT) AS c
        FROM big WHERE nxt IS NOT NULL GROUP BY tok, nxt
    ),
    top1 AS (SELECT l, r, c FROM cnt ORDER BY c DESC, l ASC, r ASC LIMIT 1),
    m AS (
        SELECT b.doc_id, b.pos,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) AS rn
        FROM big b, top1 WHERE b.tok = top1.l AND b.nxt = top1.r
    ),
    s AS (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY doc_id, pos - rn ORDER BY pos) AS kk
            FROM m
        ) z WHERE kk % 2 = 1
    ),
    rebuilt AS (
        SELECT b.doc_id, b.pos
        FROM big b
        LEFT JOIN s s2 ON b.doc_id = s2.doc_id AND b.pos = s2.pos + 1
        WHERE s2.pos IS NULL
    )
    SELECT (SELECT l FROM top1) AS l, (SELECT r FROM top1) AS r,
           (SELECT c FROM top1) AS c,
           (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_merges,
           (SELECT CAST(count(*) AS BIGINT) FROM rebuilt) AS tokens_after
    """
    s_sql = body.format(
        explode="SELECT doc_id, pos, tok FROM documents"
        " LATERAL VIEW posexplode(split(text, ' ')) t AS pos, tok"
    )
    d_sql = body.format(
        explode="SELECT doc_id, i AS pos, toks[i + 1] AS tok FROM"
        " (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),"
        " unnest(range(len(toks))) u(i)"
    )
    s_row = spark.sql(s_sql).collect()[0]
    d_row = duck.execute(d_sql).fetchone()
    assert (s_row.l, s_row.r, s_row.c, s_row.n_merges, s_row.tokens_after) == tuple(d_row), (
        f"dmod={dmod} off={off}: spark={tuple(s_row)} duck={tuple(d_row)}"
    )
    # structural law: each merge removes exactly one token
    n0 = duck.execute(
        f"SELECT sum(len(string_split(text,' '))) FROM documents WHERE doc_id % {dmod} = {off % dmod}"
    ).fetchone()[0]
    assert s_row.tokens_after == n0 - s_row.n_merges


# --------------------------------------------------------------------------
# CDC chunk-geometry family (round 9): mm_cdc_dedup pins (W=8, nibble='0');
# this samples random window widths and boundary densities over corpus
# slices — same windowed-md5 predicate, forced end boundary, lag-span
# chunking, and keep-first dedup on both engines. The riskiest geometry is
# the short-blob edge (Spark sequence() counts DOWN where DuckDB
# generate_series is empty — the guard this family exists to hold) and the
# boundary/chunk fencepost at the forced end.
# --------------------------------------------------------------------------


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    w=st.integers(min_value=3, max_value=14),
    nib=st.sampled_from(["0", "1", "3", "7"]),  # P = 1/16 .. 8/16 boundary density
    dmod=st.integers(min_value=1, max_value=4),
)
def test_generated_cdc_geometries_agree_across_engines(spark, duck, sf_dir, w, nib, dmod):
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    body = f"""
    WITH docs AS (
        SELECT doc_id, text, length(text) AS len FROM documents
        WHERE length(text) >= 1 AND doc_id % {dmod} = 0
    ),
    bnd AS (
        SELECT doc_id, i FROM ({{positions}}) z
        WHERE substr(md5(substring(text, i - {w} + 1, {w})), 1, 1) <= '{nib}'
        UNION ALL
        SELECT doc_id, len AS i FROM docs
    ),
    spans AS (
        SELECT doc_id,
               coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) AS s,
               i AS e
        FROM bnd
    ),
    chunks AS (
        SELECT sp.doc_id, sp.s, CAST(sp.e - sp.s AS BIGINT) AS cb,
               md5(substring(d.text, sp.s + 1, sp.e - sp.s)) AS h
        FROM spans sp JOIN docs d ON sp.doc_id = d.doc_id
    ),
    ranked AS (
        SELECT cb, row_number() OVER (PARTITION BY h ORDER BY doc_id, s) AS rn
        FROM chunks
    )
    SELECT CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(cb) AS BIGINT) AS n_bytes,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           CAST(sum(CASE WHEN rn > 1 THEN cb ELSE 0 END) AS BIGINT) AS dup_bytes
    FROM ranked
    """
    s_sql = body.format(
        positions=f"SELECT doc_id, text, i FROM docs"
        f" LATERAL VIEW explode(sequence({w}, len - 1)) t AS i WHERE len > {w}"
    )
    d_sql = body.format(
        positions=f"SELECT doc_id, text, i FROM docs,"
        f" unnest(generate_series({w}, len - 1)) t(i)"
    )
    s_row = tuple(spark.sql(s_sql).collect()[0])
    d_row = tuple(duck.execute(d_sql).fetchone())
    assert s_row == d_row, f"w={w} nib={nib} dmod={dmod}: spark={s_row} duck={d_row}"
    # conservation: chunking partitions the corpus slice byte-for-byte
    n_bytes = duck.execute(
        f"SELECT CAST(sum(length(text)) AS BIGINT) FROM documents"
        f" WHERE length(text) >= 1 AND doc_id % {dmod} = 0"
    ).fetchone()[0]
    assert s_row[1] == n_bytes


# --------------------------------------------------------------------------
# Unigram-LM lattice family (round 10, VERDICT r9 items 5/9): random piece
# inventories (uni_l), DP depths (uni_wmax) and corpus slices through the
# GENERATED chained-CTE Viterbi twin on DuckDB vs a sequential pure-Python
# Viterbi — cross-algebra: the unrolled relational DP must equal the
# textbook dynamic program at every geometry.
# --------------------------------------------------------------------------


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    uni_l=st.integers(min_value=1, max_value=4),
    uni_wmax=st.integers(min_value=4, max_value=12),
    dmod=st.integers(min_value=1, max_value=4),
)
def test_generated_unigram_lattices_agree_with_python_viterbi(
    duck, sf_dir, uni_l, uni_wmax, dmod
):
    import math

    from rvi_big_data_api_spark.operators.llm_text import _unigram_oracle_sql

    src = f"(SELECT * FROM documents WHERE doc_id % {dmod} = 0)"
    sql = _unigram_oracle_sql(uni_l=uni_l, uni_wmax=uni_wmax, src=src)
    got = {
        r[0]: (r[1], r[2], r[3], r[4], r[5])
        for r in duck.execute(sql).fetchall()
    }
    # sequential replica on the same slice
    texts = duck.execute(
        f"SELECT text FROM documents WHERE doc_id % {dmod} = 0"
    ).fetchall()
    wcnt: dict = {}
    for (t,) in texts:
        for w in t.split(" "):
            if 1 <= len(w) <= uni_wmax:
                wcnt[w] = wcnt.get(w, 0) + 1
    pcnt: dict = {}
    for w, c in wcnt.items():
        for s0 in range(len(w)):
            for k in range(1, min(uni_l, len(w) - s0) + 1):
                pcnt[w[s0 : s0 + k]] = pcnt.get(w[s0 : s0 + k], 0) + c
    tot = sum(pcnt.values())
    cost = {p: math.floor(-math.log(c / tot) * 1e6 + 0.5) for p, c in pcnt.items()}

    def viterbi(w):
        dp, back = [0] + [None] * len(w), [0] * (len(w) + 1)
        for i in range(1, len(w) + 1):
            enc = min(
                (dp[i - k] + cost[w[i - k : i]]) * 16 + k
                for k in range(1, min(uni_l, i) + 1)
            )
            dp[i], back[i] = enc // 16, enc % 16
        out, pos = [], len(w)
        while pos > 0:
            out.append(w[pos - back[pos] : pos])
            pos -= back[pos]
        return out

    used: dict = {}
    for w, c in wcnt.items():
        for p in viterbi(w):
            used[p] = used.get(p, 0) + c
    tu = sum(used.values())
    want = {
        p: (len(p), pcnt[p], cost[p], u, u * 1_000_000 // tu)
        for p, u in used.items()
    }
    assert got == want, f"uni_l={uni_l} wmax={uni_wmax} dmod={dmod}"


# --------------------------------------------------------------------------
# Support-histogram midrank family (round 10, VERDICT r9 items 2/9):
# agg_mannwhitney_u / stats_effect_sizes now register the Kruskal-style
# histogram ranking (2*midrank = 2*(cum-t)+t+1 over the value SUPPORT);
# this proves the ALGEBRA at random tie densities by running the
# SUPPORT-HISTOGRAM construction on Spark against the NAIVE global
# row_number+avg midrank construction on DuckDB — cross-algebra AND
# cross-engine in one comparison. High qdiv -> coarse values -> huge ties.
# --------------------------------------------------------------------------


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    qdiv=st.sampled_from([1, 100, 2500, 50000]),
    umod=st.integers(min_value=1, max_value=3),
    nib=st.sampled_from(["4", "8", "c"]),  # arm split point
)
def test_generated_support_midranks_agree_with_naive_rank(
    spark, duck, sf_dir, qdiv, umod, nib
):
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    per = f"""
        SELECT user_id,
               CASE WHEN substr(md5(CAST(user_id AS {{strty}})), 1, 1) < '{nib}'
                    THEN 'control' ELSE 'treatment' END AS arm,
               CAST(floor(sum(CASE WHEN event_type = 'purchase'
                                   THEN value ELSE 0 END) * 100 + 0.5)
                    AS BIGINT) / {qdiv} AS v
        FROM events WHERE user_id % {umod} = 0 GROUP BY user_id
    """
    per_s, per_d = per.format(strty="STRING"), per.format(strty="VARCHAR")
    # Spark: histogram ranking over the value support — exact BIGINT sums
    s_sql = f"""
    WITH per_user AS ({per_s}),
    cnt AS (SELECT arm, v, CAST(count(*) AS BIGINT) AS n_av
            FROM per_user GROUP BY arm, v),
    vrank AS (
        SELECT v, CAST(2 * (cum - t) + t + 1 AS BIGINT) AS r2
        FROM (SELECT v, CAST(sum(n_av) AS BIGINT) AS t,
                     CAST(sum(sum(n_av)) OVER (ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS BIGINT) AS cum
              FROM cnt GROUP BY v) z
    )
    SELECT CAST(sum(CASE WHEN c.arm = 'control' THEN c.n_av * k.r2
                         ELSE 0 END) AS BIGINT) AS r2_c,
           CAST(sum(CASE WHEN c.arm = 'control' THEN c.n_av ELSE 0 END)
                AS BIGINT) AS n_c
    FROM cnt c JOIN vrank k ON c.v = k.v
    """
    # DuckDB: the naive construction — global row_number + per-value avg
    d_sql = f"""
    WITH per_user AS ({per_d}),
    ranked AS (
        SELECT arm, v,
               avg(rn) OVER (PARTITION BY v) AS midrank
        FROM (SELECT arm, v,
                     row_number() OVER (ORDER BY v, user_id) * 1.0 AS rn
              FROM per_user) z
    )
    SELECT (sum(CASE WHEN arm = 'control' THEN midrank END) * 2)::BIGINT
               AS r2_c,
           sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)::BIGINT AS n_c
    FROM ranked
    """
    # DuckDB integer division semantics differ from Spark's CAST(... )/q:
    # both engines compute v identically here because / {qdiv} on BIGINT is
    # float division in BOTH dialects and the quotient of cents by 1/100/...
    # at these magnitudes is exactly representable.
    s_row = tuple(spark.sql(s_sql).collect()[0])
    d_row = tuple(duck.execute(d_sql).fetchone())
    assert s_row == d_row, f"qdiv={qdiv} umod={umod} nib={nib}: {s_row} != {d_row}"


# --------------------------------------------------------------------------
# Clamped-CDC family (round 10, VERDICT r9 item 6): random clamp widths
# through the MIN-merge + MAX-split geometry, cross-engine (Spark SQL vs
# DuckDB) AND cross-algebra (relational passes vs the sequential pure-Python
# replica in test_round10_properties). Low cmin exercises the no-merge path,
# cmin >> mean gap merges almost everything and forces the split pass.
# --------------------------------------------------------------------------


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    w=st.integers(min_value=4, max_value=12),
    nib=st.sampled_from(["0", "3", "7"]),
    cmin=st.integers(min_value=2, max_value=40),
    cmax_extra=st.integers(min_value=1, max_value=60),
)
def test_generated_clamped_cdc_geometries_agree_across_engines(
    spark, duck, sf_dir, w, nib, cmin, cmax_extra
):
    from rvi_big_data_api_spark.io import load

    cmax = cmin + cmax_extra  # cmax > cmin always
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    body = f"""
    WITH docs AS (
        SELECT doc_id, text, length(text) AS len FROM documents
        WHERE length(text) >= 1 AND doc_id % 3 = 0
    ),
    bnd AS (
        SELECT doc_id, i, FALSE AS forced FROM ({{positions}}) z
        WHERE substr(md5(substring(text, i - {w} + 1, {w})), 1, 1) <= '{nib}'
        UNION ALL
        SELECT doc_id, len AS i, TRUE AS forced FROM docs
    ),
    gaps AS (
        SELECT doc_id, i, forced,
               i - coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0)
                   AS gap
        FROM bnd
    ),
    surv AS (SELECT doc_id, i FROM gaps WHERE forced OR gap >= {cmin}),
    spans AS (
        SELECT doc_id,
               coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) AS s,
               i AS e
        FROM surv
    ),
    sub AS (SELECT doc_id, s, e, k FROM ({{splits}}) z2),
    chunks AS (
        SELECT c.doc_id, (c.s + c.k * {cmax}) AS cs,
               CAST(least(c.s + (c.k + 1) * {cmax}, c.e)
                    - (c.s + c.k * {cmax}) AS BIGINT) AS cb,
               md5(substring(d.text, c.s + c.k * {cmax} + 1,
                             least(c.s + (c.k + 1) * {cmax}, c.e)
                             - (c.s + c.k * {cmax}))) AS h
        FROM sub c JOIN docs d ON c.doc_id = d.doc_id
    ),
    ranked AS (
        SELECT cb, row_number() OVER (PARTITION BY h ORDER BY doc_id, cs) AS rn
        FROM chunks
    )
    SELECT CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(cb) AS BIGINT) AS n_bytes,
           CAST(max(cb) AS BIGINT) AS max_chunk,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           CAST(sum(CASE WHEN rn > 1 THEN cb ELSE 0 END) AS BIGINT) AS dup_bytes
    FROM ranked
    """
    s_sql = body.format(
        positions=f"SELECT doc_id, text, i FROM docs"
        f" LATERAL VIEW explode(sequence({w}, len - 1)) t AS i WHERE len > {w}",
        splits=f"SELECT doc_id, s, e, k FROM spans"
        f" LATERAL VIEW explode(sequence(0, (e - s - 1) div {cmax})) t2 AS k",
    )
    d_sql = body.format(
        positions=f"SELECT doc_id, text, i FROM docs,"
        f" unnest(generate_series({w}, len - 1)) t(i)",
        splits=f"SELECT doc_id, s, e, k FROM spans,"
        f" unnest(generate_series(0, (e - s - 1) // {cmax})) t2(k)",
    )
    s_row = tuple(spark.sql(s_sql).collect()[0])
    d_row = tuple(duck.execute(d_sql).fetchone())
    assert s_row == d_row, f"w={w} nib={nib} clamp=[{cmin},{cmax}]: {s_row} != {d_row}"
    # clamp soundness: chunks bounded above; conservation byte-for-byte
    assert s_row[2] <= cmax
    n_bytes = duck.execute(
        "SELECT CAST(sum(length(text)) AS BIGINT) FROM documents"
        " WHERE length(text) >= 1 AND doc_id % 3 = 0"
    ).fetchone()[0]
    assert s_row[1] == n_bytes


# --------------------------------------------------------------------------
# Histogram-boundary bucketing family (round 9): eval_lift_table /
# corpus_curriculum_order now register the boundary plan (VERDICT r8 item
# 2); this proves the ALGEBRA at random bucket counts and tie densities by
# running the HISTOGRAM-BOUNDARY construction on Spark against the NAIVE
# global-rank construction on DuckDB — cross-algebra AND cross-engine in one
# comparison. High qdiv -> coarse scores -> many ties -> every boundary
# straddles, exercising the partitioned tiebreak path hardest.
# --------------------------------------------------------------------------


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    b=st.integers(min_value=2, max_value=13),
    qdiv=st.sampled_from([1, 100, 2500, 50000]),
    umod=st.integers(min_value=1, max_value=3),
)
def test_generated_histogram_boundary_buckets_agree_across_engines(
    spark, duck, sf_dir, b, qdiv, umod
):
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    per = f"""
        SELECT user_id AS uid,
               CAST(floor(sum(value * 100 + 0.5)) AS BIGINT) / {qdiv} AS sc,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS lb
        FROM events WHERE user_id % {umod} = 0 GROUP BY user_id
    """
    s_sql = f"""
    WITH per AS ({per}),
    hist AS (SELECT sc, count(*) AS g_n, sum(lb) AS g_pos FROM per GROUP BY sc),
    hist2 AS (
        SELECT sc, g_n, g_pos,
               sum(g_n) OVER (ORDER BY sc DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - g_n AS cb
        FROM hist
    ),
    tot AS (SELECT count(*) AS n FROM per),
    h AS (
        SELECT sc, g_n, g_pos, cb, n,
               cb * {b} div n AS bf,
               (cb + g_n - 1) * {b} div n AS bl
        FROM hist2 CROSS JOIN tot
    ),
    whole AS (SELECT bf AS bucket, g_n AS cnt, g_pos AS pos FROM h WHERE bf = bl),
    split AS (
        SELECT (z.cb + z.rn - 1) * {b} div z.n AS bucket,
               1 AS cnt, z.lb AS pos
        FROM (
            SELECT p.lb, s.cb, s.n,
                   row_number() OVER (PARTITION BY p.sc ORDER BY p.uid) AS rn
            FROM per p JOIN (SELECT sc, cb, n FROM h WHERE bf != bl) s
              ON p.sc = s.sc
        ) z
    )
    SELECT bucket, CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS n_pos
    FROM (SELECT * FROM whole UNION ALL SELECT * FROM split)
    GROUP BY bucket ORDER BY bucket
    """
    d_sql = f"""
    WITH per AS ({per}),
    ranked AS (
        SELECT lb, row_number() OVER (ORDER BY sc DESC, uid ASC) AS rn,
               count(*) OVER () AS n
        FROM per
    )
    SELECT ((rn - 1) * {b}) // n AS bucket,
           CAST(count(*) AS BIGINT) AS n, CAST(sum(lb) AS BIGINT) AS n_pos
    FROM ranked GROUP BY 1 ORDER BY 1
    """
    s_rows = [tuple(r) for r in spark.sql(s_sql).collect()]
    d_rows = [tuple(r) for r in duck.execute(d_sql).fetchall()]
    assert s_rows == d_rows, f"b={b} qdiv={qdiv} umod={umod}"
    # population conservation: buckets partition the users
    total = duck.execute(
        f"SELECT count(DISTINCT user_id) FROM events WHERE user_id % {umod} = 0"
    ).fetchone()[0]
    assert sum(r[1] for r in s_rows) == total


# --------------------------------------------------------------------------
# Trimmed-boundary family (round 9): eval_trimmed_mean pins TRIM_PCT=5 over
# per-user sums; this samples random trim percentages and strata — the
# histogram-cumulative order statistic (smallest value whose cum rank
# reaches p%) and both robust means, exactly, on both engines. The ceiling
# fencepost (cum_n * 100 >= n * p) is the riskiest line.
# --------------------------------------------------------------------------


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pct=st.integers(min_value=1, max_value=49),
    umod=st.integers(min_value=1, max_value=4),
)
def test_generated_trimmed_boundaries_agree_across_engines(spark, duck, sf_dir, pct, umod):
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    body = f"""
    WITH per_user AS (
        SELECT user_id, CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        FROM events WHERE user_id % {umod} = 0 GROUP BY user_id
    ),
    hist AS (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM per_user GROUP BY y),
    cum AS (
        SELECT y, cnt,
               CAST(sum(cnt) OVER (ORDER BY y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
               CAST(sum(cnt) OVER () AS BIGINT) AS n
        FROM hist
    ),
    bounds AS (
        SELECT CAST(max(n) AS BIGINT) AS n,
               CAST(min(CASE WHEN cum_n * 100 >= n * {pct} THEN y END) AS BIGINT) AS lo,
               CAST(min(CASE WHEN cum_n * 100 >= n * (100 - {pct}) THEN y END) AS BIGINT) AS hi
        FROM cum
    )
    SELECT b.lo, b.hi,
           CAST(count(CASE WHEN p.y BETWEEN b.lo AND b.hi THEN 1 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN p.y BETWEEN b.lo AND b.hi THEN p.y ELSE 0 END) AS BIGINT) AS kept_sum,
           CAST(sum(least(greatest(p.y, b.lo), b.hi)) AS BIGINT) AS wins_sum
    FROM per_user p CROSS JOIN bounds b
    GROUP BY b.lo, b.hi
    """
    s_row = tuple(spark.sql(body).collect()[0])
    d_row = tuple(duck.execute(body).fetchone())
    assert s_row == d_row, f"pct={pct} umod={umod}: spark={s_row} duck={d_row}"
    # structural: boundaries ordered, kept count within the trim envelope
    lo, hi, n_kept, _, _ = s_row
    assert lo <= hi
    n = duck.execute(
        f"SELECT count(DISTINCT user_id) FROM events WHERE user_id % {umod} = 0"
    ).fetchone()[0]
    assert n_kept >= n - 2 * ((n * pct + 99) // 100)


# --------------------------------------------------------------------------
# SNM band family (round 9): ts_motif_discovery pins (blk key, W=16); this
# samples random band widths and verifies the banded EQUI-join (rank-bucket
# groups with +-1 probes) enumerates EXACTLY the |Δidx| <= W pairs the
# plain predicate defines — the geometry that turned the motif op linear.
# --------------------------------------------------------------------------


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(w=st.integers(min_value=2, max_value=40), umod=st.integers(min_value=1, max_value=3))
def test_generated_snm_band_join_equals_plain_predicate(spark, duck, sf_dir, w, umod):
    from rvi_big_data_api_spark.io import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    idxed = f"""
        SELECT event_type AS blk, event_id,
               row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS idx
        FROM events WHERE user_id % {umod} = 0
    """
    # Spark: banded equi-join with probe groups g-1, g, g+1
    s_sql = f"""
    WITH idxed AS ({idxed}),
    a AS (SELECT blk, event_id, idx, explode(array(idx div {w} - 1, idx div {w},
                 idx div {w} + 1)) AS g FROM idxed),
    b AS (SELECT blk AS b_blk, event_id AS b_id, idx AS b_idx, idx div {w} AS b_g
          FROM idxed)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(abs(idx - b_idx)) AS BIGINT) AS dist_sum
    FROM a JOIN b ON blk = b_blk AND g = b_g
    WHERE abs(idx - b_idx) <= {w} AND event_id < b_id
    """
    # DuckDB: the plain non-equi predicate
    d_sql = f"""
    WITH idxed AS ({idxed})
    SELECT CAST(count(*) AS BIGINT), CAST(sum(abs(a.idx - b.idx)) AS BIGINT)
    FROM idxed a JOIN idxed b
      ON a.blk = b.blk AND abs(a.idx - b.idx) <= {w} AND a.event_id < b.event_id
    """
    s_row = tuple(spark.sql(s_sql).collect()[0])
    d_row = tuple(duck.execute(d_sql).fetchone())
    assert s_row == d_row, f"w={w} umod={umod}: spark={s_row} duck={d_row}"


# --------------------------------------------------------------------------
# Bradley-Terry trajectory family (round 11, VERDICT r10 items 3/8): random
# win-count matrices, step counts and learning rates through the GENERATED
# chained-CTE gradient chain on DuckDB vs a sequential pure-Python replica —
# cross-algebra: the unrolled relational GD (quantized integer strengths,
# per-step gauge recentering) must equal the textbook loop at every geometry.
# --------------------------------------------------------------------------


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    k=st.integers(min_value=2, max_value=6),
    seed=st.integers(min_value=0, max_value=10_000),
    iters=st.integers(min_value=1, max_value=8),
    step=st.sampled_from([100_000, 500_000, 1_000_000]),
)
def test_generated_bt_chains_agree_with_python_replica(duck, k, seed, iters, step):
    import hashlib as _h
    import math as _m

    from rvi_big_data_api_spark.operators.ml_eval import _bt_chain_sql

    items = [f"i{c}" for c in range(k)]
    edges = {}
    for a in items:
        for b in items:
            if a == b:
                continue
            w = int(_h.md5(f"{seed}:{a}:{b}".encode()).hexdigest()[:2], 16) % 4
            if w:
                edges[(a, b)] = w
    if len({i for e in edges for i in e}) < 2:
        return  # degenerate draw: nothing to rank
    vals = ", ".join(f"('{a}', '{b}', {w})" for (a, b), w in sorted(edges.items()))
    lit = (
        "WITH edges AS MATERIALIZED ("
        f"SELECT winner, loser, w::BIGINT AS w FROM (VALUES {vals})"
        " AS t(winner, loser, w))"
    )
    sql = (
        _bt_chain_sql(edges_with_sql=lit, iters=iters, step_x1m=step)
        + f" SELECT item, sm FROM s_{iters} ORDER BY item"
    )
    got = dict(duck.execute(sql).fetchall())
    # sequential replica
    uni = sorted({i for e in edges for i in e})
    ref, n = uni[0], sum(edges.values())
    s = {i: 0 for i in uni}
    for _ in range(iters):
        g = {i: 0.0 for i in uni}
        for (a, b), w in edges.items():
            p = 1.0 / (1.0 + _m.exp(-((s[a] - s[b]) / 1e6)))
            g[a] -= w * (1.0 - p)
            g[b] += w * (1.0 - p)
        for i in uni:
            s[i] -= _m.floor(g[i] / n * step + 0.5)
        off = s[ref]
        for i in uni:
            s[i] -= off
    assert got == s, f"k={k} seed={seed} iters={iters} step={step}"


# --------------------------------------------------------------------------
# Language-ID profile family (round 11, VERDICT r10 items 4/8): random word-
# n-gram orders and corpus slices through the GENERATED smoothed-NB oracle on
# DuckDB vs a sequential pure-Python replica — cross-algebra: the delta-vs-
# default relational scoring (no langs x vocab grid) must equal the textbook
# full-grid naive Bayes at every feature geometry.
# --------------------------------------------------------------------------


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    gram=st.integers(min_value=1, max_value=3),
    dmod=st.integers(min_value=1, max_value=4),
)
def test_generated_lang_id_agrees_with_python_replica(duck, sf_dir, gram, dmod):
    from collections import Counter

    from rvi_big_data_api_spark.operators.llm_text import _lang_id_oracle_sql
    from tests.test_round11_properties import _py_lang_id

    src = f"(SELECT * FROM documents WHERE doc_id % {dmod} = 0)"
    got = {
        (r[0], r[1]): (r[2], r[3])
        for r in duck.execute(_lang_id_oracle_sql(gram=gram, src=src)).fetchall()
    }
    docs = duck.execute(
        f"SELECT doc_id, text, lang FROM documents WHERE doc_id % {dmod} = 0"
    ).fetchall()
    picks = _py_lang_id(docs, gram=gram)
    want = Counter((t, p) for t, p in picks.values())
    lang_docs = Counter(t for t, _ in picks.values())
    assert set(got) == set(want), f"gram={gram} dmod={dmod}"
    for cell, (n_docs, share) in got.items():
        assert n_docs == want[cell], (gram, dmod, cell)
        assert share == want[cell] * 1_000_000 // lang_docs[cell[0]], (gram, dmod, cell)


# --------------------------------------------------------------------------
# Minimax-isotonic family (round 11): random binned histograms through the
# GENERATED minimax-PAV chain on DuckDB vs a sequential pool-adjacent-
# violators replica — cross-algebra: the relational max-min lattice must
# equal the textbook pooling loop on every histogram, including all-zero,
# already-monotone and strictly-decreasing shapes.
# --------------------------------------------------------------------------


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_bins=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_generated_minimax_isotonic_agrees_with_pav(duck, n_bins, seed):
    import hashlib as _h

    from rvi_big_data_api_spark.operators.ml_eval import _iso_minimax_sql

    bins = []
    for b in range(n_bins):
        h = _h.md5(f"{seed}:{b}".encode()).hexdigest()
        nb = int(h[:2], 16) % 50 + 1
        npos = int(h[2:4], 16) % (nb + 1)
        bins.append((b, nb, npos))
    vals = ", ".join(f"({b}, {nb}, {np_})" for b, nb, np_ in bins)
    sql = _iso_minimax_sql(
        f"WITH b AS (SELECT bin::BIGINT AS bin, nb::BIGINT AS nb,"
        f" npos::BIGINT AS npos FROM (VALUES {vals}) AS t(bin, nb, npos))"
    )
    got = {r[0]: r[4] for r in duck.execute(sql).fetchall()}
    # sequential PAV replica
    pools = []
    for _, nb, np_ in bins:
        pools.append([nb, np_])
        while len(pools) > 1 and (
            pools[-2][1] * pools[-1][0] >= pools[-1][1] * pools[-2][0]
        ):
            n2, p2 = pools.pop()
            pools[-1][0] += n2
            pools[-1][1] += p2
    want = {}
    i = 0
    for n_, p_ in pools:
        covered = 0
        while covered < n_:
            covered += bins[i][1]
            want[bins[i][0]] = p_ / n_
            i += 1
    assert set(got) == set(want)
    for b in got:
        assert abs(got[b] - round(want[b], 6)) < 1e-9, (n_bins, seed, b)


# --------------------------------------------------------------------------
# GMM trajectory family (round 12, VERDICT r11 items 5/8): random integer
# score distributions, init geometries and step counts through the GENERATED
# chained-CTE EM chain on DuckDB vs a sequential pure-Python replica —
# cross-algebra: the unrolled relational EM (quantized micro-unit params,
# clamped variance/mixing floors) must equal the textbook loop at every
# geometry.
# --------------------------------------------------------------------------


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=20, max_value=120),
    seed=st.integers(min_value=0, max_value=10_000),
    iters=st.integers(min_value=1, max_value=6),
    mu1=st.sampled_from([200_000, 400_000]),
    mu2=st.sampled_from([600_000, 800_000]),
)
def test_generated_gmm_chains_agree_with_python_replica(duck, n, seed, iters, mu1, mu2):
    import hashlib as _h
    import math as _m

    from rvi_big_data_api_spark.operators.ml_eval import (
        GMM_PI1_0,
        GMM_PI_MIN_PPM,
        GMM_TWO_PI,
        GMM_VAR_0,
        GMM_VAR_MIN_MICRO,
        _gmm_chain_sql,
    )

    xs = [
        int(_h.md5(f"{seed}:{i}".encode()).hexdigest()[:5], 16) % 1_000_001
        for i in range(n)
    ]
    vals = ", ".join(f"({x})" for x in xs)
    pu = f"SELECT x::BIGINT AS xppm FROM (VALUES {vals}) AS t(x)"
    sql = (
        "WITH "
        + _gmm_chain_sql(pu_sql=pu, iters=iters, mu1_0=mu1, mu2_0=mu2)
        + f" SELECT mu1_micro, mu2_micro, var1_micro, var2_micro, pi1_ppm"
        f" FROM gmm_m_{iters}"
    )
    got = duck.execute(sql).fetchone()

    def dens(xp, m, v, p):
        return (
            (p / 1e6)
            * _m.exp(-((xp / 1e6 - m / 1e6) ** 2) / (2 * (v / 1e6)))
            / _m.sqrt(GMM_TWO_PI * (v / 1e6))
        )

    sx = sum(xs)
    sxx = sum(x * x for x in xs)
    m1, m2, v1, v2, p1 = mu1, mu2, GMM_VAR_0, GMM_VAR_0, GMM_PI1_0
    for _ in range(iters):
        sr = srx = srxx = 0.0
        for xp in xs:
            a1 = dens(xp, m1, v1, p1)
            a2 = dens(xp, m2, v2, 1_000_000 - p1)
            r = a1 / (a1 + a2)
            sr += r
            srx += r * (xp / 1e6)
            srxx += r * (xp / 1e6) ** 2
        sr2, srx2 = n - sr, sx / 1e6 - srx
        srxx2 = sxx / 1e12 - srxx
        m1 = _m.floor(srx / sr * 1e6 + 0.5)
        m2 = _m.floor(srx2 / sr2 * 1e6 + 0.5)
        v1 = max(
            _m.floor((srxx / sr - (srx / sr) ** 2) * 1e6 + 0.5),
            GMM_VAR_MIN_MICRO,
        )
        v2 = max(
            _m.floor((srxx2 / sr2 - (srx2 / sr2) ** 2) * 1e6 + 0.5),
            GMM_VAR_MIN_MICRO,
        )
        p1 = min(
            max(_m.floor(sr / n * 1e6 + 0.5), GMM_PI_MIN_PPM),
            1_000_000 - GMM_PI_MIN_PPM,
        )
    assert got == (m1, m2, v1, v2, p1), (n, seed, iters, mu1, mu2)


# --------------------------------------------------------------------------
# Curated-select quota family (round 12, VERDICT r11 items 6/8): random
# per-source pools, logit collisions and quota vectors through the selection
# tail's rank/clamp algebra on DuckDB vs a Python sort — pins the DESC-logit
# doc_id-ASC tie-break and the least(quota, pool) identity at geometries the
# fixture never hits (zero quotas, all-tied logits, quota > pool).
# --------------------------------------------------------------------------


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_src=st.integers(min_value=1, max_value=5),
    pool=st.integers(min_value=1, max_value=30),
    zmod=st.sampled_from([1, 3, 1000]),
    qmod=st.integers(min_value=0, max_value=40),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_generated_curated_quota_selection(duck, n_src, pool, zmod, qmod, seed):
    import hashlib as _h

    rows = []
    quotas = {}
    for s_i in range(n_src):
        src = f"s{s_i}"
        quotas[src] = (
            int(_h.md5(f"{seed}:q:{src}".encode()).hexdigest()[:4], 16) % (qmod + 1)
            if qmod
            else 0
        )
        for d_i in range(pool):
            z = int(_h.md5(f"{seed}:{src}:{d_i}".encode()).hexdigest()[:4], 16) % zmod
            rows.append((src, s_i * 1000 + d_i, z))
    vals = ", ".join(f"('{s}', {d}, {z})" for s, d, z in rows)
    qvals = ", ".join(f"('{s}', {q})" for s, q in sorted(quotas.items()))
    sql = f"""
    WITH pool AS (SELECT * FROM (VALUES {vals}) AS t(source, doc_id, zm)),
    q AS (SELECT * FROM (VALUES {qvals}) AS t(source, quota_docs)),
    ranked AS (
        SELECT p.source, p.doc_id, p.zm, q.quota_docs,
               row_number() OVER (PARTITION BY p.source
                                  ORDER BY p.zm DESC, p.doc_id ASC) AS rk
        FROM pool p JOIN q ON q.source = p.source
    )
    SELECT source, count(*)::BIGINT,
           sum(CASE WHEN rk <= quota_docs THEN 1 ELSE 0 END)::BIGINT,
           COALESCE(min(CASE WHEN rk <= quota_docs THEN zm END), 0)::BIGINT
    FROM ranked GROUP BY source ORDER BY source
    """
    got = duck.execute(sql).fetchall()
    exp = []
    from collections import defaultdict

    by_src = defaultdict(list)
    for s, d, z in rows:
        by_src[s].append((d, z))
    for src in sorted(by_src):
        docs = sorted(by_src[src], key=lambda t: (-t[1], t[0]))
        k = min(quotas[src], len(docs))
        sel = docs[:k]
        exp.append(
            (src, len(docs), k, min((z for _, z in sel), default=0))
        )
    assert got == exp, (n_src, pool, zmod, qmod, seed)


# --------------------------------------------------------------------------
# Cox trajectory family (round 12): random survival cohorts (durations,
# censoring patterns, covariates), step counts and learning rates through the
# GENERATED chained-CTE ascent chain on DuckDB vs a sequential pure-Python
# replica — pins the Breslow risk-set suffix algebra and the quantized beta
# path at geometries the fixture never hits (heavy ties, all-censored tails).
# --------------------------------------------------------------------------


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=10, max_value=60),
    seed=st.integers(min_value=0, max_value=10_000),
    iters=st.integers(min_value=1, max_value=6),
    step=st.sampled_from([100_000, 200_000, 500_000]),
)
def test_generated_cox_chains_agree_with_python_replica(duck, n, seed, iters, step):
    import hashlib as _h
    import math as _m

    from rvi_big_data_api_spark.operators.ml_eval import _cox_chain_sql

    rows = []
    for i in range(n):
        h = _h.md5(f"{seed}:{i}".encode()).hexdigest()
        rows.append(
            (int(h[:2], 16) % 8, int(h[2:4], 16) % 4 != 0, int(h[4:6], 16) % 9 - 4)
        )
    if not any(e for _, e, _ in rows):
        return  # degenerate draw: no events to regress on
    vals = ", ".join(f"({d}, {1 if e else 0}, {x})" for d, e, x in rows)
    pu = (
        "cox_pu AS MATERIALIZED (SELECT dur::BIGINT AS dur, ev::BIGINT AS ev,"
        f" x::BIGINT AS x FROM (VALUES {vals}) AS t(dur, ev, x))"
    )
    sql = (
        _cox_chain_sql(iters=iters, step_x1m=step, pu_with_sql=pu)
        + f" SELECT beta_micro FROM cox_m_{iters}"
    )
    got = duck.execute(sql).fetchone()[0]
    ne = sum(1 for _, e, _ in rows if e)
    bm = 0
    durs = sorted({d for d, _, _ in rows})
    for _ in range(iters):
        grad = 0.0
        for td in durs:
            d_t = sum(1 for d, e, _ in rows if d == td and e)
            if d_t == 0:
                continue
            sx_t = sum(x for d, e, x in rows if d == td and e)
            s0 = sum(_m.exp(bm * x / 1e6) for d, _, x in rows if d >= td)
            s1 = sum(x * _m.exp(bm * x / 1e6) for d, _, x in rows if d >= td)
            grad += sx_t - d_t * s1 / s0
        bm += _m.floor(grad / ne * step + 0.5)
    assert got == bm, (n, seed, iters, step)
