"""Differential property tests (SURVEY §5.4, optional tier): hypothesis
generates random filter + aggregation shapes over lineitem; the engine and
the DuckDB oracle must agree after §5.3 canonicalization.

This catches semantics drift the hand-declared queries can't: operator
interactions (filter algebra × group-by × decimal aggs) across the whole
predicate space, not just the declared points.
"""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, assume, given, settings, strategies as st  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from s3_kinesis_replay_spark.catalog import table  # noqa: E402
from s3_kinesis_replay_spark.oracle import compare, duck_result, spark_result  # noqa: E402

# predicate atoms: (spark_col, duck_col, kind)
NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_linenumber"]
STR_COLS = ["l_returnflag", "l_linestatus"]
STR_VALS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"]}
OPS = ["<", "<=", ">", ">=", "=", "<>"]
BOUNDS = {
    "l_quantity": (1.0, 50.0),
    "l_extendedprice": (900.0, 105000.0),
    "l_discount": (0.0, 0.1),
    "l_linenumber": (1, 7),
}


@st.composite
def predicates(draw):
    n_atoms = draw(st.integers(1, 3))
    atoms = []
    for _ in range(n_atoms):
        if draw(st.booleans()):
            col = draw(st.sampled_from(NUM_COLS))
            lo, hi = BOUNDS[col]
            if isinstance(lo, int):
                val = draw(st.integers(lo, hi))
            else:
                # two-decimal literals: exactly representable in both engines
                val = round(draw(st.floats(lo, hi, allow_nan=False)), 2)
            op = draw(st.sampled_from(OPS))
            atoms.append(f"{col} {op} {val}")
        else:
            col = draw(st.sampled_from(STR_COLS))
            val = draw(st.sampled_from(STR_VALS[col]))
            op = draw(st.sampled_from(["=", "<>"]))
            atoms.append(f"{col} {op} '{val}'")
    glue = draw(st.lists(st.sampled_from(["AND", "OR"]), min_size=n_atoms - 1,
                         max_size=n_atoms - 1))
    sql = atoms[0]
    for g, a in zip(glue, atoms[1:]):
        sql = f"({sql}) {g} ({a})"
    return sql


GROUPS = [None, ["l_returnflag"], ["l_returnflag", "l_linestatus"]]


@pytest.mark.usefixtures("spark", "duck")
class TestDifferential:
    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(pred=predicates(), gi=st.integers(0, len(GROUPS) - 1))
    def test_filter_agg_matches_duckdb(self, spark, duck, sf_dir, pred, gi):
        group = GROUPS[gi]
        li = table(spark, "lineitem", sf_dir).filter(F.expr(pred))
        aggs = [
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(l_quantity AS DECIMAL(38,6))")).alias("sum_qty"),
            F.min("l_orderkey").alias("min_key"),
        ]
        if group:
            sdf = li.groupBy(*group).agg(*aggs)
            gsql = ", ".join(group)
            osql = (
                f"SELECT {gsql}, CAST(COUNT(*) AS BIGINT) AS n, "
                f"SUM(CAST(l_quantity AS DECIMAL(38,6))) AS sum_qty, "
                f"MIN(l_orderkey) AS min_key FROM lineitem WHERE {pred} "
                f"GROUP BY {gsql}"
            )
        else:
            sdf = li.agg(*aggs)
            osql = (
                f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
                f"SUM(CAST(l_quantity AS DECIMAL(38,6))) AS sum_qty, "
                f"MIN(l_orderkey) AS min_key FROM lineitem WHERE {pred}"
            )
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"pred={pred!r} group={group}: " + "; ".join(problems)


JOIN_TYPES = ["inner", "left", "right", "full", "left_semi", "left_anti"]
DUCK_JOIN = {
    "inner": "JOIN",
    "left": "LEFT JOIN",
    "right": "RIGHT JOIN",
    "full": "FULL JOIN",
}


@pytest.mark.usefixtures("spark", "duck")
class TestJoinDifferential:
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(pred=predicates(), jt=st.sampled_from(JOIN_TYPES))
    def test_filtered_join_matches_duckdb(self, spark, duck, sf_dir, pred, jt):
        """orders ⋈ filtered-lineitem across every join type: row multiset
        must match DuckDB's (semi/anti expressed as EXISTS/NOT EXISTS)."""
        li = table(spark, "lineitem", sf_dir).filter(F.expr(pred))
        o = table(spark, "orders", sf_dir)
        joined = o.join(li, o.o_orderkey == li.l_orderkey, jt)
        if jt in ("left_semi", "left_anti"):
            sdf = joined.groupBy().agg(
                F.count("*").alias("n"), F.min("o_orderkey").alias("min_key")
            )
            neg = "NOT " if jt == "left_anti" else ""
            osql = (
                f"SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(o_orderkey) AS min_key "
                f"FROM orders o WHERE {neg}EXISTS (SELECT 1 FROM lineitem l "
                f"WHERE ({pred}) AND l.l_orderkey = o.o_orderkey)"
            )
        else:
            sdf = joined.groupBy().agg(
                F.count("*").alias("n"),
                F.count("o_orderkey").alias("n_o"),
                F.count("l_orderkey").alias("n_l"),
            )
            osql = (
                f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
                f"CAST(COUNT(o_orderkey) AS BIGINT) AS n_o, "
                f"CAST(COUNT(l_orderkey) AS BIGINT) AS n_l "
                f"FROM orders o {DUCK_JOIN[jt]} "
                f"(SELECT * FROM lineitem WHERE {pred}) l "
                f"ON o.o_orderkey = l.l_orderkey"
            )
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"pred={pred!r} join={jt}: " + "; ".join(problems)


WINDOW_FNS = ["row_number", "rank", "dense_rank"]


@pytest.mark.usefixtures("spark", "duck")
class TestWindowDifferential:
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(pred=predicates(), wf=st.sampled_from(WINDOW_FNS), k=st.integers(1, 5))
    def test_window_topk_matches_duckdb(self, spark, duck, sf_dir, pred, wf, k):
        """Ranking window + top-k filter over a random predicate; total
        order pinned by (l_orderkey, l_linenumber) tiebreak."""
        from pyspark.sql import Window

        li = table(spark, "lineitem", sf_dir).filter(F.expr(pred))
        w = Window.partitionBy("l_returnflag").orderBy(
            F.col("l_quantity").desc(), "l_orderkey", "l_linenumber"
        )
        fn = getattr(F, wf)
        sdf = (
            li.select(
                "l_returnflag",
                "l_orderkey",
                "l_linenumber",
                fn().over(w).cast("bigint").alias("rnk"),
            )
            .filter(F.col("rnk") <= k)
        )
        osql = (
            f"SELECT l_returnflag, l_orderkey, l_linenumber, "
            f"CAST({wf}() OVER (PARTITION BY l_returnflag "
            f"ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS BIGINT) AS rnk "
            f"FROM lineitem WHERE {pred} QUALIFY rnk <= {k}"
        )
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"pred={pred!r} fn={wf} k={k}: " + "; ".join(problems)


class TestFrameDifferential:
    """Random ROWS-frame aggregates: frame-boundary semantics (preceding/
    following/current combinations) are a classic cross-engine drift
    source; sums run in DECIMAL so accumulation order can't flake."""

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pred=predicates(),
        lo=st.integers(0, 5),
        hi=st.integers(0, 5),
        agg=st.sampled_from(["sum", "min", "max", "count"]),
    )
    def test_rows_frame_matches_duckdb(self, spark, duck, sf_dir, pred, lo, hi, agg):
        from pyspark.sql import Window

        li = table(spark, "lineitem", sf_dir).filter(F.expr(pred))
        # (l_orderkey, l_linenumber) is NOT unique in the fixture — include
        # the summed/compared values in the sort so any residual ties are
        # value-identical and frame sums are order-insensitive
        order_cols = ["l_orderkey", "l_linenumber", "l_extendedprice",
                      "l_quantity", "l_discount"]
        w = (
            Window.partitionBy("l_returnflag")
            .orderBy(*order_cols)
            .rowsBetween(-lo, hi)
        )
        if agg == "count":
            sval = F.count(F.lit(1)).over(w).cast("bigint")
            oexpr = "CAST(COUNT(*) OVER w AS BIGINT)"
        elif agg == "sum":
            sval = F.round(
                F.sum(F.expr("CAST(l_extendedprice AS DECIMAL(38,6))")).over(w)
                .cast("double"),
                6,
            )
            oexpr = (
                "ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) OVER w"
                " AS DOUBLE), 6)"
            )
        else:
            sval = getattr(F, agg)("l_extendedprice").over(w)
            oexpr = f"{agg}(l_extendedprice) OVER w"
        sdf = li.select(
            "l_orderkey", "l_linenumber", sval.alias("v")
        )
        osql = (
            f"SELECT l_orderkey, l_linenumber, {oexpr} AS v FROM lineitem "
            f"WHERE {pred} WINDOW w AS (PARTITION BY l_returnflag "
            f"ORDER BY l_orderkey, l_linenumber, l_extendedprice, "
            f"l_quantity, l_discount "
            f"ROWS BETWEEN {lo} PRECEDING AND {hi} FOLLOWING)"
        )
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"pred={pred!r} frame=({lo},{hi}) {agg}: " + "; ".join(problems)


class TestNullFrameDifferential:
    """Window frames over a NULL-injected value column (VERDICT r3 item 7):
    exercises (a) NULL-skipping frame aggregates, (b) count(col) vs
    count(*) under NULLs, and (c) NULL ordering — Spark's ASC default is
    NULLS FIRST while DuckDB's is NULLS LAST, so the oracle SQL pins
    NULLS FIRST explicitly."""

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        null_line=st.integers(1, 7),
        lo=st.integers(0, 4),
        hi=st.integers(0, 4),
        agg=st.sampled_from(["sum", "min", "max", "count", "avg"]),
    )
    def test_null_frame_matches_duckdb(self, spark, duck, sf_dir, null_line, lo, hi, agg):
        from pyspark.sql import Window

        li = table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") < 2000)
        v = F.when(F.col("l_linenumber") == null_line, None).otherwise(
            F.col("l_extendedprice")
        )
        li = li.select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
                       "l_extendedprice", "l_returnflag", v.alias("v"))
        order = [
            F.col("v").asc_nulls_first(),
            "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity",
            "l_discount",
        ]
        w = Window.partitionBy("l_returnflag").orderBy(*order).rowsBetween(-lo, hi)
        if agg == "count":
            sval = F.count("v").over(w).cast("bigint")
            oexpr = "CAST(COUNT(v) OVER w AS BIGINT)"
        elif agg in ("sum", "avg"):
            sval = F.round(
                getattr(F, agg)(F.expr("CAST(v AS DECIMAL(38,6))")).over(w)
                .cast("double"),
                6,
            )
            oexpr = (
                f"ROUND(CAST({agg.upper()}(CAST(v AS DECIMAL(38,6))) OVER w"
                " AS DOUBLE), 6)"
            )
        else:
            sval = getattr(F, agg)("v").over(w)
            oexpr = f"{agg}(v) OVER w"
        sdf = li.select("l_orderkey", "l_linenumber", "v", sval.alias("fv"))
        osql = (
            f"SELECT l_orderkey, l_linenumber, v, {oexpr} AS fv FROM ("
            f"  SELECT *, CASE WHEN l_linenumber = {null_line} THEN NULL "
            f"         ELSE l_extendedprice END AS v"
            f"  FROM lineitem WHERE l_orderkey < 2000) "
            f"WINDOW w AS (PARTITION BY l_returnflag "
            f"ORDER BY v ASC NULLS FIRST, l_orderkey, l_linenumber, "
            f"l_extendedprice, l_quantity, l_discount "
            f"ROWS BETWEEN {lo} PRECEDING AND {hi} FOLLOWING)"
        )
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, (
            f"null_line={null_line} frame=({lo},{hi}) {agg}: " + "; ".join(problems)
        )


class TestLagLeadNullDifferential:
    """lag/lead across NULL-injected values with explicit defaults: offset
    semantics must step over ROWS (not non-NULL values) and the default
    must fill only beyond-partition offsets, identically in both engines."""

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        null_line=st.integers(1, 7),
        off=st.integers(1, 3),
        fn=st.sampled_from(["lag", "lead"]),
        dflt=st.sampled_from([None, -1.0, 0.0]),
    )
    def test_lag_lead_null_matches_duckdb(self, spark, duck, sf_dir, null_line, off, fn, dflt):
        from pyspark.sql import Window

        li = table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") < 2000)
        v = F.when(F.col("l_linenumber") == null_line, None).otherwise(
            F.col("l_extendedprice")
        )
        li = li.select("l_orderkey", "l_linenumber", "l_extendedprice",
                       "l_quantity", "l_discount", "l_returnflag", v.alias("v"))
        w = Window.partitionBy("l_returnflag").orderBy(
            "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity",
            "l_discount"
        )
        sdf = li.select(
            "l_orderkey", "l_linenumber", "v",
            getattr(F, fn)("v", off, dflt).over(w).alias("lv"),
        )
        dsql = "NULL" if dflt is None else repr(dflt)
        osql = (
            f"SELECT l_orderkey, l_linenumber, v, "
            f"{fn}(v, {off}, {dsql}) OVER (PARTITION BY l_returnflag "
            f"ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity, "
            f"l_discount) AS lv "
            f"FROM (SELECT *, CASE WHEN l_linenumber = {null_line} THEN NULL "
            f"      ELSE l_extendedprice END AS v "
            f"      FROM lineitem WHERE l_orderkey < 2000)"
        )
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, (
            f"null_line={null_line} {fn} off={off} dflt={dflt}: " + "; ".join(problems)
        )


class TestDecimalEdgeDifferential:
    """DECIMAL(38,6) aggregation at edge magnitudes (VERDICT r3 item 7):
    hypothesis-generated coefficients up to 10^36 (value magnitude 10^30,
    sum headroom inside 38,6), mixed signs and tiny/huge mixes, grouped
    SUM/MIN/MAX — exact cross-engine equality on literal data."""

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        coefs=st.lists(
            st.integers(-(10**36), 10**36).filter(lambda c: c != 0)
            | st.sampled_from([1, -1, 10**36, -(10**36), 999999, -999999]),
            min_size=1,
            max_size=24,
        )
    )
    def test_decimal_group_aggs_match_duckdb(self, spark, duck, coefs):
        from decimal import Decimal

        rows = [
            (i % 3, Decimal(c).scaleb(-6))
            for i, c in enumerate(coefs)
        ]
        # compare in exact DECIMAL(38,6) end-to-end: double+ROUND is
        # meaningless at magnitude 1e30 (ulp >> 1e-6); the harness
        # canonicalizes decimals as full-scale strings, which IS exact
        sdf_in = spark.createDataFrame(rows, "g int, d decimal(38,6)")
        sdf = sdf_in.groupBy("g").agg(
            F.sum("d").cast("decimal(38,6)").alias("s"),
            F.min("d").alias("mn"),
            F.max("d").alias("mx"),
            F.count("d").alias("n"),
        )
        values = ", ".join(
            f"({g}, CAST('{d:f}' AS DECIMAL(38,6)))" for g, d in rows
        )
        osql = (
            f"SELECT g, CAST(SUM(d) AS DECIMAL(38,6)) AS s, "
            f"MIN(d) AS mn, MAX(d) AS mx, "
            f"CAST(COUNT(d) AS BIGINT) AS n "
            f"FROM (VALUES {values}) t(g, d) GROUP BY g"
        )
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"coefs={coefs!r}: " + "; ".join(problems)


class TestStringFnDifferential:
    """Random substring/locate/reverse compositions over the multilingual
    documents corpus (CJK included): 1-based character — not byte —
    semantics of substr/instr must agree with DuckDB across arbitrary
    offsets/lengths and needles."""

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pos=st.integers(1, 300),
        ln=st.integers(0, 80),
        needle=st.sampled_from(["table", "scan", "the", "zz", " a ", "小", "é"]),
    )
    def test_string_fns_match_duckdb(self, spark, duck, sf_dir, pos, ln, needle):
        d = table(spark, "documents", sf_dir)
        esc = needle.replace("'", "''")
        sdf = d.select(
            "doc_id",
            F.substring(F.lower("text"), pos, ln).alias("sub"),
            F.instr(F.col("text"), needle).cast("bigint").alias("hit"),
            F.reverse(F.col("source")).alias("rsrc"),
            F.length(F.substring("text", pos, ln)).cast("bigint").alias("sublen"),
        )
        osql = (
            f"SELECT doc_id, substr(lower(text), {pos}, {ln}) AS sub, "
            f"CAST(instr(text, '{esc}') AS BIGINT) AS hit, "
            f"reverse(source) AS rsrc, "
            f"CAST(length(substr(text, {pos}, {ln})) AS BIGINT) AS sublen "
            f"FROM documents"
        )
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"pos={pos} ln={ln} needle={needle!r}: " + "; ".join(problems)


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


class TestAsofDifferential:
    """asof_join (operators/asof.py, union-tag + window) fuzzed against
    DuckDB's NATIVE ASOF JOIN — an independent third formulation beside
    the declared c8 correlated-subquery oracle. The right side is deduped
    to unique (user_id, ts) in both engines so tie semantics (which the
    two engines pin differently) cannot differ."""

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        lt=st.sampled_from(EVENT_TYPES),
        rt=st.sampled_from(EVENT_TYPES),
        modulus=st.integers(2, 5),
        direction=st.sampled_from(["backward", "forward"]),
    )
    def test_asof_matches_duckdb_native(self, spark, duck, sf_dir, lt, rt, modulus, direction):
        from s3_kinesis_replay_spark.operators.asof import asof_join

        ev = table(spark, "events", sf_dir)
        left = ev.filter(
            (F.col("event_type") == lt) & (F.col("event_id") % modulus == 0)
        ).select("event_id", "user_id", "ts")
        right = (
            ev.filter(F.col("event_type") == rt)
            .groupBy(F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts"))
            .agg(F.max("value").alias("rv"))
        )
        sdf = asof_join(
            left,
            right,
            on="ts",
            right_on="r_ts",
            by_left="user_id",
            by_right="r_user",
            value_cols=["rv"],
            tiebreak="rv",  # unused: (r_user, r_ts) is unique by construction
            direction=direction,
        ).select("event_id", "user_id", "rv")
        op = ">=" if direction == "backward" else "<="
        osql = (
            f"SELECT l.event_id, l.user_id, r.rv "
            f"FROM (SELECT event_id, user_id, ts FROM events "
            f"      WHERE event_type = '{lt}' AND event_id % {modulus} = 0) l "
            f"ASOF LEFT JOIN "
            f"(SELECT user_id AS r_user, ts AS r_ts, MAX(value) AS rv "
            f" FROM events WHERE event_type = '{rt}' GROUP BY 1, 2) r "
            f"ON l.user_id = r.r_user AND l.ts {op} r.r_ts"
        )
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, (
            f"lt={lt} rt={rt} mod={modulus} dir={direction}: " + "; ".join(problems)
        )


GS_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]


class TestGroupingSetsDifferential:
    """Random GROUPING SETS over a random predicate: the Expand-based
    plan's NULL-marker semantics and per-set aggregation must match
    DuckDB for arbitrary set combinations (rollup/cube fuzzing beyond the
    declared d11/d11b points). Group columns are non-null in the fixture,
    so the NULL marker is unambiguous without grouping_id."""

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pred=predicates(),
        set_idx=st.lists(
            st.sets(st.integers(0, 2), min_size=1, max_size=3),
            min_size=1,
            max_size=4,
            unique_by=lambda s: tuple(sorted(s)),
        ),
    )
    def test_grouping_sets_match_duckdb(self, spark, duck, sf_dir, pred, set_idx):
        sets = [[GS_COLS[i] for i in sorted(s)] for s in set_idx]
        # both engines emit only the union of columns used across the sets
        # (DuckDB refuses to bind a column absent from every set)
        used = [c for c in GS_COLS if any(c in s for s in sets)]
        li = table(spark, "lineitem", sf_dir).filter(F.expr(pred))
        sdf = li.groupingSets(
            [[F.col(c) for c in s] for s in sets], *[F.col(c) for c in used]
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(l_quantity AS DECIMAL(38,6))")).alias("sum_qty"),
        )
        gsql = ", ".join(f"({', '.join(s)})" for s in sets)
        osql = (
            f"SELECT {', '.join(used)}, CAST(COUNT(*) AS BIGINT) AS n, "
            f"SUM(CAST(l_quantity AS DECIMAL(38,6))) AS sum_qty "
            f"FROM lineitem WHERE {pred} "
            f"GROUP BY GROUPING SETS ({gsql})"
        )
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"pred={pred!r} sets={sets}: " + "; ".join(problems)


class TestSetOpDifferential:
    """Random INTERSECT/EXCEPT/UNION (set semantics) between two filtered
    projections — duplicate-elimination + NULL-equality semantics of set
    ops must agree with the oracle across the predicate space."""

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        p1=predicates(),
        p2=predicates(),
        op=st.sampled_from(["intersect", "except", "union"]),
    )
    def test_setop_matches_duckdb(self, spark, duck, sf_dir, p1, p2, op):
        cols = ["l_returnflag", "l_linestatus", "l_linenumber"]
        li = table(spark, "lineitem", sf_dir)
        a, b = li.filter(F.expr(p1)).select(cols), li.filter(F.expr(p2)).select(cols)
        sdf = {
            "intersect": a.intersect(b),
            "except": a.subtract(b),
            "union": a.union(b).distinct(),
        }[op]
        csel = ", ".join(cols)
        osql = (
            f"SELECT {csel} FROM lineitem WHERE {p1} "
            f"{ {'intersect': 'INTERSECT', 'except': 'EXCEPT', 'union': 'UNION'}[op] } "
            f"SELECT {csel} FROM lineitem WHERE {p2}"
        )
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"p1={p1!r} p2={p2!r} {op}: " + "; ".join(problems)


class TestSlidingWindowDifferential:
    """Random (duration, slide) sliding windows over events — including
    slide ∤ duration — must match the general k-candidate-starts unnest
    oracle (_sliding_sql). This fuzzes the window-start alignment and the
    ts < start + duration boundary across the whole parameter space, not
    just the declared h2/h2c points (VERDICT r4 item 8)."""

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        duration=st.integers(2, 45),
        slide=st.integers(1, 20),
    )
    def test_sliding_window_matches_duckdb(self, spark, duck, sf_dir, duration, slide):
        from s3_kinesis_replay_spark.queries.streaming_batch import (
            _h2_plan,
            _sliding_sql,
        )

        slide = min(slide, duration)  # Spark requires slide <= duration
        sdf = _h2_plan(
            table(spark, "events", sf_dir),
            f"{duration} minutes",
            f"{slide} minutes",
        )
        osql = _sliding_sql(duration, slide)
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"D={duration} S={slide}: " + "; ".join(problems)


class TestAggRankDifferential:
    """The aggregated-rank rewrite (operators/rank_rewrite.py, declared as
    e8_scalable_rank) must equal the direct window form for ANY input
    slice, partition key, order key, and direction — rank, dense_rank,
    percent_rank, and cume_dist all derive from per-(partition, value)
    counts, so a mistake in the offset/total arithmetic shows up here as
    a hash diff against DuckDB's native window."""

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pred=predicates(),
        part=st.sampled_from(["l_returnflag", "l_linestatus"]),
        order=st.sampled_from(["l_quantity", "l_linenumber", "l_tax"]),
        desc=st.booleans(),
    )
    def test_agg_rank_matches_duckdb(self, spark, duck, sf_dir, pred, part, order, desc):
        from s3_kinesis_replay_spark.operators.rank_rewrite import agg_rank

        li = table(spark, "lineitem", sf_dir).filter(F.expr(pred)).select(
            "l_orderkey", "l_linenumber", part, order
        )
        sdf = agg_rank(li, part, order, descending=desc).select(
            "l_orderkey",
            "l_linenumber",
            part,
            F.col(order).cast("double").alias("ov"),
            "rnk",
            "drnk",
            F.round("prnk", 6).alias("prnk"),
            F.round("cdist", 6).alias("cdist"),
        )
        direction = "DESC" if desc else "ASC"
        osql = f"""
        SELECT l_orderkey, l_linenumber, {part},
               CAST({order} AS DOUBLE) AS ov,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk,
               ROUND(percent_rank() OVER w, 6) AS prnk,
               ROUND(cume_dist() OVER w, 6) AS cdist
        FROM lineitem WHERE {pred}
        WINDOW w AS (PARTITION BY {part} ORDER BY {order} {direction})
        """
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"pred={pred!r} {part}/{order} {direction}: " + "; ".join(problems)


class TestSessionWindowDifferential:
    """Random session gaps over events must match the islands-pattern
    oracle (_session_sql). This pins the boundary rule — Spark sessions
    are half-open [start, last_ts + gap), so an inter-event gap EXACTLY
    equal to the gap duration starts a new session (>= breaks, not >) —
    across the whole gap space, not just the declared 30-minute h3."""

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(gap=st.integers(1, 90))
    def test_session_window_matches_duckdb(self, spark, duck, sf_dir, gap):
        from s3_kinesis_replay_spark.queries.streaming_batch import (
            _h3_plan,
            _session_sql,
        )

        sdf = _h3_plan(table(spark, "events", sf_dir), gap=f"{gap} minutes")
        osql = _session_sql(gap)
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"gap={gap}: " + "; ".join(problems)


class TestRangeJoinDifferential:
    """Random band widths over the c7 range-join shape (equi user_id +
    time band) must match DuckDB's inequality join — this fuzzes the
    band boundary arithmetic (interval addition, inclusive endpoints)
    across widths instead of only the declared 1-hour point."""

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(width=st.integers(1, 180))
    def test_range_join_matches_duckdb(self, spark, duck, sf_dir, width):
        e1 = table(spark, "events", sf_dir).alias("e1")
        e2 = table(spark, "events", sf_dir).alias("e2")
        sdf = e1.join(
            e2,
            (F.col("e1.user_id") == F.col("e2.user_id"))
            & (F.col("e2.ts") >= F.col("e1.ts"))
            & (F.col("e2.ts") <= F.col("e1.ts") + F.expr(f"INTERVAL {width} MINUTES"))
            & (F.col("e1.event_id") != F.col("e2.event_id")),
        ).select(
            F.col("e1.event_id").alias("eid1"), F.col("e2.event_id").alias("eid2")
        )
        osql = f"""
        SELECT e1.event_id AS eid1, e2.event_id AS eid2
        FROM events e1 JOIN events e2
          ON e1.user_id = e2.user_id
         AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL {width} MINUTES
         AND e1.event_id <> e2.event_id
        """
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"width={width}: " + "; ".join(problems)


class TestDateTimeDifferential:
    """Date/time arithmetic is a classic cross-engine divergence area
    (truncation units, interval addition over month boundaries, epoch
    extraction). Fuzz random interval offsets + truncation units over the
    events timestamps against DuckDB, all in the pinned UTC session."""

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        days=st.integers(-400, 400),
        hours=st.integers(-48, 48),
        unit=st.sampled_from(["year", "quarter", "month", "week", "day", "hour"]),
    )
    def test_datetime_arith_matches_duckdb(self, spark, duck, sf_dir, days, hours, unit):
        ev = table(spark, "events", sf_dir)
        sdf = ev.select(
            "event_id",
            F.date_trunc(unit, F.col("ts") + F.expr(f"INTERVAL {days} DAYS")
                         + F.expr(f"INTERVAL {hours} HOURS")).alias("bucket"),
            F.year("ts").cast("bigint").alias("y"),
            F.dayofweek("ts").cast("bigint").alias("dow"),
            F.unix_timestamp("ts").alias("epoch_s"),
        )
        # Canonicalization rules this fuzz PINNED (real divergences found):
        # - DuckDB date_trunc('year'/...) yields DATE, Spark yields
        #   TIMESTAMP → cast the oracle side to TIMESTAMP;
        # - DuckDB epoch() carries fractional seconds and CAST rounds,
        #   Spark unix_timestamp() floors → floor() before casting;
        # - DuckDB dayofweek is 0=Sunday, Spark is 1=Sunday → +1;
        # - negative intervals need the quoted form in DuckDB.
        osql = f"""
        SELECT event_id,
               CAST(date_trunc('{unit}',
                    ts + INTERVAL '{days} days' + INTERVAL '{hours} hours')
                    AS TIMESTAMP) AS bucket,
               CAST(year(ts) AS BIGINT) AS y,
               CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
               CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
        FROM events
        """
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"days={days} hours={hours} unit={unit}: " + "; ".join(problems)


class TestSaltedJoinDifferential:
    """salted_join's contract is row-exactness with the plain equi-join
    for any salt count, join mode, and input slice — the salt must never
    add, drop, or duplicate a row. Oracle = DuckDB's plain join."""

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pred=predicates(),
        salts=st.integers(1, 16),
        how=st.sampled_from(["inner", "left"]),
    )
    def test_salted_join_matches_duckdb(self, spark, duck, sf_dir, pred, salts, how):
        from s3_kinesis_replay_spark.operators.skew import salted_join

        li = table(spark, "lineitem", sf_dir).filter(F.expr(pred)).select(
            "l_orderkey", "l_linenumber", "l_quantity"
        )
        orders = table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
        sdf = salted_join(
            li, orders, "l_orderkey", "o_orderkey", salts=salts, how=how
        ).select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("qty"),
            "o_orderkey",
            "o_custkey",
        )
        duck_join = "JOIN" if how == "inner" else "LEFT JOIN"
        osql = f"""
        SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS qty,
               o_orderkey, o_custkey
        FROM (SELECT l_orderkey, l_linenumber, l_quantity
              FROM lineitem WHERE {pred}) l
        {duck_join} orders ON l.l_orderkey = orders.o_orderkey
        """
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"pred={pred!r} salts={salts} {how}: " + "; ".join(problems)


class TestPercentileDifferential:
    """Exact interpolated percentiles are a known cross-engine semantics
    trap (interpolation method, group boundaries). Fuzz random quantile
    points and groupings: Spark percentile() vs DuckDB quantile_cont."""

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        p=st.floats(0.01, 0.99),
        gi=st.integers(0, 2),
        pred=predicates(),
    )
    def test_percentile_matches_duckdb(self, spark, duck, sf_dir, p, gi, pred):
        p = round(p, 3)  # two engines must parse the identical literal
        group = [None, ["l_returnflag"], ["l_returnflag", "l_linestatus"]][gi]
        li = table(spark, "lineitem", sf_dir).filter(F.expr(pred))
        # tolerance compare, NOT the hash harness: both engines use linear
        # interpolation lo + (hi-lo)*frac but in different operation
        # orders, so results can differ in the last ulp — and a random p
        # can land that ulp exactly on a ROUND midpoint (hypothesis found
        # p=0.585 flipping 61979.64375 across the 4-dp boundary). The
        # property under test is the interpolation SEMANTICS; declared
        # registry entries (d6) pin hash-exactness at value points chosen
        # away from rounding boundaries.
        agg = F.expr(f"percentile(CAST(l_extendedprice AS DOUBLE), {p})").alias("pq")
        dsel = f"quantile_cont(CAST(l_extendedprice AS DOUBLE), {p}) AS pq"
        if group:
            sdf = li.groupBy(*group).agg(agg)
            gsql = ", ".join(group)
            osql = (f"SELECT {gsql}, {dsel} FROM lineitem WHERE {pred} "
                    f"GROUP BY {gsql}")
            key = lambda r: tuple(r[:-1])  # noqa: E731
        else:
            sdf = li.agg(agg)
            osql = f"SELECT {dsel} FROM lineitem WHERE {pred}"
            key = lambda r: ()  # noqa: E731
        s = {key(r): r[-1] for r in sdf.collect()}
        d = {key(r): r[-1] for r in duck.execute(osql).fetchall()}
        assert s.keys() == d.keys(), f"group sets differ: p={p} pred={pred!r}"
        for k in s:
            sv, dv = s[k], d[k]
            if sv is None or dv is None:
                assert sv == dv, f"null mismatch at {k}: p={p} pred={pred!r}"
            else:
                assert abs(sv - dv) <= 1e-6 * max(1.0, abs(dv)), (
                    f"p={p} group={group} pred={pred!r} k={k}: {sv} vs {dv}"
                )


# -------------------------------------------------- TPC-H-shape fuzzers
@pytest.mark.usefixtures("spark", "duck")
class TestTpchShapeDifferential:
    """Randomized parameterizations of the round-5 TPC-H patterns
    (queries/tpch_extra.py): the declared entries pin one point each;
    these fuzz the parameter space (date windows, discount bands,
    disjunctive brand/size/quantity predicates, ON-clause filters)."""

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        y=st.integers(1995, 2000),
        m=st.integers(1, 12),
        months=st.integers(1, 18),
        dlo=st.integers(0, 8),
        dband=st.integers(0, 2),
        qmax=st.integers(5, 50),
    )
    def test_q6_shape_matches_duckdb(self, spark, duck, sf_dir, y, m, months, dlo, dband, qmax):
        start = f"{y}-{m:02d}-01"
        ey, em = y + (m - 1 + months) // 12, (m - 1 + months) % 12 + 1
        end = f"{ey}-{em:02d}-01"
        lo, hi = dlo / 100.0, (dlo + dband) / 100.0
        li = table(spark, "lineitem", sf_dir)
        sdf = li.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
            & (F.col("l_discount") >= lo)
            & (F.col("l_discount") <= hi)
            & (F.col("l_quantity") < qmax)
        ).agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(
                    F.expr(
                        "CAST(l_extendedprice * l_discount AS DECIMAL(38,6))"
                    )
                ).cast("double"),
                6,
            ).alias("revenue"),
        )
        osql = (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            "ROUND(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6)))"
            " AS DOUBLE), 6) AS revenue FROM lineitem "
            f"WHERE l_shipdate >= TIMESTAMP '{start} 00:00:00' "
            f"AND l_shipdate < TIMESTAMP '{end} 00:00:00' "
            f"AND l_discount BETWEEN {lo} AND {hi} AND l_quantity < {qmax}"
        )
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"window=[{start},{end}) disc=[{lo},{hi}] q<{qmax}: " + "; ".join(problems)

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        disjuncts=st.lists(
            st.tuples(
                st.integers(1, 25),      # brand number
                st.integers(1, 50),      # size upper bound
                st.integers(1, 40),      # qty lower bound
                st.integers(1, 15),      # qty band width
            ),
            min_size=1,
            max_size=3,
            # distinct brands per disjunct: DuckDB 1.0.0 hits an INTERNAL
            # assertion ("dereference unique_ptr that is NULL") on ORs of
            # near-identical disjunct branches — an oracle-engine crash,
            # not an engine-comparison failure, and it poisons the
            # connection for subsequent tests. Spark handles those inputs
            # fine; the duplicate-branch case is semantically redundant
            # anyway (A OR A = A).
            unique_by=lambda t: t[0],
        )
    )
    def test_q19_shape_matches_duckdb(self, spark, duck, sf_dir, disjuncts):
        li = table(spark, "lineitem", sf_dir)
        p = table(spark, "part", sf_dir)
        conds, sql_parts = None, []
        for bn, sz, qlo, qw in disjuncts:
            c = (
                (F.col("p_brand") == f"Brand#{bn}")
                & F.col("p_size").between(1, sz)
                & F.col("l_quantity").between(qlo, qlo + qw)
            )
            conds = c if conds is None else (conds | c)
            sql_parts.append(
                f"(p_brand = 'Brand#{bn}' AND p_size BETWEEN 1 AND {sz} "
                f"AND l_quantity BETWEEN {qlo} AND {qlo + qw})"
            )
        sdf = (
            li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .filter(conds)
            .agg(
                F.count("*").alias("n"),
                F.round(
                    F.sum(
                        F.expr(
                            "CAST(l_extendedprice * (1 - l_discount)"
                            " AS DECIMAL(38,6))"
                        )
                    ).cast("double"),
                    6,
                ).alias("revenue"),
            )
        )
        osql = (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            "ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS "
            "DECIMAL(38,6))) AS DOUBLE), 6) AS revenue "
            "FROM lineitem JOIN part ON p_partkey = l_partkey WHERE "
            + " OR ".join(sql_parts)
        )
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"disjuncts={disjuncts}: " + "; ".join(problems)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        prio=st.sampled_from(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        ),
        neg=st.booleans(),
    )
    def test_q13_on_clause_semantics_match_duckdb(self, spark, duck, sf_dir, prio, neg):
        """Outer-join histograms with the filter in the ON clause — the
        zero-orders bucket must survive for every predicate choice."""
        c = table(spark, "customer", sf_dir)
        o = table(spark, "orders", sf_dir)
        op = "!=" if neg else "=="
        jcond = (c.c_custkey == o.o_custkey) & (
            (o.o_orderpriority != prio) if neg else (o.o_orderpriority == prio)
        )
        sdf = (
            c.join(o, jcond, "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("c_count"))
            .groupBy("c_count")
            .agg(F.count("*").alias("custdist"))
        )
        sqlop = "<>" if neg else "="
        osql = (
            "WITH c_orders AS (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT)"
            " AS c_count FROM customer LEFT JOIN orders ON c_custkey = o_custkey"
            f" AND o_orderpriority {sqlop} '{prio}' GROUP BY c_custkey) "
            "SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist "
            "FROM c_orders GROUP BY c_count"
        )
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"prio={prio} {op}: " + "; ".join(problems)


@pytest.mark.usefixtures("spark", "duck")
class TestRound5bShapeDifferential:
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        y=st.integers(1995, 2000),
        m=st.integers(1, 12),
        months=st.integers(1, 6),
        k=st.integers(1, 40),
    )
    def test_q10_shape_topk_matches_duckdb(self, spark, duck, sf_dir, y, m, months, k):
        """Randomized q10: agg + TakeOrdered top-k on rounded revenue with
        custkey tiebreak — the rank/limit/rounding interplay across random
        date windows and k."""
        start = f"{y}-{m:02d}-01"
        ey, em = y + (m - 1 + months) // 12, (m - 1 + months) % 12 + 1
        end = f"{ey}-{em:02d}-01"
        c = table(spark, "customer", sf_dir)
        o = table(spark, "orders", sf_dir)
        li = table(spark, "lineitem", sf_dir)
        sdf = (
            c.join(o, c.c_custkey == o.o_custkey)
            .join(li, o.o_orderkey == li.l_orderkey)
            .filter(
                (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
                & (F.col("l_returnflag") == "R")
            )
            .groupBy("c_custkey")
            .agg(
                F.round(
                    F.sum(
                        F.expr(
                            "CAST(l_extendedprice * (1 - l_discount)"
                            " AS DECIMAL(38,6))"
                        )
                    ).cast("double"),
                    6,
                ).alias("revenue")
            )
            .orderBy(F.desc("revenue"), "c_custkey")
            .limit(k)
        )
        osql = (
            "SELECT c_custkey, ROUND(CAST(SUM(CAST(l_extendedprice * "
            "(1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON o_orderkey = l_orderkey "
            f"WHERE o_orderdate >= TIMESTAMP '{start} 00:00:00' "
            f"AND o_orderdate < TIMESTAMP '{end} 00:00:00' "
            "AND l_returnflag = 'R' GROUP BY c_custkey "
            f"ORDER BY revenue DESC, c_custkey LIMIT {k}"
        )
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"[{start},{end}) k={k}: " + "; ".join(problems)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        denom=st.integers(50, 2000),
        seed=st.integers(0, 9),
        boost=st.sampled_from([1, 97, 12289]),
    )
    def test_weighted_sample_shape_matches_duckdb(
        self, spark, duck, sf_dir, denom, seed, boost
    ):
        """Randomized p15: integer-exact weighted Bernoulli membership must
        agree row-for-row for any denominator/seed (no float boundary).
        ``boost`` synthesizes n_chars far beyond the fixture's max (558) —
        at boost=12289 lengths reach ~7M, which without the least() clamp
        overflows int64 in the product (Spark wraps silently, DuckDB
        raises; ADVICE r5) — locking in that accepted-with-p=1 rows stay
        accepted."""
        from s3_kinesis_replay_spark.queries.pipeline_ops import (
            _hexint_col,
            _hexint_sql,
        )

        tag = f":ws{seed}"
        d = table(spark, "documents", sf_dir)
        ux = _hexint_col(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(tag))), 1, 13
        )
        sdf = (
            d.select(
                "doc_id",
                (F.col("n_chars").cast("bigint") * boost).alias("n_chars"),
                ux.alias("ux"),
            )
            .filter(
                F.col("ux") * denom
                < F.least(F.col("n_chars"), F.lit(denom))
                * F.lit(4503599627370496)
            )
            .drop("ux")
        )
        osql = (
            "SELECT doc_id, n_chars FROM ("
            f"SELECT doc_id, CAST(n_chars AS BIGINT) * {boost} AS n_chars, "
            + _hexint_sql(f"md5(CAST(doc_id AS VARCHAR) || '{tag}')", 1, 13)
            + f" AS ux FROM documents) WHERE ux * {denom} "
            f"< least(n_chars, {denom}) * 4503599627370496"
        )
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"denom={denom} seed={seed} boost={boost}: " + "; ".join(
            problems
        )


@pytest.mark.usefixtures("spark", "duck")
class TestBloomScreenDifferential:
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(minlen=st.integers(2, 9), firstch=st.sampled_from("abcdefgklmpqrstvw"))
    def test_bloom_screen_matches_duckdb(self, spark, duck, sf_dir, minlen, firstch):
        """Randomized reference sets (words of length >= L, or starting
        with a letter): the deterministic bloom's per-word hit flag must
        match DuckDB recomputing the identical md5 bit positions — the
        false-POSITIVE set included — and reference words must always hit."""
        from s3_kinesis_replay_spark.operators.bloom import bloom_bits, bloom_screen
        from s3_kinesis_replay_spark.queries.pipeline_ops import _hexint_sql

        words = (
            table(spark, "documents", sf_dir)
            .select(F.explode(F.split(F.lower("text"), " ")).alias("g"))
            .filter(F.col("g") != "")
            .distinct()
        )
        ref = words.filter(
            (F.length("g") >= minlen) & F.col("g").startswith(firstch)
        )
        sdf = (
            bloom_screen(words, bloom_bits(ref))
            .select("g", F.col("bloom_hit").cast("int").alias("hit"))
        )
        p1 = _hexint_sql("md5(g)", 1, 4)
        p2 = _hexint_sql("md5(g)", 5, 4)
        osql = f"""
        WITH words AS (
          SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS g
          FROM documents
        ),
        w AS (SELECT g FROM words WHERE g <> ''),
        ref AS (SELECT g FROM w
                WHERE len(g) >= {minlen} AND g LIKE '{firstch}%'),
        bits AS (
          SELECT {p1} AS pos FROM ref UNION SELECT {p2} FROM ref
        )
        SELECT w.g,
               CAST(CASE WHEN b1.pos IS NOT NULL AND b2.pos IS NOT NULL
                    THEN 1 ELSE 0 END AS INTEGER) AS hit
        FROM (SELECT g, {p1} AS q1, {p2} AS q2 FROM w) w
        LEFT JOIN bits b1 ON w.q1 = b1.pos
        LEFT JOIN bits b2 ON w.q2 = b2.pos
        """
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"minlen={minlen} ch={firstch}: " + "; ".join(problems)
        # soundness: every reference word hits
        hits = {g for g, h in s_rows if h}
        refset = {r["g"] for r in ref.collect()}
        assert refset <= hits


@pytest.mark.usefixtures("spark", "duck")
class TestIncrementalDedupDifferential:
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        ma=st.integers(2, 6),
        ra=st.integers(0, 5),
        mb=st.integers(2, 6),
        rb=st.integers(0, 5),
        suffix=st.sampled_from(["v2", "w3", "xx"]),
    )
    def test_i1c_shape_matches_duckdb(self, spark, duck, sf_dir, ma, ra, mb, rb, suffix):
        """Randomized incremental-dedup constructions: arbitrary recrawl
        and new-content subsets (doc_id % m = r) must produce the same
        survivor set + in-batch copy counts in both engines."""
        ra, rb = ra % ma, rb % mb
        d = table(spark, "documents", sf_dir).filter(F.col("text").isNotNull())
        snap = d.select(F.md5("text").alias("h")).distinct()
        v2 = F.md5(F.concat(F.col("text"), F.lit(" " + suffix)))
        newb = (
            d.filter(F.col("doc_id") % ma == ra)
            .select((F.col("doc_id") + 1000000).alias("doc_id"),
                    F.md5("text").alias("h"))
            .unionAll(
                d.filter(F.col("doc_id") % mb == rb).select(
                    (F.col("doc_id") + 2000000).alias("doc_id"), v2.alias("h")
                )
            )
        )
        agg = newb.groupBy("h").agg(
            F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies")
        )
        sdf = agg.join(snap, "h", "left_anti").select("doc_id", "n_copies")
        osql = f"""
        WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        snap AS (SELECT DISTINCT md5(text) AS h FROM d),
        newb AS (
          SELECT doc_id + 1000000 AS doc_id, md5(text) AS h
          FROM d WHERE doc_id % {ma} = {ra}
          UNION ALL
          SELECT doc_id + 2000000, md5(text || ' {suffix}')
          FROM d WHERE doc_id % {mb} = {rb}
        ),
        agg AS (SELECT h, MIN(doc_id) AS doc_id,
                       CAST(COUNT(*) AS BIGINT) AS n_copies
                FROM newb GROUP BY h)
        SELECT a.doc_id, a.n_copies FROM agg a ANTI JOIN snap s ON a.h = s.h
        """
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"ma={ma},ra={ra},mb={mb},rb={rb}: " + "; ".join(problems)


@pytest.mark.usefixtures("spark", "duck")
class TestAsofNearestDifferential:
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        band_min=st.integers(1, 240),
        lt=st.sampled_from(["purchase", "click", "view"]),
        rt=st.sampled_from(["view", "click", "error"]),
    )
    def test_c8c_shape_matches_duckdb(self, spark, duck, sf_dir, band_min, lt, rt):
        """Randomized nearest-as-of: band width and event-type pair vary;
        the rank-1 pick ordered by |delta| with id tiebreak must agree
        row-for-row (ties at equal distance included)."""
        from pyspark.sql import Window

        ev = table(spark, "events", sf_dir)
        p = ev.filter(F.col("event_type") == lt).select(
            "event_id", "user_id", F.col("ts").alias("p_ts")
        )
        v = ev.filter(F.col("event_type") == rt).select(
            F.col("event_id").alias("rid"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        d_us = F.abs(F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("v_ts")))
        cand = p.join(
            v,
            (p.user_id == v.v_user)
            & (v.v_ts >= F.col("p_ts") - F.expr(f"INTERVAL {band_min} MINUTE"))
            & (v.v_ts <= F.col("p_ts") + F.expr(f"INTERVAL {band_min} MINUTE")),
        ).select("event_id", "rid", d_us.alias("d_us"))
        w = Window.partitionBy("event_id").orderBy("d_us", "rid")
        sdf = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("event_id", "rid", "d_us")
        )
        osql = f"""
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = '{lt}'),
        v AS (SELECT event_id, user_id, ts FROM events
              WHERE event_type = '{rt}'),
        cand AS (
          SELECT p.event_id, v.event_id AS rid,
                 CAST(abs(epoch_us(p.ts) - epoch_us(v.ts)) AS BIGINT) AS d_us,
                 ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY abs(epoch_us(p.ts) - epoch_us(v.ts)), v.event_id
                 ) AS rn
          FROM p JOIN v
            ON p.user_id = v.user_id
           AND v.ts >= p.ts - INTERVAL {band_min} MINUTE
           AND v.ts <= p.ts + INTERVAL {band_min} MINUTE
        )
        SELECT event_id, rid, d_us FROM cand WHERE rn = 1
        """
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"band={band_min}m {lt}->{rt}: " + "; ".join(problems)


@pytest.mark.usefixtures("spark")
class TestBloomParamFuzz:
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        bits_hex=st.integers(2, 8),
        k=st.integers(1, 4),
        minlen=st.integers(3, 8),
    )
    def test_nondefault_params_sound_through_persistence(
        self, spark, sf_dir, tmp_path_factory, bits_hex, k, minlen
    ):
        """ADVICE r6 follow-through, fuzzed: for ANY legal (bits_hex, k)
        the persisted-bits screen must (a) never produce a false negative
        on reference members, (b) carry its build parameters through the
        parquet round-trip, and (c) reject a mismatched screen."""
        assume(bits_hex * k <= 32)
        from s3_kinesis_replay_spark.operators.bloom import bloom_bits, bloom_screen

        words = (
            table(spark, "documents", sf_dir)
            .select(F.explode(F.split(F.lower("text"), " ")).alias("g"))
            .filter(F.col("g") != "")
            .distinct()
            .limit(400)
        )
        ref = words.filter(F.length("g") >= minlen)
        path = str(
            tmp_path_factory.mktemp("bloomfuzz") / f"bits_{bits_hex}_{k}"
        )
        bloom_bits(ref, bits_hex=bits_hex, k=k).write.parquet(path)
        stored = spark.read.parquet(path)
        out = bloom_screen(words, stored, bits_hex=bits_hex, k=k)
        misses = (
            out.join(ref.withColumnRenamed("g", "rg"), F.col("g") == F.col("rg"))
            .filter(~F.col("bloom_hit"))
            .count()
        )
        assert misses == 0, f"false negatives at bits_hex={bits_hex} k={k}"
        other = (bits_hex % 8) + 1 if (bits_hex % 8) + 1 != bits_hex else bits_hex + 1
        if other * k <= 32:
            with pytest.raises(ValueError, match="unsound"):
                bloom_screen(words, stored, bits_hex=other, k=k)


@pytest.mark.usefixtures("spark", "duck")
class TestDecorrelationRewriteFuzz:
    """Round 7: q21/q2 rewrite correlated subqueries into semi-join /
    window-min relational plans. Fuzz the rewrite parameters and compare
    against DuckDB running the LITERAL correlated SQL — any divergence
    in the decorrelation logic (tie handling, empty groups, boundary
    days) hash-mismatches."""

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        days=st.sampled_from([30, 45, 60, 90]),
        nation=st.integers(0, 24),
    )
    def test_q21_semi_join_rewrite_matches_correlated_sql(
        self, spark, duck, sf_dir, days, nation
    ):
        li = table(spark, "lineitem", sf_dir).select(
            "l_orderkey", "l_suppkey", "l_shipdate"
        )
        ords = (
            table(spark, "orders", sf_dir)
            .filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate")
        )
        # the SHIPPED single-window decorrelation itself — imported, not
        # an inline copy (review r8: a frozen copy left the shipped plan
        # untested against the correlated SQL)
        from s3_kinesis_replay_spark.queries.tpch_extra import q21_waiting_stats

        stats = q21_waiting_stats(li, ords, days=days)
        s = table(spark, "supplier", sf_dir)
        n = table(spark, "nation", sf_dir).filter(
            F.col("n_name") == f"NATION_{nation}"
        )
        sdf = (
            stats.filter(F.col("late") & (F.col("ns") > 1) & (F.col("nl") == 1))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
        )
        osql = f"""
        WITH l1 AS (
          SELECT l.l_orderkey, l.l_suppkey
          FROM lineitem l JOIN orders o ON l.l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
            AND l.l_shipdate > o_orderdate + INTERVAL {days} DAY
        )
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM l1
        JOIN supplier ON s_suppkey = l1.l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_{nation}'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM l1 l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s_name
        """
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"days={days} nation={nation}: " + "; ".join(problems)

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        size=st.integers(1, 50),
        ptype=st.sampled_from(["STANDARD", "PROMO", "ECONOMY", "LARGE"]),
    )
    def test_q2_window_min_rewrite_matches_correlated_sql(
        self, spark, duck, sf_dir, size, ptype
    ):
        from pyspark.sql import Window

        bridge = (
            table(spark, "lineitem", sf_dir)
            .select("l_partkey", "l_suppkey")
            .distinct()
        )
        s = table(spark, "supplier", sf_dir).select(
            "s_suppkey", "s_name", "s_acctbal"
        )
        p = (
            table(spark, "part", sf_dir)
            .filter((F.col("p_size") == size) & (F.col("p_type") == ptype))
            .select("p_partkey", "p_name")
        )
        w = Window.partitionBy("l_partkey")
        ranked = (
            bridge.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
            .withColumn("min_bal", F.min("s_acctbal").over(w))
            .filter(F.col("s_acctbal") == F.col("min_bal"))
        )
        sdf = ranked.join(
            F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
        ).select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round(F.col("s_acctbal"), 6).alias("s_acctbal"),
        )
        osql = f"""
        SELECT p.p_partkey, p.p_name, s.s_name,
               ROUND(CAST(s.s_acctbal AS DOUBLE), 6) AS s_acctbal
        FROM part p
        JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
          ON b.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = b.l_suppkey
        WHERE p.p_size = {size} AND p.p_type = '{ptype}'
          AND s.s_acctbal = (
            SELECT MIN(s2.s_acctbal)
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b2
            JOIN supplier s2 ON s2.s_suppkey = b2.l_suppkey
            WHERE b2.l_partkey = p.p_partkey
          )
        """
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"size={size} type={ptype}: " + "; ".join(problems)


@pytest.mark.usefixtures("spark", "duck")
class TestMergeUpsertFuzz:
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        del_mod=st.integers(2, 19),
        upd_mod=st.integers(2, 19),
        ins_mod=st.integers(2, 19),
    )
    def test_merge_matches_sql_for_any_change_mix(
        self, spark, duck, sf_dir, del_mod, upd_mod, ins_mod
    ):
        """c2b's MERGE rewrite under arbitrary change-set mixes (overlap
        between delete and update keys included — delete must win), vs
        the literal SQL form."""
        d = table(spark, "documents", sf_dir)
        changes = (
            d.filter(
                (F.col("doc_id") % del_mod == 1) | (F.col("doc_id") % upd_mod == 0)
            )
            .select(
                "doc_id",
                F.when(F.col("doc_id") % del_mod == 1, "D")
                .otherwise("U")
                .alias("op"),
                F.concat(F.col("text"), F.lit(" [rev2]")).alias("new_text"),
            )
            .unionByName(
                d.filter(F.col("doc_id") % ins_mod == 2).select(
                    (F.col("doc_id") + 5000000).alias("doc_id"),
                    F.lit("I").alias("op"),
                    F.concat(
                        F.lit("new doc "), F.col("doc_id").cast("string")
                    ).alias("new_text"),
                )
            )
        )
        target = d.select("doc_id", "text")
        joined = target.join(changes, "doc_id", "left")
        survivors = joined.filter(
            F.col("op").isNull() | (F.col("op") != "D")
        ).select(
            "doc_id",
            F.when(F.col("op") == "U", F.col("new_text"))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        inserts = (
            changes.filter(F.col("op") == "I")
            .join(target, "doc_id", "left_anti")
            .select("doc_id", F.col("new_text").alias("text"))
        )
        sdf = survivors.unionByName(inserts).select(
            "doc_id", F.md5("text").alias("h")
        )
        osql = f"""
        WITH changes AS (
          SELECT doc_id,
                 CASE WHEN doc_id % {del_mod} = 1 THEN 'D' ELSE 'U' END AS op,
                 text || ' [rev2]' AS new_text
          FROM documents WHERE doc_id % {del_mod} = 1 OR doc_id % {upd_mod} = 0
          UNION ALL
          SELECT doc_id + 5000000, 'I', 'new doc ' || CAST(doc_id AS VARCHAR)
          FROM documents WHERE doc_id % {ins_mod} = 2
        ),
        merged AS (
          SELECT t.doc_id,
                 CASE WHEN c.op = 'U' THEN c.new_text ELSE t.text END AS text
          FROM documents t LEFT JOIN changes c ON c.doc_id = t.doc_id
          WHERE c.op IS NULL OR c.op <> 'D'
          UNION ALL
          SELECT c.doc_id, c.new_text
          FROM changes c ANTI JOIN documents t ON c.doc_id = t.doc_id
          WHERE c.op = 'I'
        )
        SELECT doc_id, md5(text) AS h FROM merged
        """
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, (
            f"del%{del_mod} upd%{upd_mod} ins%{ins_mod}: " + "; ".join(problems)
        )


class TestSketchKernels:
    """Pure-Python kernel properties (no Spark in the loop): the
    quantile-summary merge must respect the declared rank-error bound on
    arbitrary data and shardings, and resize pooling must stay inside
    the source value range."""

    @settings(max_examples=60, deadline=None)
    @given(
        vals=st.lists(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=1,
            max_size=400,
        ),
        n_shards=st.integers(min_value=1, max_value=8),
        m=st.integers(min_value=4, max_value=64),
        q=st.floats(min_value=0.01, max_value=0.99),
    )
    def test_quantile_merge_rank_error_bound(self, vals, n_shards, m, q):
        import numpy as np

        from s3_kinesis_replay_spark.operators.quantile_sketch import (
            _merge_estimate,
            _shard_summary,
        )

        x = np.array(vals, dtype=np.float64)
        rng = np.random.RandomState(7)
        shard_of = rng.randint(0, n_shards, len(x))
        pts, wts, total = [], [], 0
        for s in range(n_shards):
            sv = x[shard_of == s]
            if len(sv) == 0:
                continue
            n, p, w = _shard_summary(sv, m)
            total += n
            pts.append(p)
            wts.append(w)
        est = _merge_estimate(
            np.concatenate(pts), np.concatenate(wts), float(total), (q,)
        )[0]
        # est must be an actual data value whose RANK RANGE (ties span
        # [searchsorted-left, searchsorted-right]) comes within the
        # declared bound N/(2m), +1 for the discrete target-rank step
        srt = np.sort(x)
        lo = np.searchsorted(srt, est, side="left")
        hi = np.searchsorted(srt, est, side="right")
        target = q * len(x)
        err = 0.0 if lo <= target <= hi else min(
            abs(lo - target), abs(hi - target)
        )
        bound = len(x) / (2 * m) + 1
        assert err <= bound + 1, (
            f"rank range [{lo},{hi}] target {target} bound {bound}"
        )

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=16),
        h=st.integers(min_value=1, max_value=16),
        ow=st.integers(min_value=1, max_value=16),
        oh=st.integers(min_value=1, max_value=16),
        seed=st.integers(min_value=0, max_value=1000),
    )
    def test_resize_frame_range_and_size(self, w, h, ow, oh, seed):
        import random

        from s3_kinesis_replay_spark.operators.multimodal import resize_frame

        rng = random.Random(seed)
        frame = bytes(rng.randrange(256) for _ in range(w * h))
        out = resize_frame(frame, w, h, ow, oh)
        assert len(out) == ow * oh
        if frame:
            assert min(out) >= min(frame) - 0 and max(out) <= max(frame)
        # identity resize is exact
        assert resize_frame(frame, w, h, w, h) == frame


class TestFreqSketchKernels:
    """Misra–Gries mergeable heavy hitters (operators/freq_sketch.py):
    the two-sided bound est <= exact, exact - est <= N/(m+1) must hold
    for EVERY item (not just the reported top-k) after shard + merge +
    re-compress, for any sharding of the stream."""

    @settings(max_examples=80, deadline=None)
    @given(
        data=st.lists(
            st.integers(min_value=0, max_value=40),  # zipf-ish small key space
            min_size=1,
            max_size=500,
        ),
        n_shards=st.integers(min_value=1, max_value=8),
        m=st.integers(min_value=2, max_value=24),
    )
    def test_mg_merge_two_sided_bound(self, data, n_shards, m):
        from collections import Counter

        import numpy as np

        from s3_kinesis_replay_spark.operators.freq_sketch import _mg_compress

        x = np.array(data)
        rng = np.random.RandomState(11)
        shard_of = rng.randint(0, n_shards, len(x))
        acc: dict = {}
        for s in range(n_shards):
            sv = x[shard_of == s]
            if len(sv) == 0:
                continue
            items, counts = np.unique(sv, return_counts=True)
            items, counts = _mg_compress(items, counts.astype(np.int64), m)
            for it, c in zip(items, counts):
                acc[int(it)] = acc.get(int(it), 0) + int(c)
        if acc:
            items = np.array(list(acc.keys()))
            counts = np.array(list(acc.values()), dtype=np.int64)
            items, counts = _mg_compress(items, counts, m)
            est = dict(zip(items.tolist(), counts.tolist()))
        else:
            est = {}
        exact = Counter(data)
        bound = len(data) / (m + 1)
        for item, c in exact.items():
            e = est.get(item, 0)
            assert e <= c, (item, e, c)
            assert c - e <= bound, (item, e, c, bound)
        # nothing hallucinated: every estimated item exists
        assert set(est) <= set(exact)

    def test_mg_compress_keeps_at_most_m(self):
        import numpy as np

        from s3_kinesis_replay_spark.operators.freq_sketch import _mg_compress

        items = np.arange(100)
        counts = np.arange(1, 101, dtype=np.int64)
        ki, kc = _mg_compress(items, counts, 10)
        assert len(ki) <= 10
        # survivors are the largest, deducted by the (m+1)-th largest (90)
        assert set(ki.tolist()) == set(range(90, 100))
        assert kc.tolist() == [c - 90 for c in range(91, 101)]


class TestLakehouseInvariants:
    """Round-10 lakehouse fuzz (VERDICT r9 item 7): the compactor must be
    idempotent under ARBITRARY file-size distributions, and the z-order
    rewrite must be layout-invariant under ARBITRARY box predicates —
    the two invariants the hand-picked fixtures can't sweep."""

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        days=st.lists(
            st.lists(st.integers(1, 400), min_size=1, max_size=6),
            min_size=1,
            max_size=3,
        ),
        target_rows=st.integers(50, 800),
    )
    def test_compaction_idempotent_any_distribution(
        self, spark, days, target_rows
    ):
        import glob
        import math
        import os
        import shutil
        import tempfile

        import pyarrow as pa
        import pyarrow.parquet as pq

        from s3_kinesis_replay_spark.operators.layout import (
            compact_partitions,
        )

        root = tempfile.mkdtemp(prefix="skr_prop_compact_")
        try:
            eid = 0
            totals = {}
            for d, files in enumerate(days):
                pdir = os.path.join(root, f"dt=2024-02-{d + 1:02d}")
                os.makedirs(pdir)
                for i, n in enumerate(files):
                    ids = list(range(eid, eid + n))
                    eid += n
                    pq.write_table(
                        pa.table({"event_id": ids}),
                        os.path.join(pdir, f"part-{i:04d}.parquet"),
                    )
                totals[os.path.basename(pdir)] = sum(files)

            compact_partitions(spark, root, target_rows=target_rows)
            # converged: every partition is at/below its footer-derived
            # need, so a SECOND pass rewrites nothing
            for pname, rows in totals.items():
                n_files = len(
                    glob.glob(os.path.join(root, pname, "*.parquet"))
                )
                assert n_files <= math.ceil(rows / target_rows), (
                    pname,
                    n_files,
                    rows,
                    target_rows,
                )
            assert compact_partitions(spark, root, target_rows=target_rows) == []
            # content invariance
            got = spark.read.parquet(root)
            assert got.count() == eid
            assert (
                got.agg(F.sum("event_id")).collect()[0][0]
                == eid * (eid - 1) // 2
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        d_lo=st.integers(min_value=-400, max_value=1400),
        d_len=st.integers(min_value=0, max_value=900),
        pk_lo=st.integers(min_value=0, max_value=2100),
        pk_len=st.integers(min_value=0, max_value=900),
    )
    def test_zorder_box_scan_invariance(
        self, spark, sf_dir, d_lo, d_len, pk_lo, pk_len
    ):
        from s3_kinesis_replay_spark.queries.sources_q import _zorder_layout

        zpath = _zorder_layout(spark, sf_dir)
        lo = F.date_add(F.lit("1995-01-01").cast("date"), d_lo)
        hi = F.date_add(F.lit("1995-01-01").cast("date"), d_lo + d_len)
        cond = (
            (F.col("l_shipdate").cast("date") >= lo)
            & (F.col("l_shipdate").cast("date") <= hi)
            & F.col("l_partkey").between(pk_lo, pk_lo + pk_len)
        )

        def probe(df):
            r = df.filter(cond).agg(
                F.count("*"),
                F.sum("l_orderkey"),
                F.sum("l_partkey"),
                F.sum("l_linenumber"),
            ).collect()[0]
            return tuple(r)

        z = probe(spark.read.parquet(zpath))
        orig = probe(table(spark, "lineitem", sf_dir))
        assert z == orig, (z, orig)


@pytest.mark.usefixtures("spark")
class TestTableFormatModel:
    """Model-based fuzz of the manifest table (r11): a random sequence of
    append/overwrite/delete/compact ops runs against BOTH the real table
    and a trivial in-memory model; every retained version must read back
    exactly the model's view at that version, and a keep_last=1 vacuum
    must preserve the latest view while vacuumed versions raise."""

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        ops=st.lists(
            st.tuples(
                st.sampled_from(
                    [
                        "append",
                        "overwrite",
                        "delete",
                        "compact",
                        "reinsert",  # r12: re-append a DELETED key — must
                        # be visible again (sequence-scoped deletes)
                        "merge",  # r12: upsert existing + new keys
                        "race_append",  # r12: two threads append at once —
                        # base-validated commits + bounded retry must land
                        # BOTH (no lost update), in some serial order
                        "fold",  # r12b: metadata-only manifest compaction —
                        # a pure no-op on the visible view, including the
                        # per-entry sequence scoping deletes rely on
                        "part_append",  # r13: PARTITIONED append (Hive
                        # layout + descriptor summaries) — reads identical
                        # to a plain append; pruning correctness is pinned
                        # by the post-loop pruned-read check
                        "maintain",  # r13: auto-maintenance (fold/compact
                        # on thresholds) — whatever fires must be invisible
                        # to every read
                        "pos_delete",  # r13: position (row-address) delete
                        # by predicate — file-scoped, composes with the
                        # equality tier, folds/compacts away
                        "update_where",  # r13: atomic predicate UPDATE
                        # (append updated copies + position-delete old)
                        "restore",  # r13b: metadata-only rollback to a
                        # random retained version — view AND tombstone
                        # state must equal that version's exactly
                        "cluster",  # r13b: OPTIMIZE rewrite — a pure
                        # no-op on the visible view, like compact
                        "wap_publish",  # r13b: branch → staged write →
                        # publish (or drop: staged rows must vanish)
                        "constraint_cycle",  # r13b: set an always-true
                        # CHECK, prove a violating write refuses without
                        # advancing state, drop it — view untouched
                        "constraint_vs_append",  # r14: a violating append
                        # races into set_constraint's validation window —
                        # the delta re-validation must refuse the
                        # constraint; the append itself lands
                        "add_column",  # r14: metadata-only schema
                        # evolution — the (id, val) view is untouched at
                        # every version; later id/val-only writers stay
                        # legal (union-preserving merge)
                    ]
                ),
                st.integers(1, 5),  # row count / delete count
                st.integers(0, 10**6),  # value seed
            ),
            min_size=1,
            max_size=5,
        )
    )
    def test_random_op_sequences_match_model(self, spark, tmp_path_factory, ops):
        import tempfile
        import shutil

        from s3_kinesis_replay_spark.operators.table_format import (
            ConstraintViolation,
            _read_manifest,
            latest_version,
            snapshot_auto_maintain,
            snapshot_branch,
            snapshot_cluster,
            snapshot_compact,
            snapshot_delete,
            snapshot_delete_where,
            snapshot_drop_branch,
            snapshot_drop_constraint,
            snapshot_fold_metadata,
            snapshot_publish,
            snapshot_read,
            snapshot_read_pruned,
            snapshot_restore,
            snapshot_set_constraint,
            snapshot_update_where,
            snapshot_merge,
            snapshot_vacuum,
            snapshot_write,
            versions,
        )

        root = tempfile.mkdtemp(prefix="skr_prop_tbl_")
        try:
            next_id = 0
            n_branches = 0
            view: dict[int, int] = {}  # the model: id -> val
            # r14: expected ROW-LEVEL CDC events per commit, recorded at
            # action time for every single-commit action with
            # deterministic event semantics; checked against
            # snapshot_row_changes post-loop (pre-vacuum)
            cdc_expect: dict[int, set] = {}
            tombstoned: set[int] = set()  # deleted, never re-inserted
            history: dict[int, dict[int, int]] = {}  # version -> view
            hist_tomb: dict[int, set[int]] = {}  # version -> tombstoned

            def df_of(rows):
                return spark.createDataFrame(
                    list(rows.items()), "id long, val long"
                )

            for kind, n, seed in ops:
                if kind == "append":
                    new = {next_id + i: seed + i for i in range(n)}
                    next_id += n
                    v = snapshot_write(spark, df_of(new), root, "append")
                    cdc_expect[v] = {(k, x, "insert") for k, x in new.items()}
                    view = {**view, **new}
                elif kind == "overwrite":
                    new = {next_id + i: seed - i for i in range(n)}
                    next_id += n
                    v = snapshot_write(spark, df_of(new), root, "overwrite")
                    view = new
                    tombstoned = set()
                elif kind == "delete":
                    if not view:
                        continue
                    doomed = sorted(view)[: min(n, len(view))]
                    v = snapshot_delete(
                        spark,
                        root,
                        spark.createDataFrame(
                            [(k,) for k in doomed], "id long"
                        ),
                        "id",
                    )
                    cdc_expect[v] = {
                        (k, view[k], "delete") for k in doomed
                    }
                    view = {k: x for k, x in view.items() if k not in doomed}
                    tombstoned |= set(doomed)
                elif kind == "reinsert":
                    if not tombstoned:
                        continue
                    back = sorted(tombstoned)[: min(n, len(tombstoned))]
                    new = {k: seed + k for k in back}
                    v = snapshot_write(spark, df_of(new), root, "append")
                    cdc_expect[v] = {(k, x, "insert") for k, x in new.items()}
                    view = {**view, **new}
                    tombstoned -= set(back)
                elif kind == "merge":
                    if not view:
                        continue
                    upd = {
                        k: seed - k
                        for k in sorted(view)[: min(n, len(view))]
                    }
                    ins = {next_id + i: seed + i for i in range(n)}
                    next_id += n
                    src = {**upd, **ins}
                    v = snapshot_merge(spark, root, df_of(src), "id")
                    cdc_expect[v] = (
                        {(k, view[k], "update_preimage") for k in upd}
                        | {(k, x, "update_postimage") for k, x in upd.items()}
                        | {(k, x, "insert") for k, x in ins.items()}
                    )
                    view = {**view, **src}
                    tombstoned -= set(src)
                elif kind == "race_append":
                    import threading

                    a = {next_id + i: seed + i for i in range(n)}
                    b = {next_id + n + i: seed - i for i in range(n)}
                    next_id += 2 * n
                    barrier = threading.Barrier(2)
                    errs: list[Exception] = []

                    def racer(rows):
                        try:
                            barrier.wait()
                            snapshot_write(spark, df_of(rows), root, "append")
                        except Exception as e:  # noqa: BLE001
                            errs.append(e)

                    ts = [
                        threading.Thread(target=racer, args=(r,))
                        for r in (a, b)
                    ]
                    for t in ts:
                        t.start()
                    for t in ts:
                        t.join()
                    assert not errs, errs
                    view = {**view, **a, **b}
                    v = max(versions(root))  # both landed: two commits
                elif kind == "fold":
                    if not view:
                        continue
                    v = snapshot_fold_metadata(root)
                elif kind == "part_append":
                    new = {next_id + i: seed + i for i in range(n)}
                    next_id += n
                    v = snapshot_write(
                        spark, df_of(new), root, "append",
                        partition_by=["val"],
                    )
                    cdc_expect[v] = {(k, x, "insert") for k, x in new.items()}
                    view = {**view, **new}
                elif kind == "maintain":
                    if not view:
                        continue
                    snapshot_auto_maintain(
                        spark, root, fold_at=3, compact_at=3
                    )
                    v = max(versions(root))
                elif kind == "pos_delete":
                    if not view:
                        continue
                    r = seed % 3  # Spark pmod == Python % for positive mod
                    matched = {k: x for k, x in view.items() if x % 3 == r}
                    v = snapshot_delete_where(
                        spark, root, f"pmod(val, 3) = {r}"
                    )
                    if matched:
                        cdc_expect[v] = {
                            (k, x, "delete") for k, x in matched.items()
                        }
                    # a fully-emptied view still READS as zero rows (the
                    # manifest keeps its entries) — model it as {}
                    view = {k: x for k, x in view.items() if x % 3 != r}
                elif kind == "update_where":
                    if not view:
                        continue
                    r = seed % 3
                    matched = {k: x for k, x in view.items() if x % 3 == r}
                    v = snapshot_update_where(
                        spark,
                        root,
                        f"pmod(val, 3) = {r}",
                        {"val": "val + 1000000"},
                    )
                    if matched:
                        cdc_expect[v] = {
                            (k, x, "update_preimage")
                            for k, x in matched.items()
                        } | {
                            (k, x + 1000000, "update_postimage")
                            for k, x in matched.items()
                        }
                    view = {
                        k: (x + 1000000 if x % 3 == r else x)
                        for k, x in view.items()
                    }
                elif kind == "restore":
                    if not history:
                        continue
                    target = sorted(history)[seed % len(history)]
                    v = snapshot_restore(root, target)
                    view = dict(history[target])
                    tombstoned = set(hist_tomb[target])
                elif kind == "cluster":
                    if not view:
                        continue
                    m = _read_manifest(root, latest_version(root))
                    if m.get("partition_spec"):
                        continue  # cluster refuses partitioned layouts
                    v = snapshot_cluster(
                        spark, root, ["id"], target_files=2
                    )
                elif kind == "wap_publish":
                    if not view:
                        continue
                    name = f"b{n_branches}"
                    n_branches += 1
                    staged = {next_id + i: seed + i for i in range(n)}
                    next_id += n
                    snapshot_branch(root, name)
                    snapshot_write(
                        spark, df_of(staged), root, "append", branch=name
                    )
                    # main must not see staged rows pre-publish
                    assert {
                        r["id"] for r in snapshot_read(spark, root).collect()
                    } == set(view)
                    if seed % 3 == 0:  # abandon: staged rows never land
                        snapshot_drop_branch(root, name)
                        continue
                    v = snapshot_publish(root, name)
                    snapshot_drop_branch(root, name)
                    view = {**view, **staged}
                elif kind == "constraint_cycle":
                    if not view:
                        continue
                    snapshot_set_constraint(
                        spark, root, "fuzz_ok", "id >= 0"
                    )
                    before = latest_version(root)
                    try:
                        snapshot_write(
                            spark,
                            df_of({-(k + 1): x for k, x in view.items()}),
                            root,
                            "append",
                        )
                        raise AssertionError(
                            "violating write accepted under fuzz_ok"
                        )
                    except ConstraintViolation:
                        pass
                    assert latest_version(root) == before
                    v = snapshot_drop_constraint(root, "fuzz_ok")
                elif kind == "constraint_vs_append":
                    if not view:
                        continue
                    from unittest import mock

                    import s3_kinesis_replay_spark.operators.table_format as tfm

                    # the racer's rows violate by a sentinel val no other
                    # action produces; their ids are ordinary next_ids so
                    # the model stays range-checkable
                    bad = {next_id + i: -(10**12) - i for i in range(n)}
                    next_id += n
                    orig_enforce = tfm._enforce_constraints
                    fired: list[int] = []

                    def race_enforce(df, cons, ctx):
                        orig_enforce(df, cons, ctx)
                        if not fired:
                            fired.append(1)
                            snapshot_write(
                                spark, df_of(bad), root, "append"
                            )

                    with mock.patch.object(
                        tfm, "_enforce_constraints", race_enforce
                    ):
                        try:
                            snapshot_set_constraint(
                                spark, root, "fuzz_nonneg",
                                "val > -1000000000",
                            )
                            raise AssertionError(
                                "constraint landed over unvalidated "
                                "violating rows"
                            )
                        except ConstraintViolation:
                            pass
                    if not fired:
                        # existing data already violates (an earlier
                        # round's bad rows): initial refusal, racer never
                        # ran, no state change
                        continue
                    view = {**view, **bad}
                    tombstoned -= set(bad)
                    m = _read_manifest(root, latest_version(root))
                    assert "fuzz_nonneg" not in m.get("constraints", {})
                    v = latest_version(root)
                    cdc_expect[v] = {
                        (k, x, "insert") for k, x in bad.items()
                    }
                elif kind == "add_column":
                    if not view:
                        continue
                    from s3_kinesis_replay_spark.operators.table_format import (
                        snapshot_add_column,
                    )

                    m = _read_manifest(root, latest_version(root))
                    if m.get("schema") is None:
                        continue  # legacy lineage: add-column refuses
                    cname = f"x{seed % 3}"
                    if any(c == cname for c, _t in m["schema"]):
                        continue  # already evolved with this name
                    v = snapshot_add_column(
                        spark, root, cname, "string"
                    )
                else:  # compact
                    if not view:
                        continue
                    v = snapshot_compact(spark, root)
                history[v] = dict(view)
                hist_tomb[v] = set(tombstoned)

            for v, want in history.items():
                got = {
                    (r["id"], r["val"])
                    for r in snapshot_read(spark, root, v).collect()
                }
                assert got == set(want.items()), (v, got, want)

            # r14: row-level CDC vs the model — every recorded commit's
            # event set must match snapshot_row_changes over (v-1, v]
            from s3_kinesis_replay_spark.operators.table_format import (
                snapshot_row_changes,
            )

            for v, want_ev in cdc_expect.items():
                if v < 2:
                    continue  # v1 has no predecessor manifest to diff
                got_ev = {
                    (r["id"], r["val"], r["_change_type"])
                    for r in snapshot_row_changes(
                        spark, root, v - 1, v
                    ).collect()
                }
                assert got_ev == want_ev, (v, got_ev, want_ev)

            # pruned read vs the model, latest version: whatever mix of
            # partitioned/unpartitioned/deleted/folded state accrued,
            # manifest pruning + the residual filter must equal a plain
            # model filter on the same id range (r13)
            if history and next_id:
                lo, hi = 0, max(1, next_id // 2)
                latest = max(history)
                pruned, _, _ = snapshot_read_pruned(
                    spark, root, {"id": (lo, hi)}, version=latest
                )
                got = {(r["id"], r["val"]) for r in pruned.collect()}
                want_rows = {
                    (k, x)
                    for k, x in history[latest].items()
                    if lo <= k <= hi
                }
                assert got == want_rows, (latest, got, want_rows)

            if history:
                latest = max(history)
                snapshot_vacuum(root, keep_last=1, min_age_s=0.0)
                assert versions(root) == [latest]
                got = {
                    (r["id"], r["val"])
                    for r in snapshot_read(spark, root, latest).collect()
                }
                assert got == set(history[latest].items())
                for v in sorted(history)[:-1]:
                    with pytest.raises(FileNotFoundError):
                        snapshot_read(spark, root, v)
        finally:
            shutil.rmtree(root, ignore_errors=True)
