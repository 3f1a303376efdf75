"""UDF / UDAF / UDTF surface (SURVEY §2.J).

Spark-first discipline: UDFs are the slow path, so every row here exists
to prove the *surface* works (Arrow-vectorized exchange, grouped state,
batch iterators, table functions) — the same logic is also expressible
with built-ins, which is exactly what the DuckDB oracle checks against.

Determinism notes (SURVEY §5.3):

* Python/pandas float arithmetic is IEEE-754 double — per-row expressions
  are bit-identical to DuckDB's; rounding happens JVM-side via F.round so
  both engines round the same double.
* Aggregating UDFs only sum integer-valued doubles (exact in binary —
  no accumulation-order drift between numpy pairwise and DuckDB serial).
* Grouped-map and UDTF outputs carry explicit keys so row identity never
  depends on partition layout.

At scale: all pandas UDFs ride Arrow batches (spark.sql.execution.arrow.*
in session.py); `applyInPandas` shuffles once on the group key;
`mapInPandas` is shuffle-free (narrow, per-partition batches).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from s3_kinesis_replay_spark.registry import register
from s3_kinesis_replay_spark.queries.helpers import r6, t


@register(
    "j1_scalar_udf",
    "J1",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 6) AS disc_price
    FROM lineitem WHERE l_quantity >= 48
    """,
    note="row-at-a-time Python UDF (Arrow-optimized); oracle is the plain "
    "expression — proves the UDF boundary is value-transparent",
)
def j1_scalar_udf(spark, sf_dir):
    @F.udf("double", useArrow=True)
    def disc_price(extp, disc):
        return extp * (1.0 - disc)

    li = t(spark, "lineitem", sf_dir).filter(F.col("l_quantity") >= 48)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r6(disc_price("l_extendedprice", "l_discount")).alias("disc_price"),
    )


@register(
    "j2_pandas_udf_scalar",
    "J2",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
    FROM lineitem WHERE l_quantity >= 48
    """,
    note="vectorized pandas UDF over Arrow batches (the fast Python path)",
)
def j2_pandas_udf_scalar(spark, sf_dir):
    @F.pandas_udf("double")
    def charge(extp: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return extp * (1.0 - disc) * (1.0 + tax)

    li = t(spark, "lineitem", sf_dir).filter(F.col("l_quantity") >= 48)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r6(charge("l_extendedprice", "l_discount", "l_tax")).alias("charge"),
    )


@register(
    "j3_pandas_grouped_agg",
    "J3",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity) / COUNT(*), 6) AS avg_qty
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    note="grouped-agg pandas UDF; quantities are integer-valued doubles so "
    "the numpy sum is exact regardless of accumulation order",
)
def j3_pandas_grouped_agg(spark, sf_dir):
    @F.pandas_udf("double")
    def avg_qty(qty: pd.Series) -> float:
        return float(qty.sum()) / float(len(qty))

    return (
        t(spark, "lineitem", sf_dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(r6(avg_qty("l_quantity")).alias("avg_qty"))
    )


@register(
    "j4_grouped_map",
    "J4",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
           CAST(row_number() OVER (
               PARTITION BY l_returnflag, l_linestatus
               ORDER BY l_orderkey, l_linenumber) AS BIGINT) AS grp_seq
    FROM lineitem
    """,
    note="applyInPandas grouped map: per-group deterministic sequence; one "
    "shuffle on the group key, group processed whole in one Arrow exchange",
)
def j4_grouped_map(spark, sf_dir):
    schema = (
        "l_orderkey BIGINT, l_linenumber INT, l_returnflag STRING, "
        "l_linestatus STRING, grp_seq BIGINT"
    )

    def seq_in_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)
        pdf["grp_seq"] = pdf.index + 1
        return pdf

    return (
        t(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
        .groupBy("l_returnflag", "l_linestatus")
        .applyInPandas(seq_in_group, schema)
    )


@register(
    "j5_map_in_pandas",
    "J5",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_py,
           CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
               AS n_words_py
    FROM documents
    """,
    note="mapInPandas batch iterator: narrow (no shuffle), whole-partition "
    "Arrow batches — the template for multimodal feature extraction",
)
def j5_map_in_pandas(spark, sf_dir):
    def doc_stats(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_chars_py": pdf["text"].str.len().astype("int64"),
                    "n_words_py": (pdf["text"].str.count(" ") + 1).astype("int64"),
                }
            )

    return (
        t(spark, "documents", sf_dir)
        .select("doc_id", "text")
        .mapInPandas(doc_stats, "doc_id BIGINT, n_chars_py BIGINT, n_words_py BIGINT")
    )


@register(
    "j6_udtf_shingles",
    "J6",
    """
    SELECT doc_id, CAST(i AS INTEGER) AS pos,
           string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
               AS shingle
    FROM documents,
         LATERAL (SELECT unnest(range(1, len(string_split(text, ' ')))) AS i)
    WHERE doc_id < 50
    """,
    note="Python UDTF (Spark 4): lateral table function emitting word "
    "bigrams with positions; oracle is the G9-style unnest formulation",
)
def j6_udtf_shingles(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id BIGINT, pos INT, shingle STRING")
    class Bigrams:
        def eval(self, doc_id: int, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield doc_id, i + 1, toks[i] + " " + toks[i + 1]

    spark.udtf.register("skr_bigrams", Bigrams)
    t(spark, "documents", sf_dir).createOrReplaceTempView("skr_j6_docs")
    return spark.sql(
        """
        SELECT g.doc_id, g.pos, g.shingle
        FROM skr_j6_docs d, LATERAL skr_bigrams(d.doc_id, d.text) g
        WHERE d.doc_id < 50
        """
    )
