"""Training-data pipeline ops beyond dedup/similarity (SURVEY §2.I, rows
I12–I17): token-budget shard packing, deterministic train/val/test hash
split, quality-filter funnel, curriculum deciles, random projection,
eval-set contamination check. All north-star ops
([NS]) — no reference analog (the reference checkout is empty; SURVEY §0).

Scale design (100 TB):
* p2 shard packing is a per-language prefix sum — the window partitions
  by ``lang`` so languages pack in parallel; within one language the
  running sum is a sorted-window pass (at extreme per-language volume,
  split the key space by ``source`` or date the same way). Shard ids are
  derived arithmetically from the prefix sum — no driver loop, no
  sequential assignment step.
* p3 split assignment is a pure per-row hash (md5 → bucket 0..255) —
  embarrassingly parallel, deterministic across engines and re-runs, and
  stable under re-partitioning (the split of a given doc never depends on
  which executor sees it). This is the property a 100 TB pipeline needs:
  re-running the job, or adding data, never reshuffles existing docs
  between train and val.
* p4 funnel = four global counts — each a map-side partial count; the
  four scans collapse into one via a single pass over conditional
  aggregates (count_if), so the funnel costs ONE scan of the corpus.
* p5 curriculum deciles use a global ntile — at 100 TB the same result
  comes from approx quantile boundaries + a per-row bucket lookup; the
  declared semantics here (exact ntile with doc_id tiebreak) pin the
  contract the approximate path must converge to.

Integer-exact discipline: the stopword-ratio threshold in p4 is declared
as ``25 * n_stopwords >= n_tokens`` (i.e. ratio ≥ 0.04) so the condition
is integer arithmetic in BOTH engines — no float-division boundary flake
can flip a row between funnel stages.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from s3_kinesis_replay_spark.operators.text import STOPWORDS
from s3_kinesis_replay_spark.queries.helpers import DEC, r6, sdec, t
from s3_kinesis_replay_spark.registry import register

# Pinned split fractions: 256 md5 buckets → 205/25/26 ≈ 80/10/10.
_TRAIN_LT, _VAL_LT = 205, 230
_SHARD_TOKENS = 2000  # declared budget; tiny so small SFs still multi-shard

_HEX = "0123456789abcdef"

_SQL_STOPWORDS = "[" + ",".join(f"'{w}'" for w in sorted(STOPWORDS)) + "]"


def _hexint_sql(md5_expr: str, start: int, n: int) -> str:
    """DuckDB: integer value of ``n`` hex chars of an md5 hex string
    starting at 1-based ``start`` — matches Spark's conv(substr,16,10)."""
    terms = [
        f"(instr('{_HEX}', substr({md5_expr}, {start + i}, 1)) - 1)"
        f" * {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "(" + " + ".join(terms) + ")"


def _hexint_col(md5_col, start: int, n: int):
    """Spark side of _hexint_sql: same hex slice via conv(_, 16, 10)."""
    return F.conv(F.substring(md5_col, start, n), 16, 10).cast("bigint")


def _bucket_sql(id_expr: str) -> str:
    """md5-derived bucket 0..255 (DuckDB side) — the general hex-int
    helper at (start=1, n=2); ONE hex→int definition (review r8: a
    second instr-arithmetic copy lived here and could drift)."""
    return _hexint_sql(f"md5(CAST({id_expr} AS VARCHAR))", 1, 2)


def _bucket_col(id_col: str) -> F.Column:
    """Same bucket on the Spark side — identical md5 hex in both engines."""
    return _hexint_col(F.md5(F.col(id_col).cast("string")), 1, 2).alias(
        "bucket"
    )


@register(
    "p2_shard_packing",
    "I12",
    f"""
    SELECT lang,
           CAST((cum_tokens - tokens) // {_SHARD_TOKENS} AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tokens) AS BIGINT) AS shard_tokens
    FROM (
      SELECT lang, doc_id, tokens,
             SUM(tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_tokens
      FROM (
        SELECT lang, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        FROM documents
      )
    )
    GROUP BY lang, shard_id
    """,
    note="token-budget shard packing per language: shard = floor(prefix "
    "tokens / budget); integer div in both engines; window partitioned by "
    "lang so packing parallelizes",
)
def p2_shard_packing(spark, sf_dir):
    d = t(spark, "documents", sf_dir)
    tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = d.select("lang", "doc_id", tokens.alias("tokens"))
    packed = base.withColumn("cum_tokens", F.sum("tokens").over(w)).select(
        "lang",
        "tokens",
        F.expr(f"(cum_tokens - tokens) div {_SHARD_TOKENS}").alias("shard_id"),
    )
    return packed.groupBy("lang", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").alias("shard_tokens"),
    )


@register(
    "p3_hash_split",
    "I13",
    f"""
    SELECT CASE WHEN bucket < {_TRAIN_LT} THEN 'train'
                WHEN bucket < {_VAL_LT} THEN 'val'
                ELSE 'test' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM (SELECT lang, n_chars, {_bucket_sql("doc_id")} AS bucket
          FROM documents)
    GROUP BY split, lang
    """,
    note="deterministic 80/10/10 train/val/test assignment from md5(doc_id) "
    "bucket 0..255 — stable under re-partitioning and incremental loads; "
    "md5 hex is cross-engine-identical",
)
def p3_hash_split(spark, sf_dir):
    d = t(spark, "documents", sf_dir)
    bucketed = d.select("lang", "n_chars", _bucket_col("doc_id"))
    split = (
        F.when(F.col("bucket") < _TRAIN_LT, "train")
        .when(F.col("bucket") < _VAL_LT, "val")
        .otherwise("test")
        .alias("split")
    )
    return bucketed.select(split, "lang", "n_chars").groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


@register(
    "p4_quality_funnel",
    "I14",
    f"""
    WITH feats AS (
      SELECT n_chars, lang,
             len(string_split(lower(text), ' ')) AS n_tok,
             len(list_filter(string_split(lower(text), ' '),
                             w -> list_contains({_SQL_STOPWORDS}, w))) AS n_stop
      FROM documents
    )
    SELECT stage, n_docs,
           ROUND(CAST(n_docs AS DOUBLE) / MAX(n_docs) OVER (), 6) AS keep_frac
    FROM (
      SELECT 's0_all' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs FROM feats
      UNION ALL
      SELECT 's1_minlen', CAST(count_if(n_chars >= 200) AS BIGINT) FROM feats
      UNION ALL
      SELECT 's2_lang', CAST(count_if(n_chars >= 200
             AND lang IN ('en','de','es','fr')) AS BIGINT) FROM feats
      UNION ALL
      SELECT 's3_stopwords', CAST(count_if(n_chars >= 200
             AND lang IN ('en','de','es','fr')
             AND 25 * n_stop >= n_tok) AS BIGINT) FROM feats
    )
    """,
    note="quality-filter funnel in ONE corpus scan (conditional counts); "
    "stopword threshold declared integer-exact (25*n_stop >= n_tok ⇔ "
    "ratio ≥ 0.04)",
)
def p4_quality_funnel(spark, sf_dir):
    d = t(spark, "documents", sf_dir)
    toks = F.split(F.lower(F.col("text")), " ")
    stop_arr = F.array(*[F.lit(w) for w in sorted(STOPWORDS)])
    feats = d.select(
        "n_chars",
        "lang",
        F.size(toks).alias("n_tok"),
        F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w))).alias(
            "n_stop"
        ),
    )
    c1 = F.col("n_chars") >= 200
    c2 = F.col("lang").isin("en", "de", "es", "fr")
    c3 = F.col("n_stop") * 25 >= F.col("n_tok")
    counts = feats.agg(
        F.count(F.lit(1)).alias("s0_all"),
        F.count_if(c1).alias("s1_minlen"),
        F.count_if(c1 & c2).alias("s2_lang"),
        F.count_if(c1 & c2 & c3).alias("s3_stopwords"),
    )
    stages = counts.select(
        F.expr(
            "stack(4, 's0_all', s0_all, 's1_minlen', s1_minlen, "
            "'s2_lang', s2_lang, 's3_stopwords', s3_stopwords) AS (stage, n_docs)"
        )
    )
    w = Window.partitionBy()
    return stages.select(
        "stage",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.max("n_docs").over(w), 6).alias(
            "keep_frac"
        ),
    )


@register(
    "p5_curriculum_deciles",
    "I15",
    """
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM (
      SELECT n_chars,
             ntile(10) OVER (ORDER BY n_chars DESC, doc_id) AS decile
      FROM documents
    )
    GROUP BY decile
    """,
    note="curriculum binning: EXACT ntile(10) by length with doc_id "
    "tiebreak, computed scale-safe (round 8; was a global-ntile "
    "single-partition window, the last UNBOUNDED funnel in PLANS.md): "
    "global rank = per-n_chars base offset (running total over the "
    "~550-row AGGREGATED length histogram — a bounded window) + "
    "row_number within each n_chars partition (fine-grained hash "
    "exchange, no funnel); the ntile bucket is then pure arithmetic on "
    "(rank, N). Identical contract to the oracle's NTILE — the e8 "
    "agg-rank rewrite applied to curriculum binning.",
)
def p5_curriculum_deciles(spark, sf_dir):
    d = t(spark, "documents", sf_dir).select("n_chars", "doc_id")
    counts = d.groupBy("n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    woff = Window.orderBy(F.col("n_chars").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "n_chars",
        F.coalesce(F.sum("cnt").over(woff), F.lit(0)).alias("base"),
    )
    total = counts.agg(F.sum("cnt").alias("n_total"))
    wrn = Window.partitionBy("n_chars").orderBy("doc_id")
    ranked = (
        d.join(F.broadcast(offsets), "n_chars")
        .select(
            "n_chars",
            (F.col("base") + F.row_number().over(wrn)).alias("rk"),
        )
        .crossJoin(F.broadcast(total))
    )
    # ntile(10): the first N%10 buckets hold ceil(N/10) rows, the rest
    # floor(N/10) — bucket from rank by INTEGER arithmetic throughout
    # (review r8: the module's declared integer-exact discipline; the
    # previous double-division ceil was safe only by an unstated
    # rank < 2^53 argument). ceil(a/b) == (a + b - 1) div b for a,b > 0;
    # the WHEN guard keeps the small-divisor branch unreached when
    # N < 10 (small = 0).
    with_parts = ranked.withColumn(
        "small", F.expr("n_total div 10")
    ).withColumn("n_big", F.col("n_total") % 10)
    decile = F.when(
        F.col("rk") <= F.col("n_big") * (F.col("small") + 1),
        F.expr("(rk + small) div (small + 1)"),
    ).otherwise(
        F.col("n_big")
        + F.expr("(rk - n_big * (small + 1) + small - 1) div small")
    )
    return (
        with_parts.select("n_chars", decile.cast("int").alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


def _rademacher_planes(out_dims: int = 8, in_dims: int = 64, seed: int = 7):
    """Seeded ±1 projection matrix (sparse random projection à la
    Achlioptas) — ±1 entries make every projected coordinate a sum of
    signed float64 reads, so a same-order left-fold is bit-identical in
    Spark and DuckDB with no rounding traps."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.choice([-1.0, 1.0], size=(out_dims, in_dims))


_PLANES = _rademacher_planes()


def _proj_sql(plane) -> str:
    lits = "[" + ",".join(f"{x:.1f}" for x in plane) + "]"
    return (
        f"list_reduce(list_transform(range(1, {len(plane) + 1}),"
        f" i -> CAST(embedding[i] AS DOUBLE) * ({lits})[i]), (x, y) -> x + y)"
    )


def _proj_col(plane) -> F.Column:
    arr = F.array(*[F.lit(float(x)) for x in plane])
    return F.aggregate(
        F.zip_with(F.col("embedding"), arr, lambda e, s: e.cast("double") * s),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@register(
    "p6_random_projection",
    "I16",
    """
    SELECT vec_id,
    """
    + ",\n".join(
        f"       ROUND({_proj_sql(_PLANES[j])}, 6) AS p{j}" for j in range(len(_PLANES))
    )
    + """
    FROM embeddings
    """,
    note="seeded Rademacher random projection 64d -> 8d (Achlioptas sparse "
    "RP, public): the cheap dimensionality-reduction front for ANN at "
    "scale; +-1 planes keep the fold integer-signed and cross-engine exact",
)
def p6_random_projection(spark, sf_dir):
    e = t(spark, "embeddings", sf_dir)
    return e.select(
        "vec_id",
        *[F.round(_proj_col(_PLANES[j]), 6).alias(f"p{j}") for j in range(len(_PLANES))],
    )


_DUCK_TOKS = "string_split(lower(text), ' ')"
_DUCK_GRAMS5 = f"""
 list_distinct(list_transform(range(1, len({_DUCK_TOKS}) - 3),
   i -> {_DUCK_TOKS}[i] || ' ' || {_DUCK_TOKS}[i+1] || ' ' || {_DUCK_TOKS}[i+2]
        || ' ' || {_DUCK_TOKS}[i+3] || ' ' || {_DUCK_TOKS}[i+4]))
"""


@register(
    "p7_contamination_check",
    "I17",
    f"""
    WITH b AS (
      SELECT doc_id, lang, {_DUCK_GRAMS5} AS grams,
             {_bucket_sql("doc_id")} AS bucket
      FROM documents
    ),
    tr AS (SELECT doc_id AS train_id, unnest(grams) AS g
           FROM b WHERE bucket < {_TRAIN_LT}),
    te AS (SELECT doc_id, lang, unnest(grams) AS g
           FROM b WHERE bucket >= {_VAL_LT})
    SELECT te.doc_id, te.lang,
           CAST(COUNT(DISTINCT tr.train_id) AS BIGINT) AS n_train_docs,
           CAST(COUNT(DISTINCT te.g) AS BIGINT) AS n_shared_grams
    FROM te JOIN tr ON te.g = tr.g
    GROUP BY te.doc_id, te.lang
    """,
    note="eval-set contamination: test-split docs sharing a 5-gram with "
    "any train-split doc (the QA gate before training). Gram equi-join — "
    "never an all-pairs compare; at 100 TB join on xxhash64(gram) longs "
    "instead of gram strings (declared here as strings for the oracle)",
)
def p7_contamination_check(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.dedup import word_shingles

    d = t(spark, "documents", sf_dir)
    # shingle-explode discipline (round 5b): split to a bare column, then
    # EXPLODE THE SHINGLE EXPRESSION in the same select — both the
    # expression-in-HOF form and the project-array-then-explode form run
    # ~9x slower (per-element re-evaluation / generate-loop re-derivation)
    toked = d.select(
        "doc_id", "lang", _bucket_col("doc_id"),
        F.split(F.lower(F.col("text")), " ").alias("toks"),
    )
    train = toked.filter(F.col("bucket") < _TRAIN_LT).select(
        F.col("doc_id").alias("train_id"),
        F.explode(word_shingles(F.col("toks"), k=5)).alias("g"),
    )
    test = toked.filter(F.col("bucket") >= _VAL_LT).select(
        "doc_id",
        "lang",
        F.explode(word_shingles(F.col("toks"), k=5)).alias("g"),
    )
    return (
        test.join(train, "g")
        .groupBy("doc_id", "lang")
        .agg(
            F.count_distinct("train_id").alias("n_train_docs"),
            F.count_distinct("g").alias("n_shared_grams"),
        )
    )


# ONE definition of the sqrt-damped (alpha=0.5) mixture totals, shared
# by p8 (published weights) and p11 (materialized sample) in BOTH
# engines (review r8: four independent copies could silently drift the
# temperature between the weights and the sample drawn from them).
_SQRT_DAMPED_CTE = """s AS (
      SELECT source, COUNT(*) AS n,
             CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS fs
      FROM documents GROUP BY source
    ),
    tt AS (SELECT *, SUM(fs) OVER () AS sw, SUM(n) OVER () AS total FROM s)"""


def _sqrt_damped_totals(per_src):
    """Spark side of _SQRT_DAMPED_CTE: (source, n_docs, fs, sw, total)
    from a (source, n_docs) aggregate — the global window is bounded
    (one row per source)."""
    w = Window.partitionBy()
    fs = F.floor(F.sqrt(F.col("n_docs"))).cast("bigint")
    return per_src.select("source", "n_docs", fs.alias("fs")).select(
        "source",
        "n_docs",
        "fs",
        F.sum("fs").over(w).alias("sw"),
        F.sum("n_docs").over(w).alias("total"),
    )


def _seeded_rank_key() -> F.Column:
    """The deterministic '#s42' md5 rank key shared by p9 and p11."""
    return F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#s42")))


@register(
    "p8_domain_mixture",
    "I15",
    f"""
    WITH {_SQRT_DAMPED_CTE}
    SELECT source,
           CAST(n AS BIGINT) AS n_docs,
           ROUND(CAST(fs AS DOUBLE) / sw, 6) AS mix_weight,
           CAST((total * fs) // sw AS BIGINT) AS target_n,
           ROUND(LEAST(1.0, CAST((total * fs) // sw AS DOUBLE) / n), 6)
               AS sample_frac
    FROM tt
    """,
    note="temperature-scaled domain mixing (multilingual-sampling style, "
    "alpha=0.5): per-source target counts from sqrt-damped weights, "
    "oversampling capped at 1.0. Weight basis is floor(sqrt(n)) and "
    "target_n is INTEGER division so both engines are exact (no float "
    "accumulation across sources). 20-row agg output — the global window "
    "is declared-global bounded",
)
def p8_domain_mixture(spark, sf_dir):
    d = t(spark, "documents", sf_dir)
    per_src = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    src = _sqrt_damped_totals(per_src)
    target = F.expr("DIV(total * fs, sw)")
    return src.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round(F.col("fs").cast("double") / F.col("sw"), 6).alias("mix_weight"),
        target.cast("bigint").alias("target_n"),
        F.round(
            F.least(F.lit(1.0), target.cast("double") / F.col("n_docs")), 6
        ).alias("sample_frac"),
    )


@register(
    "p9_group_sample",
    "B8",
    """
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '#s42'), doc_id) AS rn
      FROM documents
    ) WHERE rn <= 5
    """,
    note="exactly-k-per-group seeded sampling, cross-engine EXACT (vs "
    "B8's rate-based TOL sampling): rank rows inside each group by "
    "md5(id || seed) — identical hex in both engines — and keep the "
    "first k. Uniform because the hash is effectively random in the id; "
    "deterministic under re-partitioning, incremental loads, and engine "
    "swap. Scale: one shuffle on the group key and WindowGroupLimit "
    "keeps k rows of state per group per partition before the merge — "
    "the distributed reservoir-sample equivalent",
)
def p9_group_sample(spark, sf_dir):
    d = t(spark, "documents", sf_dir)
    w = Window.partitionBy("lang").orderBy(_seeded_rank_key(), "doc_id")
    return (
        d.select("doc_id", "lang", F.row_number().over(w).cast("bigint").alias("rn"))
        .filter(F.col("rn") <= 5)
    )


from s3_kinesis_replay_spark.queries.llm_ops import _DUCK_SHINGLES  # noqa: E402

_P10_SQL = f"""
    WITH RECURSIVE
    sh AS MATERIALIZED (SELECT doc_id, {_DUCK_SHINGLES} ss FROM documents),
    half AS MATERIALIZED (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.ss, b.ss)) AS DOUBLE)
            / len(list_distinct(list_concat(a.ss, b.ss))) >= 0.8
    ),
    edges AS (SELECT src, dst FROM half UNION ALL SELECT dst, src FROM half),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (
      SELECT src AS doc_id, CAST(LEAST(src, MIN(dst)) AS BIGINT) AS component_id
      FROM reach GROUP BY src
    ),
    ranked AS (
      SELECT c.component_id, c.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY c.component_id
                                ORDER BY d.n_chars DESC, c.doc_id) AS rn
      FROM comp c JOIN documents d USING (doc_id)
    )
    SELECT component_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MIN(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc_id
    FROM ranked GROUP BY component_id
"""


@register(
    "p10_cluster_canonical",
    "I3",
    _P10_SQL,
    note="canonical-document selection: for every near-dup CLUSTER "
    "(connected components over verified MinHash-LSH edges, i3d), keep "
    "the longest member (max n_chars, tie -> min doc_id) and report "
    "cluster size. The end-of-pipeline step that turns pairwise dedup "
    "output into a keep-list; per-cluster state is one window rank over "
    "members (clusters are tiny after LSH verification). Oracle = the "
    "i3d recursive closure + the same rank rule",
)
def p10_cluster_canonical(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.dedup import neardup_components

    docs = t(spark, "documents", sf_dir)
    comp = neardup_components(docs, threshold=0.8, k=3, num_hash_tables=32)
    joined = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component_id").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .groupBy("component_id")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.min(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("kept_doc_id"),
        )
    )


_P11_TARGETS = f"""
    WITH {_SQRT_DAMPED_CTE},
    targets AS (
      SELECT source, CAST((total * fs) // sw AS BIGINT) AS target_n FROM tt
    )
"""


@register(
    "p11_mixture_sample",
    "I15",
    _P11_TARGETS
    + """
    SELECT d.doc_id, d.source, CAST(rn AS BIGINT) AS rn FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '#s42'), doc_id) AS rn
      FROM documents
    ) d JOIN targets USING (source)
    WHERE rn <= target_n
    """,
    note="the SAMPLING step of p8's domain mixture, executed: per-source "
    "target counts (sqrt-damped, integer-exact — the p8 formula) drive an "
    "exactly-target_n deterministic sample per source via the p9 md5-rank "
    "rule. Composition p8 x p9: one agg for targets (broadcast, 20 rows), "
    "one WindowGroupLimit-able rank per source, one filter — the whole "
    "mixture materialization is two shuffles at any corpus size",
)
def p11_mixture_sample(spark, sf_dir):
    d = t(spark, "documents", sf_dir)
    per_src = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    targets = _sqrt_damped_totals(per_src).select(
        "source", F.expr("DIV(total * fs, sw)").cast("bigint").alias("target_n")
    )
    w = Window.partitionBy("source").orderBy(_seeded_rank_key(), "doc_id")
    ranked = d.select(
        "doc_id", "source", F.row_number().over(w).cast("bigint").alias("rn")
    )
    return ranked.join(F.broadcast(targets), "source").filter(
        F.col("rn") <= F.col("target_n")
    ).select("doc_id", "source", "rn")


@register(
    "i3e_dupgram_rate",
    "I3",
    f"""
    WITH g AS (
      SELECT DISTINCT doc_id, unnest({_DUCK_GRAMS5}) AS gram FROM documents
    ),
    f AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS c FROM g GROUP BY gram)
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(count_if(f.c >= 2) AS BIGINT) AS n_dup_grams,
           ROUND(CAST(count_if(f.c >= 2) AS DOUBLE) / COUNT(*), 6) AS dup_frac
    FROM g JOIN f ON g.gram = f.gram
    GROUP BY g.doc_id
    """,
    note="duplicated-n-gram rate (exact substring-dedup diagnostic, Lee "
    "et al. 2022 style at word-5-gram granularity): per doc, the "
    "fraction of its distinct 5-grams that also occur in ANOTHER doc "
    "(corpus frequency >= 2). Engine: ONE scan of the shingle pipeline, "
    "corpus frequency as a COUNT window over xxhash64(gram) — shuffles "
    "move 8-byte longs, never gram strings, never an all-pairs compare. "
    "Oracle counts the STRINGS; counts agree up to hash collisions "
    "(P < 1e-8 corpus-wide, the i3 argument).",
)
def i3e_dupgram_rate(spark, sf_dir):
    # Single-scan formulation: (doc_id, gram) pairs are already unique
    # (word_shingles returns per-doc DISTINCT grams), so the corpus
    # frequency of each gram is a COUNT window over xxhash64(gram) —
    # 8-byte shuffle keys, one scan of the shingle pipeline, no self-join
    # (the join form scanned the explode pipeline once per consumer).
    # Hash basis is the i3 argument: counts identical to the oracle's
    # string counts up to collisions, P < 1e-8 corpus-wide.
    from s3_kinesis_replay_spark.operators.dedup import word_shingles

    d = t(spark, "documents", sf_dir)
    # explode the shingle EXPRESSION in the same select (the dedup.py:85
    # form): projecting the array to a column first and exploding it in a
    # separate select runs ~9x slower here — codegen re-derives the
    # projected array inside the generate loop instead of fusing the
    # generator over the expression once per row
    g = (
        d.select(
            "doc_id", F.split(F.lower(F.col("text")), " ").alias("toks")
        )
        .select(
            "doc_id",
            F.explode(word_shingles(F.col("toks"), k=5)).alias("gram"),
        )
        .select("doc_id", F.xxhash64("gram").alias("gh"))
        # materialized once: both the frequency agg and the join consume
        # this relation (8-byte pairs), and without it the shingle
        # pipeline would execute per consumer
        .localCheckpoint(eager=True)
    )
    # corpus frequency via partial-agg groupBy + join, NOT a window
    # partitioned by gh (review r8): a viral boilerplate gram would make
    # one WindowExec partition buffer its entire occurrence list in a
    # single task with no skew mitigation, while the groupBy combines
    # map-side and the join back is AQE-skew-splittable
    freq = g.groupBy("gh").agg(F.count(F.lit(1)).alias("c"))
    counted = g.join(freq, "gh")
    dup = F.count_if(F.col("c") >= 2)
    return counted.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        dup.alias("n_dup_grams"),
        F.round(dup.cast("double") / F.count("*"), 6).alias("dup_frac"),
    )


@register(
    "p14_bloom_contamination",
    "I17",
    f"""
    WITH b AS (
      SELECT doc_id, lang, {_DUCK_GRAMS5} AS grams,
             {_bucket_sql("doc_id")} AS bucket
      FROM documents
    ),
    tr AS (SELECT DISTINCT unnest(grams) AS g FROM b WHERE bucket < {_TRAIN_LT}),
    bits AS (
      SELECT {_hexint_sql("md5(g)", 1, 4)} AS pos FROM tr
      UNION
      SELECT {_hexint_sql("md5(g)", 5, 4)} FROM tr
    ),
    te AS (SELECT DISTINCT doc_id, lang, unnest(grams) AS g
           FROM b WHERE bucket >= {_VAL_LT}),
    tp AS (SELECT doc_id, lang, g,
                  {_hexint_sql("md5(g)", 1, 4)} AS p1,
                  {_hexint_sql("md5(g)", 5, 4)} AS p2
           FROM te)
    SELECT tp.doc_id, tp.lang,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(count_if(b1.pos IS NOT NULL AND b2.pos IS NOT NULL) AS BIGINT)
             AS n_flagged
    FROM tp
    LEFT JOIN bits b1 ON tp.p1 = b1.pos
    LEFT JOIN bits b2 ON tp.p2 = b2.pos
    GROUP BY tp.doc_id, tp.lang
    """,
    note="BLOOM-FILTER contamination pre-screen — the broadcast-scale "
    "path in front of p7's exact gram join: train grams set k=2 bit "
    "positions in an m=2^16 bloom (positions = two md5 hex slices, "
    "deterministic in BOTH engines, so even the false-positive set is "
    "cross-engine exact); a test gram is flagged iff both its bits are "
    "set. The bit table is bounded by m (fits in a broadcast at ANY "
    "corpus size — that is the point of the bloom); test docs keep their "
    "full gram count so downstream can route flagged docs into the "
    "exact p7 join. No false negatives by construction "
    "(tests/test_operators.py asserts p7 ⊆ p14 flags).",
)
def p14_bloom_contamination(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.bloom import bloom_bits, bloom_screen
    from s3_kinesis_replay_spark.operators.dedup import word_shingles

    d = t(spark, "documents", sf_dir)
    # shingle-explode discipline (round 5b, see p7): bare toks column,
    # explode(word_shingles(...)) fused in one select per branch. No
    # .distinct() anywhere: per-doc grams are already distinct
    # (word_shingles), and bloom_bits dedups POSITIONS (longs) — the only
    # shuffle this op pays.
    #
    # spread_scan (r17, guide §2.5): both branches' shingle explodes —
    # and the bloom bit-table checkpoint job (the r16 p14 regression's
    # real cost: a materialization barrier over ONE task) — ran at the
    # single-file scan's parallelism; spreading the tokenized relation
    # parallelizes both (no-op at production scale).
    from s3_kinesis_replay_spark.operators.partitioning import spread_scan

    toked = spread_scan(
        d.select(
            "doc_id", "lang", _bucket_col("doc_id"),
            F.split(F.lower(F.col("text")), " ").alias("toks"),
        ),
        "doc_id",
    )
    tr = toked.filter(F.col("bucket") < _TRAIN_LT).select(
        F.explode(word_shingles(F.col("toks"), k=5)).alias("g")
    )
    te = toked.filter(F.col("bucket") >= _VAL_LT).select(
        "doc_id",
        "lang",
        F.explode(word_shingles(F.col("toks"), k=5)).alias("g"),
    )
    # in production bloom_bits(tr) is PERSISTED when the train set is
    # built (SCALE.md round-5b measurement); here it is inline so the
    # whole pipeline is one declared plan
    return (
        bloom_screen(te, bloom_bits(tr))
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_grams"),
            F.count_if(F.col("bloom_hit")).alias("n_flagged"),
        )
    )


@register(
    "p15_weighted_sample",
    "B8",
    f"""
    WITH u AS (
      SELECT doc_id, lang, n_chars,
             {_hexint_sql("md5(CAST(doc_id AS VARCHAR) || ':ws1')", 1, 13)} AS ux
      FROM documents
    )
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
    FROM u
    WHERE ux * 600 < least(n_chars, 600) * 4503599627370496
    """,
    note="length-WEIGHTED deterministic Bernoulli sample: p(doc) = "
    "min(1, n_chars/600), accepted iff md5-derived 52-bit uniform < p — "
    "declared as the INTEGER comparison ux*600 < least(n_chars,600)*2^52, "
    "so both engines decide every row identically (no float boundary; "
    "the least() clamp IS the min(1, .) of the declared p and bounds the "
    "product at 600*2^52 — without it n_chars >= 2048 overflows int64, "
    "which Spark wraps silently and DuckDB raises on (ADVICE r5); contrast "
    "rate-based B8, which is TOL by nature). Pure map-only pass, "
    "embarrassingly parallel, and STABLE: membership depends only on "
    "(doc_id, seed tag), so re-runs/repartitions/incremental loads never "
    "change the sample — the quality-weighted mix-building primitive.",
)
def p15_weighted_sample(spark, sf_dir):
    d = t(spark, "documents", sf_dir)
    ux = _hexint_col(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":ws1"))), 1, 13
    )
    return d.select(
        "doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars"), ux.alias("ux")
    ).filter(
        F.col("ux") * 600
        < F.least(F.col("n_chars"), F.lit(600)) * F.lit(4503599627370496)
    ).drop("ux")


@register(
    "p16_dataset_card",
    "I15",
    f"""
    WITH per_doc AS (
      SELECT source, lang, n_chars,
             len(string_split(lower(text), ' ')) AS n_toks
      FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM documents)
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(n_toks AS BIGINT)) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(CAST(n_chars AS {DEC})) AS DOUBLE) / COUNT(*), 6)
             AS avg_chars,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(tot.n), 6) AS corpus_share
    FROM per_doc CROSS JOIN tot
    GROUP BY source, lang
    """,
    note="dataset CARD / datasheet: per (source, lang) cell — doc count, "
    "token count, mean length, share of corpus — the summary table every "
    "training-data release ships. One partial-agg pass + a broadcast "
    "1-row total; output is |sources|x|langs| rows (bounded).",
)
def p16_dataset_card(spark, sf_dir):
    d = t(spark, "documents", sf_dir)
    tot = d.agg(F.count("*").alias("n"))
    per = d.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split(F.lower("text"), " ")).alias("n_toks"),
    )
    return (
        per.join(F.broadcast(tot))
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_toks").cast("bigint")).alias("n_tokens"),
            r6(F.sum(sdec("n_chars")).cast("double") / F.count("*")).alias(
                "avg_chars"
            ),
            r6(F.count("*").cast("double") / F.max("n")).alias("corpus_share"),
        )
    )


@register(
    "p17_decontaminated_mix",
    "I17",
    f"""
    WITH base AS (
      SELECT doc_id, source, text, {_bucket_sql("doc_id")} AS bucket,
             {_DUCK_GRAMS5} AS grams, md5(text) AS h
      FROM documents
    ),
    ev_g AS (SELECT DISTINCT unnest(grams) AS g FROM base
             WHERE bucket >= {_TRAIN_LT}),
    contaminated AS (
      SELECT DISTINCT t.doc_id
      FROM (SELECT doc_id, unnest(grams) AS g FROM base
            WHERE bucket < {_TRAIN_LT}) t
      JOIN ev_g ON t.g = ev_g.g
    ),
    clean AS (
      SELECT * FROM (
        SELECT doc_id, source,
               len(string_split(lower(text), ' ')) AS n_tok,
               ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        FROM base
        WHERE bucket < {_TRAIN_LT}
          AND doc_id NOT IN (SELECT doc_id FROM contaminated)
      ) WHERE rn = 1
    ),
    s AS (
      SELECT source, COUNT(*) AS n, SUM(n_tok) AS toks,
             CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS fs
      FROM clean GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           CAST(toks AS BIGINT) AS n_tokens,
           ROUND(CAST(fs AS DOUBLE) / SUM(fs) OVER (), 6) AS mix_weight
    FROM s
    """,
    note="end-to-end DECONTAMINATED training mix — the round-5b tier "
    "composed in one plan: hash split (p3) -> bloom pre-screen of train "
    "grams against the heldout bit table (p14 shape; engine-side only — "
    "the bloom is a routing optimization with no false negatives, so "
    "the oracle's direct exact join defines the same answer) -> exact "
    "gram-join confirm on the flagged subset (p7) -> exact dedup of "
    "survivors by digest (i1) -> sqrt-damped per-source mixture weights "
    "(p8). Since round 8 the screen covers ALL heldout buckets (val AND "
    "test, bucket >= TRAIN_LT) — the earlier test-only screen left the "
    "val split fully leaked into the 'decontaminated' mix, inflating "
    "val metrics with memorized overlap. At 100 TB the bloom keeps the "
    "exact join's left side to the flagged fraction, and every stage "
    "shuffles digests/positions/grams, never documents.",
)
def p17_decontaminated_mix(spark, sf_dir):
    from pyspark.sql import Window as W

    from s3_kinesis_replay_spark.operators.bloom import bloom_bits, bloom_screen
    from s3_kinesis_replay_spark.operators.dedup import word_shingles

    d = t(spark, "documents", sf_dir)
    # spread_scan (r17, guide §2.5): same as p14 — the gram explodes,
    # the heldout-shingle checkpoint job, and the bloom bit-table build
    # otherwise all run at the single-file scan's parallelism.
    from s3_kinesis_replay_spark.operators.partitioning import spread_scan

    toked = spread_scan(
        d.select(
            "doc_id", "source", "text", _bucket_col("doc_id"),
            F.split(F.lower(F.col("text")), " ").alias("toks"),
        ),
        "doc_id",
    )
    ev_g = (
        toked.filter(F.col("bucket") >= _TRAIN_LT)
        .select(F.explode(word_shingles(F.col("toks"), k=5)).alias("g"))
        .distinct()
        # materialized once: the bloom build AND the exact-confirm join
        # both consume this relation — without it the heldout shingle
        # pipeline executes per consumer (review r8)
        .localCheckpoint(eager=True)
    )
    tr_g = toked.filter(F.col("bucket") < _TRAIN_LT).select(
        "doc_id", F.explode(word_shingles(F.col("toks"), k=5)).alias("g")
    )
    # bloom pre-screen routes only flagged gram rows into the exact join
    flagged = bloom_screen(tr_g, bloom_bits(ev_g)).filter(F.col("bloom_hit"))
    contaminated = (
        flagged.join(ev_g, "g", "left_semi").select("doc_id").distinct()
    )
    train = toked.filter(F.col("bucket") < _TRAIN_LT).select(
        "doc_id", "source",
        F.size("toks").alias("n_tok"),
        F.md5("text").alias("h"),
    )
    clean = (
        train.join(contaminated, "doc_id", "left_anti")
        .withColumn(
            "rn", F.row_number().over(W.partitionBy("h").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
    )
    s = clean.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_tok").cast("bigint")).alias("n_tokens"),
        F.floor(F.sqrt(F.count("*"))).cast("bigint").alias("fs"),
    )
    return s.select(
        "source",
        "n_docs",
        "n_tokens",
        r6(F.col("fs").cast("double") / F.sum("fs").over(W.partitionBy())).alias(
            "mix_weight"
        ),
    )
