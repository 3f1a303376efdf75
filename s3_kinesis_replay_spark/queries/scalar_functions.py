"""Scalar function families (SURVEY §2.G) — one declared query per family.

All expressions are JVM-side built-ins (whole-stage codegen; no Python in
the row path). Cross-engine semantics pinned per SURVEY §2.G notes:

* DuckDB lacks ``initcap`` → oracle emulates with upper/lower+substr on a
  single-word column.
* ``dayofweek``: Spark is 1=Sunday..7, DuckDB 0=Sunday..6 → declared as
  Spark-1.
* ``pmod`` on positive keys ≡ ``%`` in DuckDB.
* libm-backed math (sqrt/exp/ln/pow) rounded to 6 dp — last-ulp libm
  differences vanish under rounding.
* regexp_replace is global in Spark → DuckDB needs the ``'g'`` flag.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_kinesis_replay_spark.registry import register
from s3_kinesis_replay_spark.queries.helpers import r6, t


@register(
    "g1_string_basic",
    "G1",
    """
    SELECT p_partkey,
           lower(p_name) AS lo, upper(p_name) AS up,
           trim('  ' || p_name || ' ') AS trimmed,
           ltrim('xx' || p_name, 'x') AS l_trimmed,
           rtrim(p_name || 'yy', 'y') AS r_trimmed,
           CAST(length(p_name) AS INTEGER) AS name_len,
           substr(p_name, 2, 4) AS sub,
           concat(p_brand, ':', p_type) AS cat,
           concat_ws('|', p_brand, p_type, p_name) AS cat_ws,
           lpad(p_brand, 12, '*') AS padded_l,
           rpad(p_brand, 12, '*') AS padded_r,
           reverse(p_name) AS rev,
           concat(upper(substr(p_type, 1, 1)), lower(substr(p_type, 2))) AS icap,
           CAST(instr(p_name, 'a') AS BIGINT) AS a_pos,
           replace(p_name, ' ', '_') AS replaced
    FROM part
    """,
)
def g1_string_basic(spark, sf_dir):
    p = t(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lo"),
        F.upper("p_name").alias("up"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.ltrim(F.concat(F.lit("xx"), F.col("p_name")), F.lit("x")).alias("l_trimmed"),
        F.rtrim(F.concat(F.col("p_name"), F.lit("yy")), F.lit("y")).alias("r_trimmed"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_name", 2, 4).alias("sub"),
        F.concat("p_brand", F.lit(":"), "p_type").alias("cat"),
        F.concat_ws("|", "p_brand", "p_type", "p_name").alias("cat_ws"),
        F.lpad("p_brand", 12, "*").alias("padded_l"),
        F.rpad("p_brand", 12, "*").alias("padded_r"),
        F.reverse("p_name").alias("rev"),
        F.initcap("p_type").alias("icap"),
        F.instr("p_name", "a").cast("bigint").alias("a_pos"),
        F.replace("p_name", F.lit(" "), F.lit("_")).alias("replaced"),
    )


@register(
    "g2_string_regex",
    "G2",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           string_split(text, ' ')[1] AS first_token,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
           regexp_replace(substr(text, 1, 40), '[aeiou]', '', 'g') AS devoweled,
           translate(substr(text, 1, 20), 'aeiou', 'AEIOU') AS swapped,
           regexp_matches(text, 'join.*filter|filter.*join') AS has_both
    FROM documents
    """,
    note="REF: message sanitization = regex replacement over payloads",
)
def g2_string_regex(spark, sf_dir):
    d = t(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("int").alias("n_tokens"),
        F.split("text", " ").getItem(0).alias("first_token"),
        F.regexp_extract("text", r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "").alias("devoweled"),
        F.translate(F.substring("text", 1, 20), "aeiou", "AEIOU").alias("swapped"),
        F.col("text").rlike("join.*filter|filter.*join").alias("has_both"),
    )


@register(
    "g3_string_distance",
    "G3",
    """
    SELECT a.doc_id,
           CAST(levenshtein(substr(a.text, 1, 30), substr(b.text, 1, 30)) AS INTEGER)
             AS lev_30,
           ROUND(CAST(len(list_intersect(list_distinct(string_split(a.text, ' ')),
                                         list_distinct(string_split(b.text, ' ')))) AS DOUBLE)
                 / len(list_distinct(string_split(a.text || ' ' || b.text, ' '))), 6)
             AS token_jaccard
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    """,
    note="token-set Jaccard via set HOFs (NS); levenshtein on bounded prefix",
)
def g3_string_distance(spark, sf_dir):
    d = t(spark, "documents", sf_dir)
    a = d.alias("a")
    b = d.alias("b")
    ta = F.array_distinct(F.split(F.col("a.text"), " "))
    tb = F.array_distinct(F.split(F.col("b.text"), " "))
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    union = F.size(F.array_union(ta, tb))
    return a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).select(
        F.col("a.doc_id").alias("doc_id"),
        F.levenshtein(
            F.substring(F.col("a.text"), 1, 30), F.substring(F.col("b.text"), 1, 30)
        )
        .cast("int")
        .alias("lev_30"),
        r6(inter / union).alias("token_jaccard"),
    )


@register(
    "g4_hashing",
    "G4",
    """
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256
    FROM customer
    """,
    note="partition-key hashing / dedup keys (REF+NS); md5 + sha256 cross-engine",
)
def g4_hashing(spark, sf_dir):
    return t(spark, "customer", sf_dir).select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
    )


@register(
    "g4b_spark_hashes",
    "G4",
    """
    SELECT CAST(COUNT(DISTINCT c_name) AS BIGINT) AS n_names,
           TRUE AS xx64_injective,
           TRUE AS murmur_card_ok,
           TRUE AS crc32_in_range,
           TRUE AS rescan_agree
    FROM customer
    """,
    note="flag-oracle form (VERDICT r7 item 2, d4b pattern): xxhash64 / "
    "murmur / crc32 values are Spark-specific, so the DECLARED hash "
    "invariants are hashed instead — Spark COMPUTES (a) xx64_injective: "
    "distinct xxhash64 count == distinct name count (collision odds "
    "n²/2⁶⁵, deterministic per fixture), (b) murmur_card_ok: 32-bit "
    "murmur keeps ≥ 99.9% of name cardinality (birthday-bound slack), "
    "(c) crc32_in_range: every crc32 in [0, 2³²), (d) rescan_agree: "
    "xxhash64 identical across two independent scans joined on the key "
    "(cross-task determinism — the property partitioning relies on). "
    "The oracle recomputes the name cardinality and hard-codes TRUE.",
)
def g4b_spark_hashes(spark, sf_dir):
    c = t(spark, "customer", sf_dir).select("c_custkey", "c_name")
    h1 = c.select(
        "c_custkey",
        "c_name",
        F.xxhash64("c_name").alias("xx"),
        F.hash("c_name").alias("mm"),
        F.crc32("c_name").alias("crc"),
    )
    h2 = c.select("c_custkey", F.xxhash64("c_name").alias("xx2"))
    return (
        h1.join(h2, "c_custkey")
        .agg(
            F.countDistinct("c_name").alias("n_names"),
            F.countDistinct("xx").alias("n_xx"),
            F.countDistinct("mm").alias("n_mm"),
            F.min("crc").alias("crc_min"),
            F.max("crc").alias("crc_max"),
            F.sum(F.when(F.col("xx") != F.col("xx2"), 1).otherwise(0)).alias(
                "n_disagree"
            ),
        )
        .select(
            "n_names",
            (F.col("n_xx") == F.col("n_names")).alias("xx64_injective"),
            (F.col("n_mm") >= 0.999 * F.col("n_names")).alias(
                "murmur_card_ok"
            ),
            (
                (F.col("crc_min") >= 0) & (F.col("crc_max") < F.lit(2**32))
            ).alias("crc32_in_range"),
            (F.col("n_disagree") == 0).alias("rescan_agree"),
        )
    )


@register(
    "g5_datetime",
    "G5",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(day(o_orderdate) AS INTEGER) AS d,
           CAST(hour(o_orderdate) AS INTEGER) AS h,
           CAST(minute(o_orderdate) AS INTEGER) AS mi,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS DATE) + 5 AS plus5,
           CAST(o_orderdate AS DATE) - 3 AS minus3,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER)
             AS days_to_y2k,
           CAST(o_orderdate AS DATE) AS od,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_s,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS fmt,
           make_date(2024, CAST(month(o_orderdate) AS INTEGER), 1) AS mdate,
           last_day(CAST(o_orderdate AS DATE)) AS eom,
           CAST(dayofweek(o_orderdate) AS INTEGER) AS dow
    FROM orders
    """,
    note="dow declared as 0=Sunday (Spark dayofweek-1 == DuckDB dayofweek)",
)
def g5_datetime(spark, sf_dir):
    o = t(spark, "orders", sf_dir)
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).cast("int").alias("y"),
        F.month(od).cast("int").alias("m"),
        F.dayofmonth(od).cast("int").alias("d"),
        F.hour(od).cast("int").alias("h"),
        F.minute(od).cast("int").alias("mi"),
        F.date_trunc("month", od).alias("month_start"),
        F.date_add(F.to_date(od), 5).alias("plus5"),
        F.date_sub(F.to_date(od), 3).alias("minus3"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.to_date(od))
        .cast("int")
        .alias("days_to_y2k"),
        F.to_date(od).alias("od"),
        F.unix_timestamp(od).alias("unix_s"),
        F.date_format(od, "yyyy-MM-dd HH:mm:ss").alias("fmt"),
        F.make_date(F.lit(2024), F.month(od), F.lit(1)).alias("mdate"),
        F.last_day(F.to_date(od)).alias("eom"),
        (F.dayofweek(od) - 1).cast("int").alias("dow"),
    )


@register(
    "g6_math",
    "G6",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(abs(l_quantity - 25.0), 6) AS abs_dev,
           ROUND(l_extendedprice, 2) AS price_r2,
           ROUND(round_even(l_quantity / 7.0, 1), 6) AS qty_re,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           ROUND(sqrt(l_extendedprice), 6) AS price_sqrt,
           ROUND(exp(l_discount), 6) AS disc_exp,
           ROUND(ln(l_extendedprice), 6) AS price_ln,
           ROUND(log10(l_extendedprice), 6) AS price_log10,
           ROUND(pow(l_discount, 2), 6) AS disc_sq,
           CAST(sign(l_quantity - 25.0) AS DOUBLE) AS dev_sign,
           greatest(l_quantity, l_discount * 100, 10.0) AS g3,
           least(l_quantity, l_discount * 100, 10.0) AS l3,
           CAST(l_orderkey % 7 AS BIGINT) AS key_pmod,
           CAST(l_linenumber % 3 AS INTEGER) AS line_mod
    FROM lineitem
    """,
)
def g6_math(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r6(F.abs(F.col("l_quantity") - 25.0)).alias("abs_dev"),
        F.round("l_extendedprice", 2).alias("price_r2"),
        r6(F.bround(F.col("l_quantity") / 7.0, 1)).alias("qty_re"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil(F.col("l_discount") * 100).cast("bigint").alias("disc_pct_ceil"),
        r6(F.sqrt("l_extendedprice")).alias("price_sqrt"),
        r6(F.exp("l_discount")).alias("disc_exp"),
        r6(F.log("l_extendedprice")).alias("price_ln"),
        r6(F.log10("l_extendedprice")).alias("price_log10"),
        r6(F.pow("l_discount", F.lit(2))).alias("disc_sq"),
        F.signum(F.col("l_quantity") - 25.0).alias("dev_sign"),
        F.greatest("l_quantity", F.col("l_discount") * 100, F.lit(10.0)).alias("g3"),
        F.least("l_quantity", F.col("l_discount") * 100, F.lit(10.0)).alias("l3"),
        F.pmod("l_orderkey", F.lit(7)).cast("bigint").alias("key_pmod"),
        (F.col("l_linenumber") % 3).cast("int").alias("line_mod"),
    )


@register(
    "g7_array_hof",
    "G7",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(len(seq) AS INTEGER) AS seq_len,
           list_contains(seq, 3) AS has3,
           seq[1] AS first_el,
           COALESCE(array_to_string(seq[1:2], ','), '') AS first_two,
           COALESCE(array_to_string(list_sort(seq, 'DESC'), ','), '') AS sorted_desc,
           list_min(seq) AS mn, list_max(seq) AS mx,
           COALESCE(array_to_string(flatten([seq, [100, 200]]), ','), '') AS flat,
           COALESCE(array_to_string(list_transform(seq, x -> x * x), ','), '')
             AS squares,
           COALESCE(array_to_string(list_filter(seq, x -> x % 2 = 0), ','), '')
             AS evens,
           len(list_filter(seq, x -> x > 5)) > 0 AS any_gt5,
           CAST(list_sum(seq) AS BIGINT) AS total,
           COALESCE(array_to_string(list_transform(seq, x -> x * 2), ','), '')
             AS doubled,
           COALESCE(array_to_string(
             list_sort(list_distinct(list_intersect(seq, [2, 3, 4]))), ','), '')
             AS inter234,
           CAST(list_position(seq, 2) AS INTEGER) AS pos2
    FROM (SELECT l_orderkey, l_linenumber,
                 range(CAST(1 AS BIGINT), CAST(l_linenumber AS BIGINT) + 1) AS seq
          FROM lineitem)
    """,
    note="zip_with(seq,seq,+) declared via its pointwise equivalent x*2; "
    "higher-order functions run in codegen, not Python; array results are "
    "emitted as ','-joined strings (driver canonicalizer cannot hash lists)",
)
def g7_array_hof(spark, sf_dir):
    def sj(col):  # deterministic array → joined string, order preserved
        return F.array_join(col.cast("array<string>"), ",")

    li = t(spark, "lineitem", sf_dir).withColumn(
        "seq", F.sequence(F.lit(1).cast("bigint"), F.col("l_linenumber").cast("bigint"))
    )
    seq = F.col("seq")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.size(seq).cast("int").alias("seq_len"),
        F.array_contains(seq, F.lit(3).cast("bigint")).alias("has3"),
        F.element_at(seq, 1).alias("first_el"),
        sj(F.slice(seq, 1, 2)).alias("first_two"),
        sj(F.sort_array(seq, asc=False)).alias("sorted_desc"),
        F.array_min(seq).alias("mn"),
        F.array_max(seq).alias("mx"),
        sj(
            F.flatten(
                F.array(
                    seq, F.array(F.lit(100).cast("bigint"), F.lit(200).cast("bigint"))
                )
            )
        ).alias("flat"),
        sj(F.transform(seq, lambda x: x * x)).alias("squares"),
        sj(F.filter(seq, lambda x: x % 2 == 0)).alias("evens"),
        F.exists(seq, lambda x: x > 5).alias("any_gt5"),
        F.aggregate(seq, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("total"),
        sj(F.zip_with(seq, seq, lambda a, b: a + b)).alias("doubled"),
        sj(
            F.sort_array(
                F.array_intersect(
                    seq, F.array(*[F.lit(i).cast("bigint") for i in (2, 3, 4)])
                )
            )
        ).alias("inter234"),
        F.array_position(seq, F.lit(2).cast("bigint")).cast("int").alias("pos2"),
    )


@register(
    "g8_map",
    "G8",
    """
    SELECT event_id,
           map_extract(map(['k', 'type'],
                           [CAST(json_extract_string(props, '$.k') AS VARCHAR),
                            event_type]), 'k')[1] AS k_val,
           COALESCE(array_to_string(
             list_sort(map_keys(map(['k', 'type'], ['a', 'b']))), ','), '') AS mkeys,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
    FROM events
    """,
    note="maps canonicalized to scalars/sorted key arrays (SURVEY §2 exclusions: "
    "raw map hashing is engine-unstable)",
)
def g8_map(spark, sf_dir):
    ev = t(spark, "events", sf_dir)
    m = F.create_map(
        F.lit("k"),
        F.get_json_object("props", "$.k"),
        F.lit("type"),
        F.col("event_type"),
    )
    m2 = F.create_map(F.lit("k"), F.lit("a"), F.lit("type"), F.lit("b"))
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.array_join(F.sort_array(F.map_keys(m2)), ",").alias("mkeys"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
    )


@register(
    "g9_explode_lateral",
    "G9",
    """
    SELECT l_orderkey, l_linenumber,
           unnest(range(CAST(1 AS BIGINT), CAST(l_linenumber AS BIGINT) + 1)) AS v,
           CAST(generate_subscripts(range(CAST(1 AS BIGINT),
                CAST(l_linenumber AS BIGINT) + 1), 1) AS INTEGER) - 1 AS pos
    FROM lineitem
    WHERE l_linenumber <= 3
    """,
    note="posexplode: Spark pos is 0-based, generate_subscripts 1-based → -1",
)
def g9_explode_lateral(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir).filter(F.col("l_linenumber") <= 3)
    seq = F.sequence(F.lit(1).cast("bigint"), F.col("l_linenumber").cast("bigint"))
    return li.select(
        "l_orderkey", "l_linenumber", F.posexplode(seq).alias("pos", "v")
    ).select("l_orderkey", "l_linenumber", "v", F.col("pos").cast("int").alias("pos"))


@register(
    "g9b_stack",
    "G9",
    """
    SELECT o_orderkey, 'price' AS metric, o_totalprice AS val FROM orders
    UNION ALL
    SELECT o_orderkey, 'key100' AS metric, CAST(o_custkey * 100 AS DOUBLE) AS val
    FROM orders
    """,
    note="stack/unpivot: wide→long; oracle is the UNION ALL definition",
)
def g9b_stack(spark, sf_dir):
    o = t(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.expr(
            "stack(2, 'price', o_totalprice, 'key100', "
            "CAST(o_custkey * 100 AS DOUBLE)) AS (metric, val)"
        ),
    )


@register(
    "g10_json",
    "G10",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           json_extract_string(props, '$.missing') AS missing,
           CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k2
    FROM events
    """,
    note="REF: partition-key extraction from JSON payloads (JMESPath → JSONPath)",
)
def g10_json(spark, sf_dir):
    from pyspark.sql.types import IntegerType, StructField, StructType

    ev = t(spark, "events", sf_dir)
    schema = StructType([StructField("k", IntegerType())])
    parsed = F.from_json("props", schema)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.get_json_object("props", "$.missing").alias("missing"),
        (parsed.getField("k") * 2).alias("k2"),
    )


@register(
    "g11_struct",
    "G11",
    """
    SELECT o_orderkey,
           struct_pack(key := o_orderkey, price := o_totalprice).price AS s_price,
           struct_pack(a := o_orderstatus, b := o_orderpriority).a AS s_status
    FROM orders
    """,
    note="struct build + field access + nested pruning; output flattened scalars",
)
def g11_struct(spark, sf_dir):
    o = t(spark, "orders", sf_dir)
    s1 = F.struct(F.col("o_orderkey").alias("key"), F.col("o_totalprice").alias("price"))
    s2 = F.struct(F.col("o_orderstatus").alias("a"), F.col("o_orderpriority").alias("b"))
    return o.select(
        "o_orderkey",
        s1.getField("price").alias("s_price"),
        s2.getField("a").alias("s_status"),
    )


@register(
    "g10b_variant",
    "G10",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_variant,
           CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
           (json_extract(props, '$.nope') IS NULL) AS missing_is_null
    FROM events
    """,
    note="Spark 4 VARIANT path for truly-dynamic payloads: parse_json once, "
    "variant_get per field — the schemaless alternative to from_json "
    "(SURVEY §1.2); oracle uses DuckDB's JSON extraction",
)
def g10b_variant(spark, sf_dir):
    ev = t(spark, "events", sf_dir).select(
        "event_id", F.parse_json("props").alias("v")
    )
    return ev.select(
        "event_id",
        F.variant_get("v", "$.k", "int").alias("k_variant"),
        F.variant_get("v", "$.k", "string").alias("k_str"),
        F.try_variant_get("v", "$.nope", "string").isNull().alias("missing_is_null"),
    )


@register(
    "g6b_bitwise",
    "G6",
    """
    SELECT event_type,
           CAST(bit_and(user_id) AS BIGINT) AS all_and,
           CAST(bit_or(user_id) AS BIGINT) AS any_or,
           CAST(bit_xor(user_id) AS BIGINT) AS parity_xor,
           CAST(SUM(bit_count(user_id)) AS BIGINT) AS popcount_sum,
           CAST(SUM((user_id << 2) | (user_id >> 3)) AS BIGINT) AS shifted_sum
    FROM events GROUP BY event_type
    """,
    note="bitwise scalar + aggregate family (bitmap/bitmask analytics): "
    "AND/OR/XOR reductions, popcount, shifts. All pure codegen partial "
    "aggregates — map-side combine, no special scale concerns.",
)
def g6b_bitwise(spark, sf_dir):
    e = t(spark, "events", sf_dir)
    return e.groupBy("event_type").agg(
        F.bit_and("user_id").alias("all_and"),
        F.bit_or("user_id").alias("any_or"),
        F.bit_xor("user_id").alias("parity_xor"),
        F.sum(F.bit_count("user_id")).cast("bigint").alias("popcount_sum"),
        F.sum(
            F.shiftleft(F.col("user_id"), 2).bitwiseOR(
                F.shiftright(F.col("user_id"), 3)
            )
        ).alias("shifted_sum"),
    )
