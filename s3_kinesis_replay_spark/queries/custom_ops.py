"""Custom-operator queries: as-of join (C8), SimHash, char-n-gram Jaccard.

These exercise operators/ — compositions Spark lacks natively.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_kinesis_replay_spark.registry import register
from s3_kinesis_replay_spark.queries.helpers import r6, t


@register(
    "c8_asof_join",
    "C8",
    """
    SELECT p.event_id, p.user_id, p.ts, v.event_id AS view_event_id, v.value AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON v.event_id = (
        SELECT v2.event_id
        FROM events v2
        WHERE v2.event_type = 'view' AND v2.user_id = p.user_id AND v2.ts <= p.ts
        ORDER BY v2.ts DESC, v2.event_id DESC LIMIT 1
      )
    """,
    note="backward as-of: latest preceding 'view' per user for each "
    "'purchase'; engine = union-tag + window (operators/asof.py); "
    "tiebreak pinned to event_id DESC",
)
def c8_asof_join(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.asof import asof_join

    ev = t(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("value").alias("view_value"),
    )
    return asof_join(
        purchases,
        views,
        on="ts",
        right_on="v_ts",
        by_left="user_id",
        by_right="v_user",
        value_cols=["view_event_id", "view_value"],
        tiebreak="view_event_id",
    )


# i3b oracle: the IDENTICAL simhash computation in DuckDB SQL — md5 token
# hash split into 32-bit halves, per-bit majority vote, exact-integer
# two's-complement assembly. Mirrors operators/dedup.py:simhash bit for bit.
_SIMHASH_VOTES_SQL = ",\n".join(
    f"SUM(CASE WHEN (({'hlo' if i < 32 else 'hhi'} >> {i % 32}) & 1) = 1 "
    f"THEN 1 ELSE -1 END) AS b{i}"
    for i in range(64)
)
_SIMHASH_LO_SQL = " + ".join(
    f"CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
    for i in range(32)
)
_SIMHASH_HI_SQL = " + ".join(
    f"CASE WHEN b{i + 32} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
    for i in range(32)
)


@register(
    "i3b_simhash",
    "I3",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), h AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) AS hhi,
             CAST('0x' || substr(md5(w), 9, 8) AS BIGINT) AS hlo
      FROM tok
    ), votes AS (
      SELECT doc_id, {_SIMHASH_VOTES_SQL}
      FROM h GROUP BY doc_id
    ), parts AS (
      SELECT doc_id, ({_SIMHASH_LO_SQL}) AS lo_part, ({_SIMHASH_HI_SQL}) AS hi_part
      FROM votes
    )
    SELECT doc_id,
           CAST((hi_part - CASE WHEN hi_part >= 2147483648
                                THEN 4294967296 ELSE 0 END) * 4294967296
                + lo_part AS BIGINT) AS simhash
    FROM parts
    """,
    note="64-bit SimHash per doc; near-dup = small Hamming distance. "
    "md5-based bit derivation (round 5) so Spark and DuckDB compute the "
    "IDENTICAL signature — cross-engine hash oracle; planted near-dup "
    "pairs (i3) still have distance ≤ 8 (local test)",
)
def i3b_simhash(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.dedup import simhash

    return simhash(t(spark, "documents", sf_dir))


@register(
    "i3c_char_ngram_jaccard",
    "I3",
    """
    WITH g AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, length(text) - 1),
               i -> substr(text, i, 3))) AS grams
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS char_jacc
    FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
    """,
)
def i3c_char_ngram_jaccard(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(t(spark, "documents", sf_dir), n=3)


# ---------------------------------------------------------------- text ops

# GENERATED from the one marker/stopword definition in operators/text.py
# (review r8: hand-copied lists can silently drop entries — the t2 SQL
# list was missing 'der' — so the SQL literals derive from the source)
from s3_kinesis_replay_spark.operators.text import (  # noqa: E402
    LANG_MARKERS as _LM,
    STOPWORDS as _SW,
)

_MARKER_SQL = {
    lang: "[" + ",".join(f"'{w}'" for w in ws) + "]"
    for lang, ws in _LM.items()
}
_SQL_STOPLIST = "[" + ",".join(f"'{w}'" for w in _SW) + "]"
_SCORES_SQL = ",\n".join(
    f"CAST(len(list_intersect(list_distinct(string_split(lower(text),' ')), "
    f"{arr})) AS INTEGER) AS score_{lang}"
    for lang, arr in _MARKER_SQL.items()
)


@register(
    "t1_language_id",
    "I9",
    f"""
    SELECT doc_id, lang, {_SCORES_SQL},
           CASE WHEN score_en >= score_de AND score_en >= score_es
                 AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
                WHEN score_de >= score_es AND score_de >= score_fr
                 AND score_de >= score_zh THEN 'de'
                WHEN score_es >= score_fr AND score_es >= score_zh THEN 'es'
                WHEN score_fr >= score_zh THEN 'fr'
                ELSE 'zh' END AS predicted_lang
    FROM (SELECT doc_id, lang, text, {_SCORES_SQL} FROM documents)
    """,
    note="n-gram-marker language ID; argmax = first-max-wins in declared order",
)
def t1_language_id(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.text import LANG_MARKERS, language_scores

    d = t(spark, "documents", sf_dir)
    scored = d.select("doc_id", "lang", *language_scores(F.col("text")))
    score_cols = [F.col(f"score_{lang}").cast("int").alias(f"score_{lang}") for lang in LANG_MARKERS]
    arr = F.array(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    langs = F.array(*[F.lit(lang) for lang in LANG_MARKERS])
    best = F.element_at(langs, F.array_position(arr, F.array_max(arr)).cast("int"))
    return scored.select("doc_id", "lang", *score_cols, best.alias("predicted_lang"))


@register(
    "t2_quality_score",
    "I9",
    f"""
    SELECT doc_id,
           CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS n_tokens,
           ROUND(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS avg_token_len,
           ROUND(CAST(len(list_filter(string_split(lower(text), ' '),
                 w -> list_contains({_SQL_STOPLIST}, w))) AS DOUBLE)
                 / len(string_split(lower(text), ' ')), 6) AS stopword_ratio,
           (length(text) = n_chars) AS len_matches_meta
    FROM documents
    """,
    note="quality features: length / stopword-ratio heuristics; the SQL "
    "stopword list is GENERATED from operators/text.STOPWORDS (review "
    "r8: a hand-copied list had silently dropped 'der', so the engines "
    "counted different stopword sets for any doc containing it)",
)
def t2_quality_score(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.text import quality_features

    d = t(spark, "documents", sf_dir)
    feats = quality_features(F.col("text"), F.col("n_chars"))
    return d.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["avg_token_len"].alias("avg_token_len"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["len_matches_meta"].alias("len_matches_meta"),
    )


@register(
    "t3_fingerprint",
    "I9",
    """
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(1000000007 AS BIGINT),
               list_transform(range(1, length(text) + 1),
                              i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
             (acc, c) -> ((acc % 1000000007) + c * (acc // 1000000007)) % 1000000007
                         + ((acc // 1000000007) * 257 % 1000000007) * 1000000007
           ) % 1000000007 AS fingerprint
    FROM documents
    """,
    note="polynomial rolling hash; oracle packs (h, base^i) into one BIGINT "
    "(h + p*M) to fold with a scalar accumulator — arithmetic identical",
)
def t3_fingerprint(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.text import rolling_fingerprint

    d = t(spark, "documents", sf_dir)
    return d.select("doc_id", rolling_fingerprint(F.col("text")).alias("fingerprint"))


@register(
    "t5_repetition_filter",
    "I9",
    """
    SELECT doc_id,
           CAST(CASE WHEN len(toks) >= 2 THEN len(toks) - 1 ELSE 0 END
                AS INTEGER) AS n_bigrams,
           CAST(len(list_distinct(bigrams)) AS INTEGER) AS n_distinct_bigrams,
           CASE WHEN len(toks) >= 2
                THEN ROUND(CAST(len(bigrams) - len(list_distinct(bigrams))
                                AS DOUBLE) / len(bigrams), 6)
           END AS rep_ratio
    FROM (
      SELECT doc_id, toks,
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
            FROM documents)
    )
    """,
    note="Gopher-style repetition filter: duplicate word-2-gram fraction "
    "per doc (templated/spammy docs score high). Split-once codegen "
    "projection — map-only at 100 TB, fused into the scan stage",
)
def t5_repetition_filter(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.text import bigram_repetition

    d = t(spark, "documents", sf_dir).select("doc_id", "text")
    return bigram_repetition(d).select(
        "doc_id", "n_bigrams", "n_distinct_bigrams", "rep_ratio"
    )


# The fixture corpus carries no real PII, so the declared query plants a
# deterministic email + numeric id per row (same expression in both
# engines) and then redacts — the assertion is that the masking pipeline
# finds and rewrites exactly what it should.
_PII_SUFFIX_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com ref ' || CAST(doc_id * 7919 + 100000 AS VARCHAR)"
)


@register(
    "t6_pii_redact",
    "I9",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(pii_text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))
                AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(
                regexp_replace(pii_text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                  '<EMAIL>', 'g'),
                '[0-9]{{6,}}')) AS INTEGER) AS n_long_digit_runs,
           regexp_replace(
             regexp_replace(pii_text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
               '<EMAIL>', 'g'),
             '[0-9]{{6,}}', '<NUM>', 'g') AS masked_text
    FROM (SELECT doc_id, {_PII_SUFFIX_SQL} AS pii_text FROM documents)
    """,
    note="PII scrub: mask emails + long digit runs, count hits (quarantine "
    "signal). Patterns avoid lookarounds/backrefs so Java regex (Spark) "
    "and RE2 (DuckDB) agree. Map-only codegen pass at scale",
)
def t6_pii_redact(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.text import pii_redact

    d = t(spark, "documents", sf_dir)
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ref "),
        (F.col("doc_id") * 7919 + 100000).cast("string"),
    )
    feats = pii_redact(pii_text)
    return d.select(
        "doc_id",
        feats["n_emails"].alias("n_emails"),
        feats["n_long_digit_runs"].alias("n_long_digit_runs"),
        feats["masked_text"].alias("masked_text"),
    )


@register(
    "t7_rare_word_ratio",
    "I9",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    freq AS (SELECT w, COUNT(*) AS f FROM tok GROUP BY w)
    SELECT tok.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           CAST(count_if(freq.f < 5) AS BIGINT) AS n_rare,
           ROUND(CAST(count_if(freq.f < 5) AS DOUBLE) / COUNT(*), 6)
               AS rare_ratio
    FROM tok JOIN freq ON tok.w = freq.w
    GROUP BY tok.doc_id
    """,
    note="CCNet-style rare/OOV-token quality signal: fraction of a doc's "
    "tokens whose corpus frequency < 5. Integer counting + one division "
    "— cross-engine exact, no float accumulation. Scale: the broadcast "
    "of the vocabulary-sized frequency table is FORCED (and the plan "
    "test pins BroadcastHashJoin) — correct while the vocab fits "
    "executor memory (Zipf-bounded for natural text); for a noisy "
    "100 TB-web-scale vocab, REMOVE the F.broadcast hint so AQE picks "
    "the shuffled token equi-join over fixed-width (word, count) rows",
)
def t7_rare_word_ratio(spark, sf_dir):
    d = t(spark, "documents", sf_dir)
    tok = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    return (
        tok.join(F.broadcast(freq), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.count_if(F.col("f") < 5).alias("n_rare"),
        )
        .select(
            "doc_id",
            "n_tok",
            "n_rare",
            F.round(F.col("n_rare").cast("double") / F.col("n_tok"), 6).alias(
                "rare_ratio"
            ),
        )
    )


@register(
    "t4_token_counts",
    "I9",
    r"""
    SELECT doc_id,
           CAST(len(str_split_regex(trim(text), '\s+')) AS INTEGER)
               AS n_tokens_ws,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[^a-z\s]+'))
               AS INTEGER) AS n_tokens_bpe
    FROM documents
    """,
    note="whitespace + BPE-ish token counts; tokenizer is match-based "
    "([a-z]+|[^a-z\\s]+ runs) so the IDENTICAL regex runs under Java "
    "regex and RE2 — cross-engine hash oracle since round 5",
)
def t4_token_counts(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.text import bpe_ish_token_count, token_count

    d = t(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens_ws"),
        bpe_ish_token_count(F.col("text")).alias("n_tokens_bpe"),
    )


# ---------------------------------------------------------------- multimodal


@register(
    "mm1_media_features",
    "I9",
    """
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           CAST(5 + strlen(text) AS BIGINT) AS n_bytes,
           sha256('FAKE0' || text) AS sha256
    FROM documents
    """,
    note="binary media columns + mapInPandas feature extraction (decode "
    "stubbed per driver instruction); oracle checks the Arrow round trip "
    "via blob length + sha256. strlen (BYTES), not length (CHARACTERS) "
    "— the Spark side measures the UTF-8-encoded blob, so non-ASCII "
    "text would diverge under length() (review r8; sha256 already "
    "hashes the UTF-8 bytes in both engines)",
)
def mm1_media_features(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.multimodal import (
        extract_features,
        synth_media_table,
    )

    media = synth_media_table(spark, t(spark, "documents", sf_dir))
    return extract_features(media).select("media_id", "kind", "n_bytes", "sha256")


@register(
    "mm2_frame_sample",
    "I9",
    """
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           unnest(range(0, greatest(n_chars * 10 // 1000, 1))) * 1000
             AS frame_ms
    FROM documents
    """,
)
def mm2_frame_sample(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.multimodal import (
        frame_sample,
        synth_media_table,
    )

    media = synth_media_table(spark, t(spark, "documents", sf_dir))
    return frame_sample(media)


@register(
    "c8b_asof_forward",
    "C8",
    """
    SELECT p.event_id, p.user_id, p.ts, v.event_id AS next_view_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON v.event_id = (
        SELECT v2.event_id
        FROM events v2
        WHERE v2.event_type = 'view' AND v2.user_id = p.user_id AND v2.ts >= p.ts
        ORDER BY v2.ts ASC, v2.event_id ASC LIMIT 1
      )
    """,
    note="forward as-of: earliest following 'view' per user for each "
    "'purchase'; same one-shuffle window pass with mirrored sort order",
)
def c8b_asof_forward(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.asof import asof_join

    ev = t(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("next_view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    return asof_join(
        purchases,
        views,
        on="ts",
        right_on="v_ts",
        by_left="user_id",
        by_right="v_user",
        value_cols=["next_view_id"],
        tiebreak="next_view_id",
        direction="forward",
    )


@register(
    "r1_sanitize_pipeline",
    "A7",
    """
    SELECT event_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(props, '"k": ?([0-9])[0-9]*', '"k": \\1**', 'g'),
               '[0-9]{3,}', '<NUM>', 'g'),
             'user_[a-z]+', 'user_<REDACTED>', 'g') AS sanitized,
           CAST(length(props) - length(regexp_replace(props, '[0-9]', '', 'g'))
                AS INTEGER) AS n_digits
    FROM events
    """,
    note="the reference's message-sanitization stage: an ordered chain of "
    "regex rewrites over payloads (mask keys, redact long numbers/user "
    "ids) — pure codegen, the same chain ReplayConfig.sanitize_rules "
    "applies inside the replay stream",
)
def r1_sanitize_pipeline(spark, sf_dir):
    ev = t(spark, "events", sf_dir)
    s = F.col("props")
    for pat, repl in [
        (r'"k": ?([0-9])[0-9]*', r'"k": $1**'),
        (r"[0-9]{3,}", "<NUM>"),
        (r"user_[a-z]+", "user_<REDACTED>"),
    ]:
        s = F.regexp_replace(s, pat, repl)
    n_digits = F.length("props") - F.length(F.regexp_replace("props", "[0-9]", ""))
    return ev.select(
        "event_id", s.alias("sanitized"), n_digits.cast("int").alias("n_digits")
    )


@register(
    "t8_normalized_dedup_key",
    "I9",
    """
    WITH n AS (
      SELECT doc_id, lang,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS norm_text
      FROM documents
    )
    SELECT doc_id, lang, md5(norm_text) AS norm_key,
           CAST(length(norm_text) AS BIGINT) AS norm_len,
           CAST(COUNT(*) OVER (PARTITION BY md5(norm_text)) AS BIGINT)
             AS n_norm_dups
    FROM n
    """,
    note="C4-style NORMALIZED dedup key: lowercase, strip non-alnum, "
    "collapse whitespace, trim -> md5 digest. Catches near-identical "
    "docs that differ only in case/punct/spacing, which exact I1 dedup "
    "misses. Map-only normalization; the dup-count window partitions by "
    "the 16-byte digest (high cardinality — no funnel). Patterns are "
    "RE2-compatible so both engines normalize identically.",
)
def t8_normalized_dedup_key(spark, sf_dir):
    from pyspark.sql import Window

    d = t(spark, "documents", sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    n = d.select("doc_id", "lang", norm.alias("norm_text"))
    key = F.md5("norm_text")
    return n.select(
        "doc_id",
        "lang",
        key.alias("norm_key"),
        F.length("norm_text").cast("bigint").alias("norm_len"),
        F.count("*")
        .over(Window.partitionBy(key))
        .cast("bigint")
        .alias("n_norm_dups"),
    )


@register(
    "c8c_asof_nearest",
    "C8",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    v AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'view'),
    cand AS (
      SELECT p.event_id, v.event_id AS view_event_id,
             CAST(abs(epoch_us(p.ts) - epoch_us(v.ts)) AS BIGINT) AS d_us,
             ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY abs(epoch_us(p.ts) - epoch_us(v.ts)), v.event_id
             ) AS rn
      FROM p JOIN v
        ON p.user_id = v.user_id
       AND v.ts >= p.ts - INTERVAL 1 HOUR
       AND v.ts <= p.ts + INTERVAL 1 HOUR
    )
    SELECT event_id, view_event_id, d_us FROM cand WHERE rn = 1
    """,
    note="NEAREST as-of (either direction) within a +/-1h tolerance band "
    "— the sensor-alignment variant of C8 (backward/forward are c8/c8b). "
    "Engine: banded equi join on user_id (sort-merge with band filter, "
    "the c7 shape — never a nested loop) then a WindowGroupLimit rank-1 "
    "pick per left row ordered by |delta| with an event_id tiebreak, so "
    "equidistant candidates resolve identically in both engines. "
    "Purchases with no view inside the band drop in both engines (the "
    "band bounds the candidate relation; unbounded nearest would be an "
    "all-pairs argmin).",
)
def c8c_asof_nearest(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, "events", sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    d_us = F.abs(
        F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("v_ts"))
    )
    cand = p.join(
        v,
        (p.user_id == v.v_user)
        & (v.v_ts >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (v.v_ts <= F.col("p_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("event_id", "view_event_id", d_us.alias("d_us"))
    w = Window.partitionBy("event_id").orderBy("d_us", "view_event_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "view_event_id", "d_us")
    )


def _ascii_eligible(d, min_len: int):
    """Docs whose text can byte-faithfully become synthetic media: at
    least ``min_len`` chars, pure printable ASCII. ONE definition for
    mm3/mm4/mm5 (review r8: three hand-synced copies of a cross-engine-
    sensitive predicate). \\A..\\z (not ^..$): Java $ matches before a
    trailing newline, RE2 (the DuckDB oracle) does not — strict anchors
    agree in both engines."""
    return d.filter(
        (F.length("text") >= min_len)
        & F.col("text").rlike("\\A[ -~]*\\z")
    )


def _ppm8_media(d):
    """(media_id, content): each eligible document's first 192 ASCII
    bytes as a genuine 8x8 P6 PPM blob — the mm3/mm5 shared input."""
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode(
            F.concat(F.lit("P6\n8 8\n255\n"), F.substring("text", 1, 192)),
            "UTF-8",
        ).alias("content"),
    )


@register(
    "mm3_real_decode",
    "I9",
    """
    WITH eligible AS (
      SELECT doc_id, text FROM documents
      WHERE length(text) >= 192 AND regexp_matches(text, '^[ -~]*$')
    ),
    px AS (
      SELECT doc_id, unnest(range(0, 64)) AS j, text FROM eligible
    )
    SELECT doc_id AS media_id, CAST(64 AS INTEGER) AS n_pixels,
           ROUND(SUM((ascii(substr(text, 3 * CAST(j AS INTEGER) + 1, 1))
                      + ascii(substr(text, 3 * CAST(j AS INTEGER) + 2, 1))
                      + ascii(substr(text, 3 * CAST(j AS INTEGER) + 3, 1))) // 3)
                 / 64.0, 6) AS mean_luma
    FROM px GROUP BY doc_id
    """,
    note="REAL image decode, oracle-checked: each eligible document's "
    "first 192 ASCII bytes become a genuine 8x8 P6 PPM (header built in "
    "pure SQL, bytes = the text), and operators/multimodal.decode_image "
    "parses it for REAL — header tokenizer, pixel extraction, per-pixel "
    "(r+g+b)//3 luma — inside mapInPandas (blobs never shuffle). The "
    "oracle recomputes n_pixels and the exact mean luma from the "
    "character codes; mean = sum/64 terminates within 6 decimals "
    "(64 = 2^6) so no rounding ambiguity exists. Only COMPRESSED "
    "formats (JPEG/PNG) remain stubbed behind NotImplementedError — "
    "uncompressed PPM/BMP decode is now real, codec-library-free.",
)
def mm3_real_decode(spark, sf_dir):
    from collections.abc import Iterator

    import pandas as pd

    from s3_kinesis_replay_spark.operators.multimodal import decode_image

    media = _ppm8_media(_ascii_eligible(t(spark, "documents", sf_dir), 192))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            frames = [decode_image(bytes(c), codec="real") for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_pixels": [len(f) for f in frames],
                    "mean_luma": [round(sum(f) / len(f), 6) for f in frames],
                }
            )

    return media.mapInPandas(run, "media_id long, n_pixels int, mean_luma double")


@register(
    "mm4_audio_features",
    "I9",
    """
    WITH eligible AS (
      SELECT doc_id, text FROM documents
      WHERE length(text) >= 128 AND regexp_matches(text, '^[ -~]*$')
    ),
    s AS (
      SELECT doc_id, unnest(range(1, 129)) AS j, text FROM eligible
    )
    SELECT doc_id AS media_id, CAST(128 AS INTEGER) AS n_samples,
           CAST(SUM(ABS(ascii(substr(text, CAST(j AS INTEGER), 1)) - 128))
                AS BIGINT) AS sum_abs_dev
    FROM s GROUP BY doc_id
    """,
    note="REAL audio decode, oracle-checked (the mm3 story for sound): "
    "each eligible document's first 128 ASCII codes become int16 "
    "samples (code-128) packed into a genuine RIFF/WAVE PCM16 file, "
    "and operators/multimodal.decode_audio parses it for REAL — chunk "
    "walk, fmt validation, int16 extraction — inside mapInPandas. "
    "Features are pure integers (sample count + summed absolute "
    "deviation), so cross-engine equality is exact with no float "
    "anywhere. Compressed audio (MP3/AAC) remains the documented stub.",
)
def mm4_audio_features(spark, sf_dir):
    from collections.abc import Iterator

    import pandas as pd

    from s3_kinesis_replay_spark.operators.multimodal import (
        decode_audio,
        pack_wav_pcm16,
    )

    d = _ascii_eligible(t(spark, "documents", sf_dir), 128)
    src = d.select("doc_id", F.substring("text", 1, 128).alias("chunk"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for doc_id, chunk in zip(pdf["doc_id"], pdf["chunk"]):
                wav = pack_wav_pcm16([ord(c) - 128 for c in chunk])
                samples = decode_audio(wav)  # the parser under test
                out.append(
                    (doc_id, len(samples), int(sum(abs(s) for s in samples)))
                )
            yield pd.DataFrame(
                out, columns=["media_id", "n_samples", "sum_abs_dev"]
            )

    return src.mapInPandas(
        run, "media_id long, n_samples int, sum_abs_dev long"
    )


def _mm5_luma(j: str) -> str:
    """Integer luma of source pixel ``j`` recomputed from the document's
    character codes — (R+G+B)//3 over three consecutive ascii bytes."""
    return (
        f"((ascii(substr(text, 3 * ({j}) + 1, 1))"
        f" + ascii(substr(text, 3 * ({j}) + 2, 1))"
        f" + ascii(substr(text, 3 * ({j}) + 3, 1))) // 3)"
    )


@register(
    "mm5_image_resize",
    "I9",
    f"""
    WITH eligible AS (
      SELECT doc_id, text FROM documents
      WHERE length(text) >= 192 AND regexp_matches(text, '^[ -~]*$')
    ),
    px AS (
      SELECT doc_id, CAST(unnest(range(0, 16)) AS INTEGER) AS p, text
      FROM eligible
    )
    SELECT doc_id AS media_id, p AS px,
           CAST(({_mm5_luma("16 * (p // 4) + 2 * (p % 4)")}
                 + {_mm5_luma("16 * (p // 4) + 2 * (p % 4) + 1")}
                 + {_mm5_luma("16 * (p // 4) + 2 * (p % 4) + 8")}
                 + {_mm5_luma("16 * (p // 4) + 2 * (p % 4) + 9")})
                // 4 AS INTEGER) AS v
    FROM px
    """,
    note="REAL image resize, oracle-checked — the third multimodal verb "
    "(decode / frame-sample / RESIZE) made concrete: each eligible "
    "document's first 192 bytes become a genuine 8x8 P6 PPM (mm3's "
    "construction), decode_image parses it for real, and "
    "operators/multimodal.resize_frame mean-pools it to 4x4 with exact "
    "integer arithmetic — all inside ONE mapInPandas pass (blobs never "
    "shuffle; at 100 TB resizing at the scan divides downstream bytes "
    "by the pooling factor). The oracle recomputes every output pixel "
    "from the character codes: out[p] = floor-mean of the 2x2 source "
    "block whose lumas are (R+G+B)//3 of consecutive ascii codes — "
    "integer-exact in both engines, no rounding surface at all.",
)
def mm5_image_resize(spark, sf_dir):
    from collections.abc import Iterator

    import pandas as pd

    from s3_kinesis_replay_spark.operators.multimodal import (
        decode_image,
        resize_frame,
    )

    media = _ppm8_media(_ascii_eligible(t(spark, "documents", sf_dir), 192))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                frame = decode_image(bytes(content), codec="real")
                small = resize_frame(frame, 8, 8, 4, 4)
                rows += [
                    (int(media_id), p, int(v)) for p, v in enumerate(small)
                ]
            yield pd.DataFrame(rows, columns=["media_id", "px", "v"])

    return media.mapInPandas(run, "media_id long, px int, v int")


@register(
    "t10_unigram_logprob",
    "I9",
    """
    WITH w AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    ),
    ww AS (SELECT doc_id, word FROM w WHERE word <> ''),
    f AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM ww GROUP BY word),
    tot AS (SELECT SUM(c) AS t FROM f)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           ROUND(CAST(SUM(CAST(ln(CAST(c AS DOUBLE) / t)
                              AS DECIMAL(38,6)) ) AS DOUBLE)
                 / COUNT(*), 6) AS avg_logprob
    FROM ww JOIN f USING (word), tot
    GROUP BY doc_id
    """,
    note="unigram language-model scoring — the CCNet-style quality "
    "signal (public: Wenzek et al. 2020 score documents by LM "
    "perplexity; the unigram form is its exactly-SQL-expressible "
    "floor): per-document mean log-probability of each token under the "
    "corpus unigram distribution. Low scores = rare-word-heavy / "
    "gibberish docs, high = common-word text; the standard companion "
    "to t2's surface heuristics for quality bucketing. Plan: one "
    "partial-agg word count, the frequency relation broadcast back "
    "onto the exploded words (same web-scale-vocab caveat as t7 — at "
    "100 TB shuffle both sides on the word key instead), one per-doc "
    "aggregate. The mean follows §5.3's decimal-sum ÷ count discipline "
    "(review r8: engine-native AVG over irrational ln() doubles "
    "accumulates in engine-specific order — each per-row ln rounds to "
    "DECIMAL(38,6) first, the exact order-independent sum divides by "
    "the count in double, then rounds to 6 in both engines).",
)
def t10_unigram_logprob(spark, sf_dir):
    d = t(spark, "documents", sf_dir)
    w = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    f = w.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    tot = f.agg(F.sum("c").alias("t"))
    return (
        w.join(F.broadcast(f), "word")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            # decimal-sum ÷ count (§5.3): per-row ln rounds to an exact
            # decimal, the sum is order-independent, the division runs
            # once per group in double
            r6(
                F.sum(
                    F.log(F.col("c").cast("double") / F.col("t")).cast(
                        "decimal(38,6)"
                    )
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_logprob"),
        )
    )


@register(
    "mm6_video_frame_sample",
    "I9",
    """
    WITH eligible AS (
      SELECT doc_id, text FROM documents
      WHERE length(text) >= 144 AND regexp_matches(text, '^[ -~]*$')
    ),
    fr AS (
      SELECT doc_id, text, unnest([0, 2, 4]) AS frame_idx FROM eligible
    ),
    px AS (
      SELECT doc_id, frame_idx, text, unnest(range(0, 16)) AS j FROM fr
    )
    SELECT doc_id AS media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(6 AS INTEGER) AS n_frames,
           ROUND(SUM(ascii(substr(text,
                     24 * CAST(frame_idx AS INTEGER) + CAST(j AS INTEGER) + 1,
                     1))) / 16.0, 6) AS mean_luma
    FROM px GROUP BY doc_id, frame_idx
    """,
    note="REAL video decode + FRAME SAMPLING, oracle-checked — the last "
    "multimodal verb (decode/feature/resize were mm3-mm5): each "
    "eligible document's first 144 ASCII bytes become a genuine 6-frame "
    "4x4 YUV4MPEG2 stream (Y4M — the public raw-video format ffmpeg "
    "emits; header + FRAME markers built in pure SQL, luma bytes = the "
    "text), and operators/multimodal.decode_video parses it for REAL — "
    "magic check, W/H header tokenizer, FRAME-marker walk, planar C420 "
    "frame-size arithmetic — inside ONE mapInPandas pass. Every 2nd "
    "frame is sampled (0/2/4) and its mean luma emitted: sum/16 "
    "terminates in 4 decimals, so no rounding ambiguity. The oracle "
    "recomputes frame offsets and exact luma means from the character "
    "codes. Blobs never shuffle; at 100 TB sampling at the scan is "
    "what makes video feature extraction tractable — only sampled-"
    "frame features (fixed width) flow downstream. Compressed "
    "containers (AVI/MP4) raise the documented NotImplementedError.",
)
def mm6_video_frame_sample(spark, sf_dir):
    import pandas as pd

    from s3_kinesis_replay_spark.operators.multimodal import decode_video

    d = _ascii_eligible(t(spark, "documents", sf_dir), 144)
    # 6 frames x (FRAME\n + 16 luma bytes + 8 zero chroma bytes); luma
    # bytes are the doc's chars so the oracle can recompute them. Chroma
    # must be in-band for the parser's frame-size walk — zeros, like
    # pack_y4m. encode() of the concat keeps everything JVM-side.
    segs = [F.lit("YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\n")]
    for k in range(6):
        segs.append(F.lit("FRAME\n"))
        segs.append(F.substring("text", k * 24 + 1, 16))
        segs.append(F.lit("\x00" * 8))
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.concat(*segs), "UTF-8").alias("content"),
    )

    def sample_frames(batches):
        for pdf in batches:
            out = {
                "media_id": [],
                "frame_idx": [],
                "n_frames": [],
                "mean_luma": [],
            }
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                w, h, frames = decode_video(bytes(blob))
                for idx in range(0, len(frames), 2):  # sample every 2nd
                    y = frames[idx]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["n_frames"].append(len(frames))
                    out["mean_luma"].append(round(sum(y) / (w * h), 6))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        sample_frames,
        "media_id long, frame_idx int, n_frames int, mean_luma double",
    ).orderBy("media_id", "frame_idx")


@register(
    "t11_chunk_overlap",
    "I7",
    """
    WITH words AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents WHERE length(trim(text)) > 0
    ),
    chunks AS (
      SELECT doc_id, w,
             unnest(generate_series(0, greatest(len(w)-1, 0), 24)) AS s
      FROM words
    )
    SELECT doc_id, CAST(s/24 AS BIGINT) AS chunk_id,
           array_to_string(w[s+1 : least(s+32, len(w))], ' ') AS chunk_text,
           CAST(least(s+32, len(w)) - s AS BIGINT) AS n_tokens
    FROM chunks ORDER BY doc_id, chunk_id
    """,
    note="DOCUMENT CHUNKING with overlap (r13) — the op every "
    "context-window-bounded training pipeline runs between cleaning "
    "and packing: each document becomes size-32-token windows at "
    "stride 24 (8-token overlap so no span is ever split across a "
    "chunk boundary unseen). Pure built-ins, zero Python in the row "
    "path: split -> sequence(0, n-1, stride) -> posexplode -> "
    "slice/array_join, all whole-stage codegen; output is one row per "
    "(doc, chunk) with its exact token count, ready for i12's "
    "token-budget shard packing downstream. The oracle recomputes the "
    "same windows via generate_series + list slicing, so an "
    "off-by-one in the stride walk, a dropped tail chunk, or overlap "
    "drift hash-mismatches. At 100 TB: embarrassingly parallel per "
    "document — no shuffle at all until a downstream groupBy; the "
    "explode multiplies rows by ~n_tokens/stride, which is the "
    "output's true size, not overhead.",
)
def t11_chunk_overlap(spark, sf_dir):
    SIZE, STRIDE = 32, 24
    docs = t(spark, "documents", sf_dir)
    words = docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("w")
    )
    starts = words.select(
        "doc_id",
        "w",
        F.posexplode(
            F.sequence(
                F.lit(0), F.greatest(F.size("w") - 1, F.lit(0)), F.lit(STRIDE)
            )
        ).alias("chunk_id", "s"),
    )
    return starts.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.array_join(F.slice("w", F.col("s") + 1, SIZE), " ").alias(
            "chunk_text"
        ),
        (F.least(F.col("s") + SIZE, F.size("w")) - F.col("s"))
        .cast("bigint")
        .alias("n_tokens"),
    ).orderBy("doc_id", "chunk_id")


@register(
    "t12_passage_dedup",
    "I1",
    """
    WITH words AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents WHERE length(trim(text)) > 0
    ),
    chunks AS (
      SELECT doc_id, w,
             unnest(generate_series(0, greatest(len(w)-1, 0), 16)) AS s
      FROM words
    ),
    passages AS (
      SELECT doc_id, CAST(s/16 AS BIGINT) AS chunk_id,
             array_to_string(w[s+1 : least(s+16, len(w))], ' ')
               AS chunk_text
      FROM chunks
    ),
    ranked AS (
      SELECT doc_id, chunk_id,
             ROW_NUMBER() OVER (
               PARTITION BY chunk_text ORDER BY doc_id, chunk_id
             ) AS rn
      FROM passages
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_passages,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
    FROM ranked GROUP BY doc_id ORDER BY doc_id
    """,
    note="SUB-DOCUMENT (passage-level) EXACT DEDUP (r14 — the CCNet/"
    "RefinedWeb paragraph-dedup design on this fixture's shape: texts "
    "are single-line, so the passage unit is a disjoint 16-token "
    "window via the t11 chunking machinery): every passage in the "
    "corpus is ranked by first occurrence (row_number over the "
    "passage text, ordered by (doc_id, chunk_id) — deterministic "
    "keep-first) and each document reports how many of its passages "
    "survive — the boilerplate/template signal document-level dedup "
    "cannot see (two distinct docs sharing a header dedup NOTHING at "
    "doc granularity). Zero Python: split -> sequence -> posexplode "
    "-> slice/array_join, then ONE shuffle on the passage text for "
    "the global rank. The oracle replays the identical windows and "
    "ranking in DuckDB. At 100 TB: the shuffle carries (passage_hash-"
    "sized text, doc_id, chunk_id) rows — production would hash "
    "passages first (xxhash64, i3h's trick) to shrink the shuffle "
    "key; the window per passage-text group is group-bounded, and "
    "the rest is embarrassingly parallel per document.",
)
def t12_passage_dedup(spark, sf_dir):
    SIZE = 16
    docs = t(spark, "documents", sf_dir)
    words = docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("w")
    )
    passages = words.select(
        "doc_id",
        F.posexplode(
            F.sequence(
                F.lit(0), F.greatest(F.size("w") - 1, F.lit(0)), F.lit(SIZE)
            )
        ).alias("chunk_id", "s"),
        F.array_join(
            F.slice("w", F.col("s") + 1, SIZE), " "
        ).alias("chunk_text"),
    )
    from pyspark.sql import Window

    ranked = passages.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("chunk_text").orderBy("doc_id", "chunk_id")
        ),
    )
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_passages"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .orderBy("doc_id")
    )


@register(
    "t12b_hashed_passage_dedup",
    "I1",
    """
    WITH words AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents WHERE length(trim(text)) > 0
    ),
    chunks AS (
      SELECT doc_id, w,
             unnest(generate_series(0, greatest(len(w)-1, 0), 16)) AS s
      FROM words
    ),
    passages AS (
      SELECT doc_id, CAST(s/16 AS BIGINT) AS chunk_id,
             md5(array_to_string(w[s+1 : least(s+16, len(w))], ' '))
               AS chunk_key
      FROM chunks
    ),
    ranked AS (
      SELECT doc_id, chunk_id,
             ROW_NUMBER() OVER (
               PARTITION BY chunk_key ORDER BY doc_id, chunk_id
             ) AS rn
      FROM passages
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_passages,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
    FROM ranked GROUP BY doc_id ORDER BY doc_id
    """,
    note="t12's PRODUCTION SHUFFLE SHAPE: the global first-occurrence "
    "rank shuffles a 16-byte digest of each passage instead of its "
    "full text — the shuffle key shrinks from ~100 bytes of UTF-8 to "
    "a fixed-width hash (i3g's md5-for-cross-engine-oracle trade; "
    "production ingest would use xxhash64 JVM-side for an 8-byte "
    "key), which at 100 TB is the difference between shuffling the "
    "corpus and shuffling a fingerprint table. Retention counts are "
    "IDENTICAL to t12's text-keyed ranking (both key spaces are "
    "collision-free at corpus scale, and the oracle replays the "
    "hashed ranking exactly), so the pair pins that the optimization "
    "is semantics-preserving.",
)
def t12b_hashed_passage_dedup(spark, sf_dir):
    SIZE = 16
    docs = t(spark, "documents", sf_dir)
    words = docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("w")
    )
    passages = words.select(
        "doc_id",
        F.posexplode(
            F.sequence(
                F.lit(0), F.greatest(F.size("w") - 1, F.lit(0)), F.lit(SIZE)
            )
        ).alias("chunk_id", "s"),
        F.md5(
            F.array_join(F.slice("w", F.col("s") + 1, SIZE), " ")
        ).alias("chunk_key"),
    )
    from pyspark.sql import Window

    ranked = passages.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("chunk_key").orderBy("doc_id", "chunk_id")
        ),
    )
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_passages"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .orderBy("doc_id")
    )
