"""Text-analysis operators for training-data pipelines (north-star §2.I9):
language-ID, quality scoring, token counting, document fingerprinting.

Everything is codegen expressions over the documents table — no Python in
the row path; each scales as a single narrow projection (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language marker lexicons (n-gram heuristic): public-knowledge
# stopword fragments. Real language ID would be a fastText-style model —
# the operator's *shape* (score-per-language, argmax) is what scales.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws if w.isascii()})


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish heuristic: ~words + punct runs)."""
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_token_count(text: Column) -> Column:
    """Regex sub-word segmentation count: alpha runs, digit runs, punct."""
    return F.size(
        F.filter(
            F.split(F.lower(text), r"(?<=[a-z])(?=[^a-z\s])|(?<=[^a-z\s])(?=[a-z])|\s+"),
            lambda s: F.length(s) > 0,
        )
    )


def language_scores(text: Column) -> list[Column]:
    """Marker-hit count per language over the token set."""
    toks = F.split(F.lower(text), r"\s+")
    out = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out.append(F.size(F.array_intersect(F.array_distinct(toks), arr)).alias(f"score_{lang}"))
    return out


def quality_features(text: Column, n_chars: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio features (public heuristics)."""
    toks = F.split(F.lower(text), r"\s+")
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return {
        "n_tokens": n_tok.cast("int"),
        "avg_token_len": F.round(
            (F.length(text) - (n_tok - 1)).cast("double") / n_tok, 6
        ),
        "stopword_ratio": F.round(n_stop.cast("double") / n_tok, 6),
        "punct_ratio": F.round(n_punct.cast("double") / F.length(text), 6),
        "len_matches_meta": F.length(text) == n_chars,
    }


def rolling_fingerprint(text: Column, base: int = 257, mod: int = 1_000_000_007) -> Column:
    """Deterministic polynomial rolling hash of the character stream —
    document fingerprint usable as a cheap content key.

    h = Σ code(c_i)·base^i mod p, folded with integer ops only (exact in
    both engines; declared oracle mirrors the same fold).
    """
    codes = F.transform(F.split(text, ""), lambda c: F.ascii(c).cast("bigint"))
    return F.aggregate(
        codes,
        F.struct(F.lit(0).cast("bigint").alias("h"), F.lit(1).cast("bigint").alias("p")),
        lambda acc, c: F.struct(
            ((acc.getField("h") + c * acc.getField("p")) % mod).alias("h"),
            ((acc.getField("p") * base) % mod).alias("p"),
        ),
        lambda acc: acc.getField("h"),
    )


def analyze(documents: DataFrame) -> DataFrame:
    """Full text-analysis projection: language ID + quality + tokens + print."""
    text = F.col("text")
    feats = quality_features(text, F.col("n_chars"))
    scores = language_scores(text)
    score_cols = [F.col(f"score_{lang}") for lang in LANG_MARKERS]
    langs = F.array(*[F.lit(lang) for lang in LANG_MARKERS])
    best = F.element_at(
        langs,
        F.array_position(
            F.array(*score_cols), F.array_max(F.array(*score_cols))
        ).cast("int"),
    )
    return (
        documents.select("doc_id", "lang", text.alias("text"), F.col("n_chars"), *scores)
        .withColumns(
            {
                **{k: v for k, v in feats.items()},
                "predicted_lang": best,
                "fingerprint": rolling_fingerprint(text),
                "n_tokens_ws": token_count(text),
            }
        )
        .drop("text")
    )
