"""Text-analysis column builders for training-data pipelines — language ID,
quality scoring, token counting, document fingerprinting. Pure
``pyspark.sql.functions`` expressions (whole-stage codegen; no Python)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# BPE-ish token pattern: letter runs, digit runs, single punctuation marks.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# deterministic n-gram-free language-ID heuristic: stopword hit counts.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "los", "que"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def ws_token_count(col: str):
    """Whitespace token count."""
    return F.size(F.split(F.trim(F.col(col)), r"\s+"))


def bpe_token_count(col: str):
    """Count of TOKEN_RE matches (a BPE-ish upper bound on subword count).

    Pattern passed as a literal column — F.expr string literals unescape
    backslashes and would corrupt ``\\s``."""
    return F.size(F.regexp_extract_all(F.col(col), F.lit(TOKEN_RE), F.lit(0)))


def punct_count(col: str):
    return F.size(
        F.regexp_extract_all(F.col(col), F.lit(r"[^A-Za-z0-9\s]"), F.lit(0))
    )


def fingerprint(col: str):
    """Normalization fingerprint: md5 of lower-cased, whitespace-collapsed
    text — the exact-dedup key robust to spacing/case differences."""
    return F.md5(F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " "))


def quality_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_chars, n_tokens, n_punct, score): length/punct heuristics.

    score = n_tokens capped at 256, minus a punctuation-excess penalty —
    integer arithmetic only, so any engine reproduces it bit-for-bit.
    """
    d = docs.select(
        F.col(id_col).alias("id"),
        F.length(F.col(text_col)).alias("n_chars"),
        ws_token_count(text_col).alias("n_tokens"),
        punct_count(text_col).alias("n_punct"),
    )
    return d.withColumn(
        "score",
        F.least(F.col("n_tokens"), F.lit(256))
        - F.greatest(F.col("n_punct") * 4 - F.col("n_tokens"), F.lit(0)),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, pred_lang): argmax of stopword hit counts, ties broken by lang
    name (ordinal) — deterministic and SQL-reproducible."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
    )
    scored = None
    for lang, words in LANG_STOPWORDS.items():
        s = toks.filter(F.col("tok").isin(words)).groupBy("id").agg(
            F.count(F.lit(1)).alias("hits")
        ).withColumn("lang", F.lit(lang))
        scored = s if scored is None else scored.unionByName(s)
    ids = docs.select(F.col(id_col).alias("id")).distinct()
    # argmax(hits) with ties to the alphabetically-first language:
    # max of struct(hits, -lang_rank, lang)
    langs = sorted(LANG_STOPWORDS)
    rank_map = F.create_map(*[F.lit(x) for pair in ((l, -i) for i, l in enumerate(langs)) for x in pair])
    best = (
        scored.withColumn("lrank", rank_map[F.col("lang")])
        .groupBy("id")
        .agg(F.max(F.struct(F.col("hits"), F.col("lrank"), F.col("lang"))).alias("m"))
        .select("id", F.col("m.lang").alias("pred_lang"))
    )
    return ids.join(best, "id", "left").fillna({"pred_lang": "unknown"})


# ---------------------------------------------------------------------------
# PII scrubbing (training-data redaction pass)
# ---------------------------------------------------------------------------

# Patterns are deliberately RE2-compatible (no backreferences/lookaround)
# so the DuckDB oracle runs them verbatim; order matters — emails are
# scrubbed before IPs so an address's dotted domain is never half-eaten.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def pii_scrub(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact emails, IPv4 addresses, and US-style phone numbers,
    counting each kind — the standard pre-training redaction pass.

    Sequential semantics: each pattern is counted on (and replaced in)
    the text as left by the previous pattern, so a redaction token never
    double-counts. Pure JVM ``regexp_count``/``regexp_replace`` columns
    (whole-stage codegen, embarrassingly parallel — no exchange at all).
    """
    out = docs.select(F.col(id_col), F.col(text_col).alias("t"))
    for name, pat, tok in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.regexp_count("t", F.lit(pat)).cast("long")
        ).withColumn("t", F.regexp_replace("t", pat, tok))
    return out.select(
        id_col,
        F.col("t").alias("text_clean"),
        *[f"n_{name}" for name, _, _ in PII_PATTERNS],
    )


def repetition_stats(
    docs: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition signals over word
    ``n``-grams: ``(id, total_ngrams, distinct_ngrams, dup_ngram_frac,
    top_ngram_frac)`` — the quality gate drops docs whose
    ``dup_ngram_frac`` (share of n-gram occurrences beyond each gram's
    first) or ``top_ngram_frac`` (share claimed by the single most
    frequent n-gram) exceeds a threshold; boilerplate and spam score
    high on both. Docs shorter than ``n`` words report zero counts and
    NULL fractions (no signal, not a perfect score).

    100-TB shape: repetition is a PER-DOCUMENT property — the n-gram
    explode groups by (id, gram) then by id, both partially aggregated
    map-side, and because every group is confined to one document the
    keys are uniform by construction (no corpus-wide hot gram exists in
    this keyspace, unlike cross-corpus dedup). Pure JVM throughout.
    """
    grams = (
        docs.select(
            F.col(id_col).alias("id"),
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("w"),
        )
        .select(
            "id",
            F.explode(
                F.expr(
                    f"CASE WHEN size(w) >= {n} THEN "
                    f"transform(sequence(1, size(w) - {n - 1}), "
                    f"i -> array_join(slice(w, i, {n}), ' ')) "
                    f"ELSE array() END"
                )
            ).alias("gram"),
        )
    )
    per_gram = grams.groupBy("id", "gram").agg(F.count(F.lit(1)).alias("c"))
    stats = per_gram.groupBy("id").agg(
        F.sum("c").alias("total_ngrams"),
        F.count(F.lit(1)).alias("distinct_ngrams"),
        F.max("c").alias("top_c"),
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(stats, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("total_ngrams", F.lit(0)).alias("total_ngrams"),
            F.coalesce("distinct_ngrams", F.lit(0)).alias("distinct_ngrams"),
            F.round(
                (F.col("total_ngrams") - F.col("distinct_ngrams"))
                / F.col("total_ngrams"),
                6,
            ).alias("dup_ngram_frac"),
            F.round(F.col("top_c") / F.col("total_ngrams"), 6).alias(
                "top_ngram_frac"
            ),
        )
    )
