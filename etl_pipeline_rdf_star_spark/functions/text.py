"""Text-analysis operators for training-data pipelines (driver brief §ops):
language-ID, quality scoring, token counting, document fingerprinting.

All pure Catalyst column expressions — portable to a DuckDB oracle and
codegen'd JVM-side (no Python per row). Each operator is a DataFrame
transform ``df -> df`` over a text column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deliberately tiny per-language function-word lists (n-gram/stopword
# heuristic language-ID). At 100 TB this would be a broadcast dict of
# char-trigram log-probs; the operator shape (explode → match → argmax)
# is identical.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "fr": ["le", "la", "de", "et", "un"],
    "de": ["der", "die", "das", "und", "ein"],
    "es": ["el", "la", "de", "y", "un"],
}


def tokens(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish regex token count (word pieces +
    punctuation as separate tokens)."""
    toks = tokens(text_col)
    bpe_ish = F.size(
        F.expr(
            f"regexp_extract_all({text_col}, "
            "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"
        )
    )
    return (
        df.withColumn("n_tokens", F.size(toks))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(toks)))
        .withColumn("n_bpe_ish_tokens", bpe_ish)
        .withColumn("n_chars", F.length(text_col))
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: mean token length, type-token ratio,
    punctuation ratio, all-caps ratio — the standard cheap filters."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n_tok
    punct = F.length(F.regexp_replace(F.col(text_col), "[A-Za-z0-9 ]", ""))
    return (
        df.withColumn("mean_tok_len", F.round(F.length(text_col) / n_tok, 4))
        .withColumn("type_token_ratio", F.round(ttr, 4))
        .withColumn(
            "punct_ratio", F.round(punct / F.length(text_col), 4)
        )
        .withColumn(
            "quality_bucket",
            F.when(ttr > 0.5, "high").when(ttr > 0.3, "mid").otherwise("low"),
        )
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language-ID: score = matches of each language's marker
    list; argmax wins (ties broken by language code). One pass, no
    explode — the marker hit-count is an array_intersect size."""
    toks = F.array_distinct(tokens(text_col))
    scores = [
        F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        ).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]
    scored = df.select("*", *scores)
    # argmax via greatest + chained when (deterministic tie-break: code order)
    best = None
    for lang in LANG_MARKERS:
        cond = F.lit(True)
        for other in LANG_MARKERS:
            if other != lang:
                op = (
                    F.col(f"score_{lang}") >= F.col(f"score_{other}")
                    if other > lang
                    else F.col(f"score_{lang}") > F.col(f"score_{other}")
                )
                cond = cond & op
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    return scored.withColumn("pred_lang", best.otherwise("und"))


def with_fingerprint(
    df: DataFrame, text_col: str = "text", k: int = 3, window: int = 4
) -> DataFrame:
    """Winnowing-style document fingerprint: hash every k-token shingle
    (md5, portable), take the minimum per sliding window, fingerprint =
    sha256 of the sorted distinct window-minima. Near-identical documents
    share most minima — the classic MOSS/winnowing scheme — while the
    whole computation is array expressions (no explode, no shuffle)."""
    toks = tokens(text_col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingle_hashes = F.transform(
        idx,
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k))),
    )
    widx = F.sequence(
        F.lit(0), F.greatest(F.size(shingle_hashes) - window, F.lit(0))
    )
    minima = F.transform(
        widx, lambda i: F.array_min(F.slice(shingle_hashes, i + 1, window))
    )
    return df.withColumn(
        "fingerprint",
        F.sha2(F.concat_ws("", F.array_sort(F.array_distinct(minima))), 256),
    )
