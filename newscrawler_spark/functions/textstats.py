"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting. All built-in expressions (codegen),
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "una", "que", "por"],
}

BPE_ISH_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def _marker_count(c: Column, words: list[str]) -> Column:
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))


def lang_id(df: DataFrame, text_col: str, out_col: str = "pred_lang") -> DataFrame:
    """Marker-word argmax language ID; 'und' when no marker fires.

    Ties break by fixed language order (en > de > fr > es) — deterministic
    and SQL-expressible for the DuckDB oracle.
    """
    scores = {lg: _marker_count(F.col(text_col), ws) for lg, ws in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lg in reversed(list(LANG_MARKERS)):  # earlier langs win ties
        pred = F.when(scores[lg] == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return df.withColumn(out_col, pred)


def token_count_ws(c: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.filter(F.split(c, r"\s+"), lambda t: F.length(t) > 0))


def token_count_bpe_ish(c: Column) -> Column:
    """BPE-ish regex token count: letter runs, digit runs, single symbols."""
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_TOKEN_RE), F.lit(0)))


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + score.

    Integer counts first (hash-stable), ratios as exact double divisions of
    those ints — deterministic across engines.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count_ws(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), F.lit(0)))
    n_stop = _marker_count(t, LANG_MARKERS["en"])
    n_upper = F.size(F.regexp_extract_all(t, F.lit("[A-Z]"), F.lit(0)))
    out = (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("n_punct", n_punct)
        .withColumn("n_stopwords", n_stop)
        .withColumn("n_upper", n_upper)
    )
    mean_tok_len = F.when(
        F.col("n_tokens") > 0, F.col("n_chars_q") / F.col("n_tokens")
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        F.col("n_chars_q") > 0, F.col("n_punct") / F.col("n_chars_q")
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        F.col("n_tokens") > 0, F.col("n_stopwords") / F.col("n_tokens")
    ).otherwise(F.lit(0.0))
    return (
        out.withColumn("mean_token_len", mean_tok_len)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", stop_ratio)
    )


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, window: int = 4,
    algo: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprints (rolling character k-gram hashes).

    Builds all k-gram hashes with sequence+transform (array built-ins),
    then selects the minimum hash of each sliding window of ``window``
    consecutive k-grams — the classic winnowing scheme — and returns the
    distinct selected hashes per document as `fps` (array<long> for
    xxhash64; array<string> for the md5 variant, whose lexicographic mins
    DuckDB reproduces exactly for the oracle gate).
    """
    t = F.col(text_col)
    n = F.length(t)
    starts = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    gram_hash = (
        (lambda i: F.xxhash64(F.substring(t, i, k)))
        if algo == "xxhash64"
        else (lambda i: F.md5(F.substring(t, i, k)))
    )
    grams = F.transform(starts, gram_hash)
    win_starts = F.sequence(F.lit(1), F.greatest(F.size(grams) - window + 1, F.lit(1)))
    selected = F.transform(
        win_starts, lambda i: F.array_min(F.slice(grams, i, window))
    )
    return df.select(
        F.col(id_col), F.array_sort(F.array_distinct(selected)).alias("fps")
    )
