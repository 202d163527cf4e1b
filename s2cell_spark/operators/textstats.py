"""Text analysis operators: token counts, quality scores, language ID,
document fingerprints (ENGINE; training-data pipeline surface).

Everything is native Spark SQL (codegen, no Python), with expression text
mirrored in the DuckDB oracles. Shared tokenization spec lives in
:mod:`s2cell_spark.operators.dedup` (``WORD_SPLIT_RE``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from s2cell_spark.operators.dedup import WORD_SPLIT_RE, words_col

# tiny per-language marker lexicons for the language-ID heuristic; counts
# of ' <marker> ' substring occurrences are engine-portable (plain replace)
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "les", "et"),
    "es": ("el", "los", "que"),
}


def _occurrences(col, needle: str):
    """Count of ``' needle '`` occurrences via length arithmetic — exact
    and identical in Spark and DuckDB (both have length/replace)."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    n = len(needle) + 2
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(f" {needle} "), F.lit(""))))
        / F.lit(n)
    ).cast("long")


def token_count(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_chars_text): whitespace-ish token count per the
    shared spec plus raw char length."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words_col()).alias("n_tokens"),
        F.length("text").alias("n_chars_text"),
    )


def _mean_tok_len_bp_col(n_tokens):
    # sum of token lengths == count of alnum chars (tokens are maximal
    # [a-z0-9]+ runs) — one regexp, mirrored verbatim in the oracle.
    # floor() (not cast) — Spark casts double->long by truncation but
    # DuckDB rounds; floor() is identical in both engines
    total_tok_chars = F.length(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", "")
    ).cast("long")
    return F.when(
        n_tokens > 0, F.floor(F.lit(100) * total_tok_chars / n_tokens)
    ).otherwise(F.lit(0).cast("long"))


def quality_score_col():
    """The 0-10000 integer quality score as a bare Column over ``text`` —
    reusable row-wise inside fused pipelines (cc_pipeline) as well as by
    :func:`quality_score`."""
    n_tokens = F.size(words_col()).cast("long")
    stop_hits = sum(_occurrences(F.col("text"), wd) for wd in ("the", "and", "of"))
    mean_tok_len_bp = _mean_tok_len_bp_col(n_tokens)
    return (
        F.least(F.lit(5000), F.lit(100) * n_tokens)
        + F.least(F.lit(3000), F.lit(500) * stop_hits)
        + F.when(
            (mean_tok_len_bp >= 200) & (mean_tok_len_bp <= 800), F.lit(2000)
        ).otherwise(F.lit(0))
    ).cast("long")


def lang_predicted_col():
    """The marker-lexicon language prediction as a bare Column over
    ``text`` (argmax of marker hits, ties to code order, 'und' when no
    marker fires) — shared by :func:`lang_id` and fused pipelines."""
    scores = {
        lang: sum(_occurrences(F.col("text"), m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang in sorted(LANG_MARKERS):  # later langs win only on strictly greater
        s = scores[lang].cast("long")
        take = s > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, s).otherwise(best_score)
    return best, best_score


def quality_score(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + a 0-10000 integer score.

    Features (all integer/exact so oracles match bit-for-bit):
      n_chars, n_tokens, n_punct ('.', ',', '!', '?'), n_digits,
      mean token length in basis points, stopword hits ('the','and','of').
    Score: clamp(100 * n_tokens, 0, 5000) + clamp(500 * stop_hits, 0, 3000)
           + (2000 if 20 <= mean_tok_len_bp/100 <= 80 else 0)  -- readable
    """
    toks = words_col()
    # long from the start: size()/length() are int32 and products like
    # 100 * n_tokens overflow (ANSI exception) on pathological ~22M-token
    # documents well under Spark's 2 GB string limit
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length("text").cast("long")
    punct = sum(
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(c), F.lit("")))
        ).cast("long")
        for c in ".,!?"
    )
    digits = (
        F.length("text")
        - F.length(F.regexp_replace(F.col("text"), "[0-9]", ""))
    ).cast("long")
    stop_hits = sum(_occurrences(F.col("text"), wd) for wd in ("the", "and", "of"))
    mean_tok_len_bp = _mean_tok_len_bp_col(n_tokens)
    score = quality_score_col()
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        punct.alias("n_punct"),
        digits.alias("n_digits"),
        stop_hits.alias("stop_hits"),
        mean_tok_len_bp.alias("mean_tok_len_bp"),
        score.cast("long").alias("quality_score"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Marker-lexicon language ID: per language, count marker-word
    occurrences; predict the argmax (ties break by language code order);
    'und' when no marker fires. Exact integer heuristic — the DuckDB
    oracle reproduces it verbatim."""
    best, best_score = lang_predicted_col()
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col("lang").alias("lang_declared"),
        best.alias("lang_predicted"),
        best_score.alias("marker_hits"),
    )


def rolling_fingerprint(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Polynomial rolling hash of the token stream (document fingerprint):
    ``h = sum(len(w_i) * 31^(min(i,16)) ... )`` — implemented as
    fold-left ``h = (h*31 + length(w)) mod 2^61-1`` over the token array
    with higher-order aggregate (native). Content-order sensitive, cheap,
    and exactly reproducible in DuckDB via list_reduce.

    Modulus 999999937 (< 2^30) keeps ``acc*31 + len`` far from int64
    overflow (ANSI-safe)."""
    m = 999999937
    fp = F.aggregate(
        words_col(),
        F.lit(0).cast("long"),
        lambda acc, w: (acc * F.lit(31) + F.length(w)) % F.lit(m),
    )
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))
