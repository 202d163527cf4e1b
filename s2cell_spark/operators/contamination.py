"""Benchmark contamination detection (ENGINE; LLM-training-data op).

Before training on a web corpus, every doc must be checked for n-gram
overlap against the held-out evaluation benchmarks — a training doc that
contains a benchmark item's text leaks the answer key into the model
(the standard decontamination step in public LLM data pipelines, e.g.
GPT-3 App. C / PaLM App. D: 8-13-gram overlap against eval sets —
``n`` is a parameter; the driver fixture checks n=3, where short
synthetic docs overlap densely, AND n=13, the public-pipeline setting,
where only verbatim duplicated passages match).

Shape of the computation, and why it scales:

- The BENCHMARK side is small by nature (eval suites are thousands of
  docs, not billions). Its distinct shingle set is built once and
  broadcast through the plan-stats gate (`plans.joins.broadcast_if_small`
  — never an unconditional hint, per the repo invariant that
  pages-derived frames prove their size first).
- The CORPUS side is map-only until the final per-doc rollup: text ->
  words -> distinct n-gram shingles -> explode -> broadcast-hash
  semi-probe -> groupBy(doc). No corpus-side shuffle carries text or
  shingles wider than the matched subset; the one exchange is the per-doc
  count aggregate with map-side partials.
- Output is per contaminated doc only (matched > 0) — at 10^12 docs the
  result is the contamination report, not a corpus copy.

Cf. reference scope note: the reference library (s2cell) is a geometry
kernel and has no text ops; this operator family comes from the north
rule's Common-Crawl-style training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingled_docs
from ..plans.joins import broadcast_if_small


def benchmark_shingles(
    bench_docs: DataFrame, id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """DISTINCT n-gram shingle set of the benchmark corpus: one column
    ``s``. Deduplicated across benchmark docs (overlap counts ask "is
    this n-gram anywhere in any benchmark", not "in how many").
    """
    return (
        shingled_docs(bench_docs, id_col=id_col, n=n)
        .select(F.explode("ws").alias("s"))
        .distinct()
    )


def ngram_contamination(
    corpus_docs: DataFrame,
    bench_docs: DataFrame,
    id_col: str = "doc_id",
    threshold_bp: int = 2000,
    n: int = 3,
) -> DataFrame:
    """Per-corpus-doc benchmark overlap: (doc, n_shingles, n_matched,
    contam_bp, contaminated) for every corpus doc sharing >= 1 distinct
    shingle with the benchmark set.

    contam_bp = floor(10000 * matched / doc's distinct shingles) — the
    fraction of the DOC that is benchmark text, in basis points (integer,
    so the engine/oracle compare is exact; same convention as
    dedup.jaccard_pairs_exact). `contaminated` flags docs at or above
    `threshold_bp` — the drop set of a decontamination pass.
    """
    corpus = shingled_docs(corpus_docs, id_col=id_col, n=n)
    # Carry the doc's shingle-set size THROUGH the explode instead of
    # re-joining a corpus-wide sizes frame afterwards: the grouping key
    # (doc, n_shingles) is functionally (doc), so the rollup is one
    # exchange over matched docs only and the plan has a single join.
    exploded = corpus.select(
        "doc",
        F.size("ws").cast("long").alias("n_shingles"),
        F.explode("ws").alias("s"),
    )
    bench = broadcast_if_small(
        benchmark_shingles(bench_docs, id_col=id_col, n=n)
    )
    matched = (
        exploded.join(bench, on="s", how="inner")
        .groupBy("doc", "n_shingles")
        .agg(F.count("*").cast("long").alias("n_matched"))
    )
    # Integer `div` (not floor over DOUBLE division) so the arithmetic is
    # int64-exact by construction on both engines (DuckDB oracle uses
    # `//`) — the module convention is integer-exact parity, not
    # equivalent-at-realistic-sizes.
    contam_bp = F.expr("(10000 * n_matched) div n_shingles").cast("long")
    return matched.select(
        F.col("doc").cast("long").alias("doc_id"),
        "n_shingles",
        "n_matched",
        contam_bp.alias("contam_bp"),
        (contam_bp >= threshold_bp).alias("contaminated"),
    )
