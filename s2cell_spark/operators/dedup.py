"""Deduplication operators for web-scale training-data pipelines.

* exact duplicate groups — md5(text) hash groupBy (native, one shuffle on
  the hash; map-side combine),
* word-set Jaccard near-dup pairs — exact, via shared-word equi-join +
  integer-basis-point Jaccard (SQL-replicable in DuckDB for the oracle),
* MinHash + LSH banding — the scale path: constant-size signature per doc,
  band-bucket equi-join generates candidates WITHOUT the all-pairs
  shared-word blowup; candidates then verify with exact Jaccard. Output =
  verified subset (probabilistic recall: tested with tolerance, exposed to
  the driver as a rows-only query),
* SimHash fingerprints — 64 per-bit integer majority votes over md5 word
  hashes, expressed entirely in native Spark aggregates (and replicated
  textually in the DuckDB oracle).

Tokenization spec shared by everything here: lowercase, split on
``[^a-z0-9]+``, drop empties. DuckDB mirror:
``regexp_split_to_array(lower(text), '[^a-z0-9]+')``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

WORD_SPLIT_RE = "[^a-z0-9]+"


def words_col(text=None):
    """Array of tokens per the shared tokenization spec."""
    src = F.col("text") if text is None else text
    return F.filter(F.split(F.lower(src), WORD_SPLIT_RE), lambda w: w != "")


def shingles_col(text=None, n: int = 3):
    """Array of n-word shingles (space-joined), the near-dup unit.

    Word-level Jaccard saturates on small vocabularies (any two long docs
    share most WORDS); n-gram shingles keep the signal discriminative.
    DuckDB mirror: ``list_transform(range(1, len(ws)-1), i ->
    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])``."""
    ws = words_col(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(ws) - (n - 1), F.lit(0)))
    return F.when(F.size(ws) >= n, F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(ws, (i + k).cast("int")) for k in range(n)]),
    )).otherwise(F.array().cast("array<string>"))


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(text_md5, n_docs, min_doc_id) per distinct text — group sizes >1
    are exact duplicates; min id is the canonical keeper."""
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_md5"))
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keeper_id"))
    )


def jaccard_pairs_exact(
    docs: DataFrame, threshold_bp: int, id_col: str = "doc_id"
) -> DataFrame:
    """All doc pairs (a < b) with 3-gram-shingle-SET Jaccard >= threshold
    (basis points; floor of double division — identical in DuckDB).

    Plan: distinct (doc, shingle) -> self equi-join on shingle (the only
    shuffle, keyed on shingle) -> pair intersection counts -> join per-doc
    set sizes -> ``floor(10000*inter/(|A|+|B|-inter)) >= threshold_bp``.
    Shingle keys are Zipf-skewed; at scale add a document-frequency cap
    (drop shingles appearing in > X% of docs) via one pre-aggregate — it
    leaves high-Jaccard pairs intact and removes the hot join keys.
    """
    dw = docs.select(
        F.col(id_col).alias("doc"), F.explode(shingles_col()).alias("w")
    ).distinct()
    sizes = dw.groupBy("doc").agg(F.count("*").alias("sz"))
    a = dw.alias("a")
    b = dw.alias("b")
    inter = (
        a.join(b, on="w")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("sz", "sz_a"), on="doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("sz", "sz_b"), on="doc_b")
        .withColumn(
            "jacc_bp",
            (F.lit(10000) * F.col("inter"))
            .cast("long")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .withColumn("jacc_bp", F.floor(F.col("jacc_bp")).cast("long"))
        .filter(F.col("jacc_bp") >= threshold_bp)
        .select("doc_a", "doc_b", "jacc_bp")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature_udf(num_perm: int = 64, seed: int = 7):
    """pandas UDF: text -> array<long> MinHash signature over word shingles.

    Word hash: FNV-1a 64 of the utf-8 token (vectorized via numpy byte
    folding), then ``(a*h + b) mod (2^61-1)`` per permutation, min over the
    doc's distinct tokens. Deterministic across runs/partitions.
    """
    a, b = _minhash_params(num_perm, seed)

    def fnv1a(tokens: list[str]) -> np.ndarray:
        out = np.empty(len(tokens), dtype=np.uint64)
        basis = np.uint64(0xCBF29CE484222325)
        prime = np.uint64(0x100000001B3)
        for t_i, tok in enumerate(tokens):
            h = basis
            for byte in tok.encode("utf-8"):
                h = (h ^ np.uint64(byte)) * prime
            out[t_i] = h
        return out

    import re as _re

    @F.pandas_udf(ArrayType(LongType()))
    def sig(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            if t is None:
                out.append(None)
                continue
            words = [w for w in _re.split(WORD_SPLIT_RE, t.lower()) if w]
            toks = sorted(
                {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}
            )
            if not toks:
                out.append([int(x) for x in b.view(np.int64)[: len(a)]])
                continue
            h = fnv1a(toks)  # (m,)
            vals = (a[:, None] * (h[None, :] % _MERSENNE) + b[:, None]) % np.uint64(
                _MERSENNE
            )
            out.append([int(x) for x in vals.min(axis=1).view(np.int64)])
        return pd.Series(out, dtype="object")

    return sig


def minhash_lsh_candidates(
    docs: DataFrame,
    num_perm: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: equal signature slice in
    any band -> candidate. One explode (x bands, constant factor) + one
    equi-join on (band, slice-hash) — scales linearly, no all-pairs term."""
    rows_per_band = num_perm // bands
    sig = minhash_signature_udf(num_perm)
    with_sig = docs.select(F.col(id_col).alias("doc"), sig(F.col("text")).alias("sig"))
    banded = with_sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.hash(F.slice("sig", bi * rows_per_band + 1, rows_per_band)).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    threshold_bp: int = 5000,
    num_perm: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidates verified with exact shingle-set Jaccard (computed
    only on the candidate pairs via array intersection — no shared-shingle
    join)."""
    cand = minhash_lsh_candidates(docs, num_perm, bands, id_col)
    wsets = docs.select(
        F.col(id_col).alias("doc"), F.array_distinct(shingles_col()).alias("ws")
    )
    joined = (
        cand.join(wsets.withColumnRenamed("doc", "doc_a").withColumnRenamed("ws", "ws_a"), on="doc_a")
        .join(wsets.withColumnRenamed("doc", "doc_b").withColumnRenamed("ws", "ws_b"), on="doc_b")
    )
    inter = F.size(F.array_intersect("ws_a", "ws_b"))
    union = F.size("ws_a") + F.size("ws_b") - inter
    return (
        joined.withColumn("jacc_bp", F.floor(F.lit(10000) * inter / union).cast("long"))
        .filter(F.col("jacc_bp") >= threshold_bp)
        .select("doc_a", "doc_b", "jacc_bp")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_bit_exprs() -> list:
    """64 aggregate exprs: per-bit counts of set bits across a doc's word
    hashes. Word hash = first 16 hex chars of md5(word) as uint64, built
    from two 8-char conv() halves (Spark conv is native; DuckDB mirrors via
    cast(concat('0x', ...) as bigint))."""
    h_hi = F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("long")
    h_lo = F.conv(F.substring(F.md5(F.col("w")), 9, 8), 16, 10).cast("long")
    h = F.shiftleft(h_hi, 32).bitwiseOR(h_lo)
    return [
        F.sum(F.shiftrightunsigned(h, bit).bitwiseAND(F.lit(1))).alias(f"b{bit}")
        for bit in range(64)
    ] + [F.count("*").alias("n_words")]


def simhash(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash) — bit j set iff more than half the doc's word
    occurrences (duplicates counted) have bit j set in md5-64(word).

    Entirely native: explode words -> 65 hash aggregates -> fold the 64
    majority votes back into one long. Ties (exactly half) -> 0.
    """
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(words_col()).alias("w")
    )
    agg = exploded.groupBy("doc_id").agg(*simhash_bit_exprs())
    fp = F.lit(0).cast("long")
    for bit in range(64):
        vote = (F.col(f"b{bit}") * 2 > F.col("n_words")).cast("long")
        fp = fp.bitwiseOR(F.shiftleft(vote, bit))
    return agg.select("doc_id", fp.alias("simhash"))
