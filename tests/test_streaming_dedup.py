"""Streaming near-dup clustering (streaming.dedupstream) == batch
minhash_near_dup_pairs -> connected_components, on a two-batch fixture
whose second batch MERGES two first-batch clusters (the case no per-key
stateful operator can express)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def _doc(words):
    return " ".join(words)


def _fixture_docs():
    base = [f"w{i}" for i in range(30)]
    g = list(base)
    for p in (0, 3, 6, 9, 12, 15):
        g[p] = f"g{p}"
    c = list(base)
    for p in (0, 3, 6):
        c[p] = f"g{p}"
    b = list(base)
    b[29] = "zz"
    h = list(g)
    h[29] = "qq"
    batch1 = [
        (1, _doc(base)),   # A
        (2, _doc(b)),      # B ~ A
        (10, _doc(g)),     # G (not ~ A: 6 words changed)
        (11, _doc(h)),     # H ~ G
        (30, _doc([f"s{i}" for i in range(30)])),  # singleton
    ]
    batch2 = [
        (20, _doc(c)),     # C ~ A and C ~ G -> merges both clusters
        (40, _doc([f"d{i}" for i in range(30)])),  # pairs with nothing
    ]
    return batch1, batch2


def _batch_labels(spark, rows):
    from s2cell_spark.operators.components import connected_components
    from s2cell_spark.operators.dedup import minhash_near_dup_pairs

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # 32 bands x 2 rows: a MERGE-bridge doc is ~threshold-similar to both
    # clusters by construction (Jaccard triangle inequality), and 16x4
    # banding deterministically misses ~0.5-Jaccard pairs; wider banding
    # raises recall and exact-verify kills the extra candidates
    pairs = minhash_near_dup_pairs(docs, threshold_bp=5000, num_perm=64, bands=32)
    labels = connected_components(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")),
        src="u",
        dst="v",
    )
    return {
        (r["node"], r["component"]) for r in labels.collect()
    }


def test_streaming_dup_clusters_match_batch(spark, tmp_path):
    from s2cell_spark.streaming.dedupstream import streaming_dup_clusters

    batch1, batch2 = _fixture_docs()
    # fixture sanity: the full-batch clustering actually merges the two
    # first-batch clusters through C — otherwise this test proves nothing
    full = _batch_labels(spark, batch1 + batch2)
    comp_of = dict(full)
    assert (
        comp_of[1] == comp_of[2] == comp_of[10] == comp_of[11] == comp_of[20] == 1
    ), full
    assert 30 not in comp_of and 40 not in comp_of
    # ...and that batch1 alone did NOT already link A's and G's clusters
    part1 = dict(_batch_labels(spark, batch1))
    assert part1[1] != part1[10]

    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"
    for name, rows in (("b1", batch1), ("b2", batch2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / name))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        streaming_dup_clusters(stream, state, threshold_bp=5000, bands=32)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["doc_id"], r["cluster"])
        for r in spark.read.parquet(f"{state}/labels").collect()
    }
    assert got == full

    # replay idempotence: re-folding an already-committed batch id is a no-op
    from s2cell_spark.streaming.dedupstream import dup_clusters_refresh

    last = json.load(open(f"{state}/_last_batch.json"))["batch_id"]
    poison = spark.createDataFrame([(99, "w0 w1 w2 w3 w4")], schema)
    dup_clusters_refresh(poison, last, state, threshold_bp=5000, bands=32)
    again = {
        (r["doc_id"], r["cluster"])
        for r in spark.read.parquet(f"{state}/labels").collect()
    }
    assert again == got
