"""Operator-level tests: salting identity, polygon PIP vs numpy oracle,
covering superset property, MinHash recall, checkpoint resume (t4),
streaming-vs-batch equivalence, multimodal determinism."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2cell_spark import kernels as K
from s2cell_spark.operators import containment as CJ
from s2cell_spark.operators import covering as COV
from s2cell_spark.sources.pages import load_pages, with_cell_id
from tests.conftest import SF_CORRECT, SF_SMOKE


@pytest.fixture(scope="module")
def pages(spark):
    return with_cell_id(load_pages(spark, SF_CORRECT)).cache()


def _regions():
    return {
        0: COV.latlng_rect_covering(39.7, 41.7, -75.0, -73.0, max_level=10, min_emit_level=6),
        1: COV.latlng_rect_covering(-10.0, 10.0, 0.0, 20.0, max_level=10, min_emit_level=6),
    }


def test_salted_join_row_identical(spark, pages):
    """Hot-cell salting must not change the join output (SURVEY §7)."""
    regions = _regions()
    plain = CJ.containment_join_equi(pages, spark, regions, level=10)
    salted = CJ.containment_join_salted(pages, spark, regions, level=10, num_salts=8)
    a = {(r["region_id"], r["doc_id"]) for r in plain.select("region_id", "doc_id").collect()}
    b = {(r["region_id"], r["doc_id"]) for r in salted.select("region_id", "doc_id").collect()}
    assert a == b and len(a) > 0


def test_salted_join_pathological_single_cell(spark):
    """All rows in ONE covering cell (the worst skew case): salted output
    still identical to unsalted."""
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(500),
            "url": [f"u{i}" for i in range(500)],
            "lat": np.full(500, 40.7128) + np.arange(500) * 1e-7,
            "lon": np.full(500, -74.006),
        }
    )
    df = spark.createDataFrame(pdf)
    from s2cell_spark import functions as S2F

    df = df.withColumn("cell_id", S2F.lat_lon_to_cell_id(F.col("lat"), F.col("lon"), 30))
    regions = {7: COV.latlng_rect_covering(40.0, 41.0, -75.0, -73.0, max_level=8)}
    plain = CJ.containment_join_equi(df, spark, regions, level=8)
    salted = CJ.containment_join_salted(df, spark, regions, level=8, num_salts=16)
    assert plain.count() == 500 and salted.count() == 500


def test_range_join_matches_equi(spark, pages):
    """Mixed-level range join == single-level equi join output."""
    regions = _regions()
    equi = CJ.containment_join_equi(pages, spark, regions, level=10)
    rng = CJ.containment_join_range(pages, regions)
    a = {(r["region_id"], r["doc_id"]) for r in equi.select("region_id", "doc_id").collect()}
    b = {(r["region_id"], r["doc_id"]) for r in rng.select("region_id", "doc_id").collect()}
    assert a == b


def test_polygon_pip_vs_numpy_oracle(spark, pages):
    """Triangle PIP through covering join + ray-cast UDF vs a brute-force
    numpy ray-cast over ALL pages."""
    tri = np.array([[40.0, -75.0], [42.5, -74.0], [40.0, -72.0]])
    cov = COV.latlng_rect_covering(40.0, 42.5, -75.0, -72.0, max_level=10, min_emit_level=6)
    cand = CJ.containment_join_equi(pages, spark, {0: cov}, level=10)
    pip = CJ.point_in_polygon_udf([tri])
    got = {
        r["doc_id"]
        for r in cand.filter(pip(F.col("lat"), F.col("lon"))).select("doc_id").collect()
    }
    pdf = pages.select("doc_id", "lat", "lon").toPandas()
    y, x = pdf["lat"].to_numpy(), pdf["lon"].to_numpy()
    inside = np.zeros(len(pdf), dtype=bool)
    ry, rx = tri[:, 0], tri[:, 1]
    for a_i in range(3):
        b_i = (a_i + 1) % 3
        y1, x1, y2, x2 = ry[a_i], rx[a_i], ry[b_i], rx[b_i]
        if y1 == y2:
            continue
        inside ^= ((y1 > y) != (y2 > y)) & (x < (x2 - x1) * (y - y1) / (y2 - y1) + x1)
    want = set(pdf.loc[inside, "doc_id"].tolist())
    assert got == want and len(want) > 0


def test_covering_size_budget():
    """Pruning-quality regression gate: coverings must stay TIGHT, not
    just superset-correct. Two budgets per PIP box at the query's own
    (max_level=10, min_emit_level=6):

    * raw covering size (what broadcasts) <= 1.5x the measured round-2
      values (268..4984 cells);
    * expanded level-10 cell count <= 2.5x the box's ideal spherical
      cell count (measured ratios today: 0.85..1.62) — catches a coverer
      change that silently over-covers even if the raw count stays flat.
    """
    import math

    import __spark_entry__ as E

    budget = {0: 400, 1: 410, 2: 570, 3: 4500, 4: 7500, 5: 4700}
    total_l10 = 6 * 4**10
    for rid, a, b, c, d in E.PIP_BOXES:
        cov = COV.latlng_rect_covering(a, b, c, d, max_level=10, min_emit_level=6)
        assert cov.shape[0] <= budget[rid], (
            f"box {rid}: covering grew to {cov.shape[0]} cells (budget {budget[rid]})"
        )
        lvl = K.cell_id_to_level(cov).astype(int)
        exp10 = int((4 ** (10 - lvl)).sum())
        frac = (
            (math.sin(math.radians(b)) - math.sin(math.radians(a)))
            * math.radians(d - c)
            / (4 * math.pi)
        )
        ratio = exp10 / (frac * total_l10)
        assert ratio <= 2.5, f"box {rid}: covering covers {ratio:.2f}x the ideal area"


def test_polygon_covering_superset_and_tighter():
    """polygon_covering must (a) contain every interior point of random
    concave polygons incl. holes — the superset property PIP correctness
    rests on — and (b) cover less expanded area than the bbox covering
    for the driver's concave polygon (the tightness win it exists for)."""
    import __spark_entry__ as E
    from s2cell_spark.operators.covering import (
        _points_in_polygon,
        polygon_bbox_covering,
        polygon_covering,
    )

    rng = np.random.default_rng(11)
    cases = [[np.asarray(r, dtype=float) for r in rings] for rings in E.PIP_POLYGONS.values()]
    for _ in range(4):  # random star-shaped concave polygons
        k = rng.integers(5, 10)
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(3.0, 25.0, k)
        c_lat, c_lon = rng.uniform(-50, 50), rng.uniform(-120, 120)
        ring = np.stack([c_lat + rad * np.sin(ang), c_lon + rad * np.cos(ang)], axis=1)
        cases.append([ring])
    for rings in cases:
        cov = polygon_covering(rings, max_level=10)
        assert cov.size > 0
        vs = np.concatenate(rings)
        lat = rng.uniform(vs[:, 0].min(), vs[:, 0].max(), 50_000)
        lon = rng.uniform(vs[:, 1].min(), vs[:, 1].max(), 50_000)
        inside = _points_in_polygon(rings, lat, lon)
        leaf = K.lat_lon_to_cell_id(lat[inside], lon[inside], 30)
        order = np.argsort(K.cell_id_range_min(cov) ^ np.uint64(1 << 63), kind="stable")
        lo = np.sort(K.cell_id_range_min(cov) ^ np.uint64(1 << 63))
        hi = (K.cell_id_range_max(cov) ^ np.uint64(1 << 63))[order]
        ls = leaf ^ np.uint64(1 << 63)
        idx = np.searchsorted(lo, ls, side="right") - 1
        ok = (idx >= 0) & (ls <= hi[np.clip(idx, 0, len(hi) - 1)])
        assert ok.all(), "polygon covering missed interior points"

    def exp10(cov):
        lvl = K.cell_id_to_level(cov).astype(int)
        return int((4 ** (10 - lvl)).sum())

    concave = [np.asarray(r, dtype=float) for r in E.PIP_POLYGONS[0]]
    assert exp10(polygon_covering(concave, max_level=10)) < 0.6 * exp10(
        polygon_bbox_covering(concave, max_level=10)
    )


def test_covering_superset_random_rects():
    rng = np.random.default_rng(99)
    for _ in range(4):
        lat0 = rng.uniform(-80, 70)
        lat1 = lat0 + rng.uniform(0.5, 12)
        lon0 = rng.uniform(-170, 150)
        lon1 = lon0 + rng.uniform(0.5, 18)
        cov = COV.latlng_rect_covering(lat0, lat1, lon0, lon1, max_level=10)
        plat = rng.uniform(lat0, lat1, 5000)
        plon = rng.uniform(lon0, lon1, 5000)
        leaf = K.lat_lon_to_cell_id(plat, plon, 30)
        lo = np.sort(K.cell_id_range_min(cov) ^ np.uint64(1 << 63))
        hi = np.sort(K.cell_id_range_max(cov) ^ np.uint64(1 << 63))
        ls = leaf ^ np.uint64(1 << 63)
        idx = np.searchsorted(lo, ls, side="right") - 1
        ok = (idx >= 0) & (ls <= hi[np.clip(idx, 0, len(hi) - 1)])
        assert ok.all()


def test_minhash_recall_and_precision(spark):
    """LSH recall vs exact shingle-Jaccard pairs at the query threshold:
    every reported pair must be exact-verified (precision 1.0 by
    construction); recall tolerance 0.8 at jacc>=0.5."""
    from s2cell_spark.operators.dedup import jaccard_pairs_exact, minhash_near_dup_pairs

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs_exact(docs, 5000).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_near_dup_pairs(docs, threshold_bp=5000).collect()
    }
    assert got <= exact  # verified pairs can never be false positives
    if exact:
        assert len(got & exact) / len(exact) >= 0.8


def test_salted_equi_join_identical_to_plain(spark):
    """salted_equi_join must produce the multiset of rows of the plain
    join on a hot-key fixture — inner and left, any salt count."""
    from s2cell_spark.operators.skewjoin import salted_equi_join

    fact = [("hot", i) for i in range(2000)] + [(f"k{i % 13}", 10_000 + i) for i in range(300)]
    dim = [("hot", "HOT"), ("k1", "one"), ("k2", "two"), ("nomatch", "x")]
    fdf = spark.createDataFrame(fact, "key string, val long")
    ddf = spark.createDataFrame(dim, "key string, attr string")
    for how in ("inner", "left"):
        want = sorted(
            map(tuple, fdf.join(ddf, on="key", how=how).collect())
        )
        for s in (1, 8, 32):
            got = sorted(
                map(tuple, salted_equi_join(fdf, ddf, "key", num_salts=s, how=how).collect())
            )
            assert got == want, f"how={how} num_salts={s}"
    with pytest.raises(ValueError):
        salted_equi_join(fdf, ddf, "key", how="full")


def test_jaccard_df_cap_kills_hot_shingle_blowup(spark):
    """Pathological Zipf fixture: every doc shares one boilerplate
    sentence ('all rights reserved ...' style), plus unique content. The
    uncapped pair unfold is O(n_docs^2) on the hot shingles; with the DF
    cap the hot shingles are dropped BEFORE pairing, the internal pair
    stage stays linear, and the result equals a brute-force Jaccard over
    the capped shingle sets."""
    import itertools

    boiler = "all rights reserved contact us terms of service"
    n = 60
    rows = [(i, f"{boiler} unique{i} alpha{i} beta{i} gamma{i} delta{i}") for i in range(n)]
    # two true near-dup docs sharing low-DF content
    rows += [(100, "the quick brown fox jumps over the lazy dog today"),
             (101, "the quick brown fox jumps over the lazy dog tonight")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    from s2cell_spark.operators import dedup as D

    cap = 5
    got = {
        (r["doc_a"], r["doc_b"]): r["jacc_bp"]
        for r in D.jaccard_pairs_exact(docs, 1000, max_df=cap).collect()
    }

    # brute-force oracle over capped shingle sets
    def shingles(t):
        ws = [w for w in __import__("re").split("[^a-z0-9]+", t.lower()) if w]
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    sets = {i: shingles(t) for i, t in rows}
    df_count: dict[str, int] = {}
    for s in sets.values():
        for sh in s:
            df_count[sh] = df_count.get(sh, 0) + 1
    capped = {i: {sh for sh in s if df_count[sh] <= cap} for i, s in sets.items()}
    want = {}
    for a, b in itertools.combinations(sorted(capped), 2):
        sa, sb = capped[a], capped[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if inter == 0:
            continue
        bp = (10000 * inter) // (len(sa) + len(sb) - inter)
        if bp >= 1000:
            want[(a, b)] = bp
    assert got == want
    assert (100, 101) in got  # the true near-dup pair survives the cap

    # the linearity claim, measured: the internal pair stage emits ZERO
    # rows for the boilerplate shingles (DF = 60 > cap), so total unfolded
    # pairs collapse from O(n^2 * hot_shingles) to the few content pairs
    base = D.shingled_docs(docs, max_df=cap)
    dw = base.select("doc", F.size("ws").alias("sz"), F.explode("ws").alias("w"))
    per_shingle = dw.groupBy("w").count()
    assert per_shingle.agg(F.max("count")).collect()[0][0] <= cap


def test_checkpoint_resume_byte_identical(spark, tmp_path):
    """t4: kill-between-stages resume — second run reuses stage 1's
    snapshot and final output is byte-identical."""
    from s2cell_spark.plans.checkpoint import CheckpointedPipeline

    root = str(tmp_path / "ckpt")

    def run(fail_stage2: bool):
        pipe = CheckpointedPipeline(spark, root)
        pages_df = pipe.stage(
            "encode",
            lambda: with_cell_id(load_pages(spark, SF_SMOKE)).repartition(4, "doc_id"),
            sort_cols=("doc_id",),
        )
        if fail_stage2:
            raise RuntimeError("simulated failure between stages")
        agg = pipe.stage(
            "rollup",
            lambda: pipe.read("encode")
            .groupBy((F.col("doc_id") % 7).alias("k"))
            .agg(
                F.count("*").alias("n"),
                # xor-fold: order-insensitive, overflow-free digest of cell IDs
                F.sum(F.col("cell_id") % 1000003).alias("s"),
            ),
            inputs=("encode",),
        )
        return pipe, agg

    with pytest.raises(RuntimeError):
        run(fail_stage2=True)
    pipe, agg = run(fail_stage2=False)
    assert any(m.get("resumed") for m in pipe.metrics if m["stage"] == "encode")
    first = sorted(map(tuple, agg.collect()))
    # a third run resumes everything and reproduces identical bytes
    pipe2, agg2 = run(fail_stage2=False)
    assert sorted(map(tuple, agg2.collect())) == first
    assert all(m.get("resumed") for m in pipe2.metrics)


def test_streaming_matches_batch(spark, tmp_path):
    """Structured-Streaming per-cell counts == the batch groupBy on the
    same input (processed as one file-source micro-batch)."""
    from s2cell_spark import functions as S2F
    from s2cell_spark.streaming.ingest import streaming_cell_counts

    src = str(tmp_path / "stream_src")
    load_pages(spark, SF_SMOKE).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    out = streaming_cell_counts(stream, level=4, window="24 hours", watermark="48 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("cellcounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["cell_token"], r["n_pages"])
        for r in spark.sql("select cell_token, n_pages from cellcounts").collect()
    }
    batch = with_cell_id(load_pages(spark, SF_SMOKE))
    parent = S2F.cell_id_to_parent_cell_id(F.col("cell_id"), 4)
    want = {
        (r["t"], r["n"])
        for r in batch.groupBy(S2F.cell_id_to_token(parent).alias("t"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want and len(want) > 0


def test_streaming_containment_matches_batch(spark, tmp_path):
    """Stream-static containment join (streamed pages vs broadcast
    covering dim) == the batch containment join + count on the same
    input, per region."""
    import __spark_entry__ as E
    from s2cell_spark.operators.containment import (
        containment_join_equi,
        normalized_coverings_df,
    )
    from s2cell_spark.streaming.ingest import streaming_containment_counts

    src = str(tmp_path / "stream_src2")
    load_pages(spark, SF_SMOKE).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    cov = normalized_coverings_df(spark, E._box_regions(), 10)
    out = streaming_containment_counts(
        stream, cov, level=10, window="24 hours", watermark="48 hours"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("contcounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["region_id"], r["n_pages"])
        for r in spark.sql("select region_id, n_pages from contcounts").collect()
    }
    batch = containment_join_equi(
        with_cell_id(load_pages(spark, SF_SMOKE)), spark, E._box_regions(), level=10
    )
    want = {
        (r["region_id"], r["n"])
        for r in batch.groupBy("region_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == want and len(want) > 0


def test_multimodal_features_deterministic(spark):
    from s2cell_spark.operators.multimodal import attach_fake_media, extract_features

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    media = attach_fake_media(docs)
    a = extract_features(media).orderBy("doc_id").collect()
    b = extract_features(media).orderBy("doc_id").collect()
    assert [r["feature"] for r in a] == [r["feature"] for r in b]
    assert all(r["decoded"] == "stub" for r in a)
    assert all(len(r["feature"]) == 16 for r in a)
    # frame sampling plan explodes video rows only
    from s2cell_spark.operators.multimodal import frame_sample_plan

    frames = frame_sample_plan(media, every_ms=10000)
    assert frames.count() > 0


def test_streaming_first_seen_dedups_across_batches(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: duplicates of a text_md5
    arriving in LATER micro-batches are suppressed by per-key state —
    each distinct md5 is emitted exactly once, with a doc from its group."""
    import glob
    import shutil

    from s2cell_spark.streaming.ingest import streaming_first_seen

    pages = load_pages(spark, SF_SMOKE).select("doc_id", "url", "text")
    src = str(tmp_path / "fs_src")
    # batch 1: docs 0..N/2 ; batch 2: docs N/4..N (overlap => cross-batch
    # duplicate text_md5s that MUST be suppressed)
    n = pages.count()
    pages.filter(F.col("doc_id") < n // 2).coalesce(1).write.mode("overwrite").parquet(src + "_a")
    pages.filter(F.col("doc_id") >= n // 4).coalesce(1).write.mode("overwrite").parquet(src + "_b")
    import os

    os.makedirs(src)
    shutil.copy(glob.glob(src + "_a/part-*.parquet")[0], src + "/batch_a.parquet")
    shutil.copy(glob.glob(src + "_b/part-*.parquet")[0], src + "/batch_b.parquet")

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_first_seen(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("firstseen")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select text_md5, doc_id from firstseen").collect()

    whole = spark.read.parquet(src).select(
        F.md5("text").alias("text_md5"), "doc_id"
    )
    groups = {}
    for r in whole.collect():
        groups.setdefault(r["text_md5"], set()).add(r["doc_id"])
    # exactly one emission per distinct md5 (state suppressed re-arrivals)
    assert sorted(r["text_md5"] for r in got) == sorted(groups)
    # and the keeper belongs to that md5's group
    assert all(r["doc_id"] in groups[r["text_md5"]] for r in got)
    assert len(got) < whole.count()  # the overlap really contained dups


def test_native_covering_expansion_matches_numpy(spark):
    """normalized_coverings_df's explode(sequence(...)) expansion must
    equal the numpy covering_to_level expansion cell-for-cell — including
    negative-long (face >= 4) coverings."""
    import numpy as np

    from s2cell_spark.operators import covering as COV
    from s2cell_spark.operators.containment import normalized_coverings_df

    regions = {
        0: COV.latlng_rect_covering(10.0, 25.0, 30.0, 55.0, max_level=8),
        1: COV.latlng_rect_covering(-40.0, -20.0, 110.0, 155.0, max_level=8),  # faces 4/5
    }
    native = {
        (r["region_id"], r["cov_cell"])
        for r in normalized_coverings_df(spark, regions, 8).collect()
    }
    want = {
        (rid, int(np.int64(np.uint64(c))))
        for rid, cells in regions.items()
        for c in COV.covering_to_level(cells, 8)
    }
    assert native == want and len(want) > 100


def test_iceberg_capability_gate_and_fallback(spark, tmp_path):
    """No Iceberg jars in this container: the capability probe must say
    so for any catalog name (configured or not), and a pipeline asked for
    an Iceberg catalog must degrade to the parquet+manifest path and
    still run end-to-end."""
    from s2cell_spark.plans.checkpoint import CheckpointedPipeline, iceberg_available

    assert iceberg_available(spark, "nosuchcatalog") is False
    # configured catalog but jar absent -> still unavailable
    spark.conf.set("spark.sql.catalog.fakeberg", "org.apache.iceberg.spark.SparkCatalog")
    try:
        assert iceberg_available(spark, "fakeberg") is False
        pipe = CheckpointedPipeline(spark, str(tmp_path / "ck"), catalog="fakeberg")
        assert pipe.use_iceberg is False
        out = pipe.stage("s1", lambda: spark.range(10).withColumnRenamed("id", "v"))
        assert out.count() == 10
        assert (tmp_path / "ck" / "s1" / "_LINEAGE.json").exists()
        # resume path reads the parquet snapshot back
        out2 = pipe.stage("s1", lambda: spark.range(10).withColumnRenamed("id", "v"))
        assert out2.count() == 10
        assert pipe.metrics[-1]["resumed"] is True
    finally:
        spark.conf.unset("spark.sql.catalog.fakeberg")


def test_checkpoint_recomputes_on_changed_plan(spark, tmp_path):
    """A stage whose build logic changed must NOT resume the stale
    snapshot (plan-fingerprint gate in the lineage manifest)."""
    from s2cell_spark.plans.checkpoint import CheckpointedPipeline

    root = str(tmp_path / "fp")
    docs = spark.range(100).withColumnRenamed("id", "doc_id")
    p1 = CheckpointedPipeline(spark, root)
    p1.stage("s", lambda: docs.filter(F.col("doc_id") % 2 == 0))
    p2 = CheckpointedPipeline(spark, root)
    out_same = p2.stage("s", lambda: docs.filter(F.col("doc_id") % 2 == 0))
    assert p2.metrics[0]["resumed"] is True
    assert out_same.count() == 50  # materialize before the overwrite below
    p3 = CheckpointedPipeline(spark, root)
    out_changed = p3.stage("s", lambda: docs.filter(F.col("doc_id") % 2 == 1))
    assert p3.metrics[0].get("resumed") is False
    assert out_changed.count() == 50 and {r["doc_id"] % 2 for r in out_changed.collect()} == {1}


def test_streaming_watermark_drops_late_data(spark, tmp_path):
    """Watermark semantics: an event older than (max seen ts - watermark)
    arriving in a LATER micro-batch must not re-open its closed window in
    append mode. Two separate availableNow runs share one checkpoint, so
    this also exercises state/watermark recovery from the commit log."""
    import glob
    import os
    import shutil
    from datetime import datetime

    from s2cell_spark.streaming.ingest import streaming_cell_counts

    def mk(rows):
        return spark.createDataFrame(
            rows, "url string, warc_ts timestamp, lat double, lon double"
        )

    t0 = datetime(2024, 1, 1, 0, 30)
    late = datetime(2024, 1, 1, 0, 15)   # same 00:00 window as t0
    ahead = datetime(2024, 1, 3, 0, 0)   # advances the watermark past t0
    b1 = mk([("a", t0, 10.0, 10.0), ("b", t0, 10.0, 10.0), ("c", ahead, 10.0, 10.0)])
    b2 = mk([("d", late, 10.0, 10.0)])   # late by ~2 days > 2h watermark

    src = str(tmp_path / "wm_src")
    ckpt = str(tmp_path / "wm_ckpt")
    os.makedirs(src)

    def drop_file(tag, df):
        tmp = src + "_" + tag
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], f"{src}/batch_{tag}.parquet")

    sink = str(tmp_path / "wm_sink")

    def run_once():
        stream = spark.readStream.schema(b1.schema).parquet(src)
        out = streaming_cell_counts(stream, level=4, window="1 hour", watermark="2 hours")
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drop_file("a", b1)
    run_once()   # watermark commits at ~Jan 2 22:00; 00:00 window emits
    drop_file("b", b2)
    run_once()   # late row is below the recovered watermark -> dropped

    rows = spark.read.parquet(sink).collect()
    counts = {}
    for r in rows:
        counts[r["window_start"]] = counts.get(r["window_start"], 0) + r["n_pages"]
    # the 00:00 window closed with 2 on-time pages and the late row neither
    # re-opened it nor produced a second emission
    assert counts.get(datetime(2024, 1, 1, 0, 0)) == 2
