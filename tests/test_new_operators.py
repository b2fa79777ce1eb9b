"""Tests: multimodal plumbing, streaming extraction, DOM export,
embedding near-dup pairs."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lexor_spark import multimodal, sim
from lexor_spark.job import export_nodes, extract_pages
from lexor_spark.pages import pages_df
from lexor_spark.streaming import stream_extract

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------

def test_decode_payload_deterministic_shape():
    a = multimodal.decode_payload(b"hello world", 20, 10)
    b = multimodal.decode_payload(b"hello world", 20, 10)
    c = multimodal.decode_payload(b"hello world!", 20, 10)
    assert a.shape == (10, 20, 3) and a.dtype == np.uint8
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)  # payload-sensitive
    with pytest.raises(ValueError):
        multimodal.decode_payload(b"", 4, 4)


def test_media_features_end_to_end(spark):
    media = multimodal.media_df(spark, SF)
    feats = multimodal.image_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    assert all(r.ok for r in rows)
    # determinism across runs
    again = {r.media_id: r.phash for r in multimodal.image_features(media).collect()}
    for r in rows:
        assert again[r.media_id] == r.phash
    # error rows for hostile payloads, not task failures
    bad = spark.createDataFrame(
        [(1, "image", None, {"width": 4, "height": 4, "channels": 3,
                             "sample_rate": 0, "n_frames": 0})],
        multimodal.MEDIA_SCHEMA)
    brows = multimodal.image_features(bad).collect()
    assert len(brows) == 1 and not brows[0].ok and brows[0].err


def test_resize_and_frames(spark):
    media = multimodal.media_df(spark, SF).limit(30)
    resized = multimodal.resize_images(media, 8, 8).collect()
    assert all(r.ok for r in resized)
    assert all(len(r.payload) == 8 * 8 * 3 for r in resized)
    assert all(r.meta.width == 8 and r.meta.height == 8 for r in resized)

    frames = multimodal.sample_frames(multimodal.media_df(spark, SF), every_n=50)
    fr = frames.collect()
    assert fr, "video rows must yield frames"
    assert all(f.frame_no % 50 == 0 for f in fr)
    # one media's frames are distinct
    by_media: dict = {}
    for f in fr:
        by_media.setdefault(f.media_id, set()).add(f.frame_hash)
    some = next(iter(by_media.values()))
    assert len(some) >= 1


# ---------------------------------------------------------------------------
# streaming
# ---------------------------------------------------------------------------

def test_stream_extract_incremental_and_identical(spark, tmp_path):
    pages = pages_df(spark, SF)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")

    first = pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
    second = pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)
    first.write.mode("append").parquet(in_dir)

    n1 = stream_extract(spark, in_dir, out_dir, ck_dir, partitions=8)
    assert n1 >= 1
    got1 = spark.read.parquet(out_dir).count()
    assert got1 == first.count()

    # no new files -> nothing re-processed
    stream_extract(spark, in_dir, out_dir, ck_dir, partitions=8)
    assert spark.read.parquet(out_dir).count() == got1

    # new files appended -> only the delta is processed
    second.write.mode("append").parquet(in_dir)
    stream_extract(spark, in_dir, out_dir, ck_dir, partitions=8)
    streamed = spark.read.parquet(out_dir)
    assert streamed.count() == pages.count()

    # byte-identical to the batch job per url
    batch = {r.url: r.text for r in extract_pages(pages, partitions=8).collect()}
    for r in streamed.collect():
        assert batch[r.url] == r.text


# ---------------------------------------------------------------------------
# DOM export
# ---------------------------------------------------------------------------

def test_export_nodes_structure(spark):
    pages = pages_df(spark, SF).limit(50)
    nodes = export_nodes(pages, partitions=8)
    rows = nodes.collect()
    assert rows
    by_url: dict = {}
    for r in rows:
        by_url.setdefault(r.url, []).append(r)
    for url, ns in by_url.items():
        ids = {r.node_id for r in ns}
        assert len(ids) == len(ns), "node ids unique per url"
        roots = [r for r in ns if r.parent_id == -1]
        assert len(roots) == 1 and roots[0].name == "#document"
        for r in ns:
            if r.parent_id != -1:
                assert r.parent_id in ids
                assert r.parent_id < r.node_id  # preorder numbering
    # corpus-level query over the export: count <p> elements
    n_p = nodes.filter(F.col("name") == "p").count()
    assert n_p > 0


# ---------------------------------------------------------------------------
# embedding near-dup pairs
# ---------------------------------------------------------------------------

def test_cosine_dup_pairs(spark):
    pairs = sim.cosine_dup_pairs(spark, SF, threshold=0.25).collect()
    assert all(p.a < p.b for p in pairs)
    assert all(p.sim > 0.25 for p in pairs)


def test_stream_crawl_metrics_watermark(spark, tmp_path):
    from lexor_spark.streaming import stream_crawl_metrics

    pages = pages_df(spark, SF)
    in_dir = str(tmp_path / "win"); out_dir = str(tmp_path / "wout")
    ck = str(tmp_path / "wck")
    pages.write.mode("append").parquet(in_dir)
    stream_crawl_metrics(spark, in_dir, out_dir, ck, window="1 day",
                         watermark="1 hour")
    # second drain with no new data adds nothing
    stream_crawl_metrics(spark, in_dir, out_dir, ck, window="1 day",
                         watermark="1 hour")
    try:
        got = spark.read.parquet(out_dir)
    except Exception:
        got = None
    # append mode only emits FINALIZED windows; with availableNow +
    # watermark, all but the trailing window finalize. Verify the counts
    # that were emitted match a batch groupBy on the same windows.
    if got is not None and got.count() > 0:
        batch = (pages.groupBy(F.window("warc_ts", "1 day").alias("w"), "lang")
                 .agg(F.count("*").alias("n"))
                 .select(F.col("w.start").alias("window_start"), "lang", "n"))
        b = {(r.window_start, r.lang): r.n for r in batch.collect()}
        for r in got.collect():
            assert b[(r.window_start, r.lang)] == r.n_pages


def test_stream_sessions_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: two incremental drains must
    agree with the batch sessionization oracle over the full data."""
    from lexor_spark.queries import RELATIONAL_QUERIES
    from lexor_spark.streaming import stream_sessions

    events = spark.read.parquet(f"{SF}/events.parquet")
    in_dir = str(tmp_path / "ev"); out_dir = str(tmp_path / "sess")
    ck = str(tmp_path / "sck")

    # feed the stream in two chronological halves so state must carry over
    ts_sorted = sorted(r.ts for r in events.select("ts").collect())
    cut = F.lit(ts_sorted[len(ts_sorted) // 2])
    events.filter(F.col("ts") <= cut).write.mode("append").parquet(in_dir)
    stream_sessions(spark, in_dir, out_dir, ck)
    events.filter(F.col("ts") > cut).write.mode("append").parquet(in_dir)
    stream_sessions(spark, in_dir, out_dir, ck)

    got = spark.read.parquet(out_dir)
    # latest state row per user
    latest = {r.user_id: r for r in got.orderBy("n_events").collect()}
    batch = {r.user_id: r for r in
             RELATIONAL_QUERIES["event_sessions"](spark, SF).collect()}
    assert set(latest) == set(batch)
    for uid, b in batch.items():
        assert latest[uid].n_sessions == b.n_sessions, uid
        assert latest[uid].n_events == b.n_events, uid


def test_build_corpus_pipeline(spark):
    from lexor_spark.corpus import build_corpus, corpus_summary

    pages = pages_df(spark, SF)
    corpus, rejects = build_corpus(pages, min_quality=0.0, min_chars=10,
                                   jaccard_threshold=0.95)
    c = corpus.collect()
    r = rejects.collect()
    n_pages = pages.count()
    # conservation: every url lands exactly once in corpus or rejects
    urls = [x.url for x in c] + [x.url for x in r]
    assert len(urls) == n_pages
    assert len(set(urls)) == n_pages
    assert all(x.n_tokens > 0 for x in c)
    # summary (tuned thresholds) still conserves the page count
    summary = {(row.stage, row.outcome): row.n
               for row in corpus_summary(spark, SF).collect()}
    assert sum(summary.values()) == n_pages
    assert summary[("corpus", "kept")] > 0


# ---------------------------------------------------------------------------
# real codecs (BMP / PPM / WAV)
# ---------------------------------------------------------------------------

def test_bmp_roundtrip_exact():
    rng = np.arange(17 * 23 * 3, dtype=np.uint8).reshape(23, 17, 3)
    data = multimodal.encode_bmp(rng)
    assert data[:2] == b"BM"
    out = multimodal.decode_bmp(data)
    assert np.array_equal(out, rng)
    # sniffing dispatch picks the real decoder regardless of hints
    assert np.array_equal(multimodal.decode_payload(data, 4, 4), rng)


def test_ppm_roundtrip_exact():
    img = (np.arange(5 * 7 * 3, dtype=np.uint8) * 3 % 251).reshape(7, 5, 3)
    data = multimodal.encode_ppm(img)
    assert np.array_equal(multimodal.decode_ppm(data), img)
    assert np.array_equal(multimodal.decode_payload(data, 1, 1), img)


def test_wav_roundtrip_exact():
    t = np.arange(1000)
    samples = (3000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    data = multimodal.encode_wav(samples, 16000)
    arr, sr = multimodal.decode_wav(data)
    assert sr == 16000 and arr.shape == (1000, 1)
    assert np.array_equal(arr[:, 0], samples)


def test_media_real_decode_end_to_end(spark):
    media = multimodal.media_df_real(spark, SF)
    imgs = multimodal.image_features(
        media.filter(F.col("kind") == "image")).collect()
    assert imgs and all(r.ok for r in imgs)
    auds = multimodal.audio_features(media).collect()
    assert auds and all(r.ok for r in auds)
    assert all(r.sample_rate == 16000 and r.rms > 0 for r in auds)
    # deterministic across runs
    again = {r.media_id: r.phash for r in multimodal.image_features(
        media.filter(F.col("kind") == "image")).collect()}
    for r in imgs:
        assert again[r.media_id] == r.phash


def test_stream_dedup_cross_batch(spark, tmp_path):
    """State-backed streaming dedup: a page recrawled in a LATER
    micro-batch is dropped (the seen-fingerprint set lives in the
    checkpointed state store, not per-batch memory)."""
    from lexor_spark.streaming import stream_dedup

    pages = pages_df(spark, SF).limit(60)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    first = pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
    first.write.mode("append").parquet(in_dir)
    n1 = stream_dedup(spark, in_dir, out_dir, ck)
    assert n1 == first.count()

    # second feed = the SAME pages again plus genuinely new ones
    second_new = pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)
    first.write.mode("append").parquet(in_dir)        # recrawl duplicates
    second_new.write.mode("append").parquet(in_dir)   # fresh pages
    n2 = stream_dedup(spark, in_dir, out_dir, ck)
    assert n2 == second_new.count()  # duplicates from batch 1 dropped

    got = spark.read.parquet(out_dir)
    assert got.count() == pages.count()
    assert got.select("fp").distinct().count() == pages.count()


def test_ivf_matmul_assignment_matches_expression_path(spark):
    """The pandas-UDF GEMM cell assignment (production-m path) agrees
    exactly with ann_ivf's expression-based broadcast assignment."""
    from pyspark.sql import Window

    from lexor_spark.sim import assign_cells_matmul, cosine

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding")
    cents = (emb.filter(F.col("vec_id") < 16)
             .select(F.col("vec_id").alias("cid"),
                     F.col("embedding").alias("cv")))
    csim = F.round(cosine(F.col("embedding"), F.col("cv")), 6)
    w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), "cid")
    expr_path = (emb.crossJoin(F.broadcast(cents))
                 .select("vec_id", "cid", csim.alias("csim"))
                 .withColumn("rn", F.row_number().over(w))
                 .filter(F.col("rn") == 1)
                 .select("vec_id", "cid"))
    gemm_path = assign_cells_matmul(emb, cents)
    a = {r["vec_id"]: r["cid"] for r in expr_path.collect()}
    b = {r["vec_id"]: r["cid"] for r in gemm_path.collect()}
    assert a == b and len(a) == emb.count()


def test_bmv_container_roundtrip_and_seek():
    """BMV video container: frames round-trip exactly, frame seek walks
    length prefixes without full decode, truncation raises."""
    import numpy as np
    import pytest as _pytest

    from lexor_spark.multimodal import (decode_bmv_count, decode_bmv_frame,
                                        encode_bmv)

    frames = [np.full((4, 6, 3), k * 10, dtype=np.uint8) for k in range(5)]
    data = encode_bmv(frames)
    assert decode_bmv_count(data) == 5
    for k in (0, 2, 4):
        assert (decode_bmv_frame(data, k) == frames[k]).all()
    with _pytest.raises(IndexError):
        decode_bmv_frame(data, 5)
    with _pytest.raises(ValueError):
        decode_bmv_frame(data[:20], 1)
    with _pytest.raises(ValueError):
        decode_bmv_count(b"nope" + data)


def test_frame_sample_real_decodes(spark):
    """sample_frames over media_df_real REALLY decodes BMV frames: the
    emitted hash equals sha256 of the decoded pixels, recomputed here."""
    import hashlib

    import numpy as np  # noqa: F401

    from lexor_spark import multimodal

    media = multimodal.media_df_real(spark, SF)
    vids = media.filter(F.col("kind") == "video").limit(6).cache()
    got = multimodal.sample_frames(vids, every_n=3).collect()
    assert got
    payloads = {r["media_id"]: bytes(r["payload"]) for r in vids.collect()}
    for r in got[:10]:
        img = multimodal.decode_bmv_frame(payloads[r["media_id"]],
                                          r["frame_no"])
        assert r["frame_hash"] == hashlib.sha256(
            img.tobytes()).hexdigest()[:16]
    vids.unpersist()


def test_decode_payload_bmv_poster_frame():
    """decode_payload routes BMV before the BMP sniff (shared 'BM'
    prefix) and returns the first frame."""
    import numpy as np

    from lexor_spark.multimodal import decode_payload, encode_bmv

    frames = [np.full((4, 6, 3), k * 40, dtype=np.uint8) for k in range(3)]
    img = decode_payload(encode_bmv(frames), 6, 4)
    assert (img == frames[0]).all()


def test_sample_frames_truncated_payload_drops_whole_media(spark):
    """A truncated BMV must yield NO rows for that media (never a
    silent partial frame set), while intact media in the same batch
    sample normally."""
    import numpy as np

    from lexor_spark import multimodal

    frames = [np.full((4, 6, 3), k, dtype=np.uint8) for k in range(6)]
    good = multimodal.encode_bmv(frames)
    bad = good[:len(good) // 2]  # header intact, frames cut mid-container
    assert multimodal.decode_bmv_count(bad) == 6
    media = spark.createDataFrame(
        [(1, "video", bytearray(good), (6, 4, 3, 16000, 6)),
         (2, "video", bytearray(bad), (6, 4, 3, 16000, 6))],
        multimodal.MEDIA_SCHEMA)
    got = multimodal.sample_frames(media, every_n=2).collect()
    by_media = {}
    for r in got:
        by_media.setdefault(r["media_id"], []).append(r["frame_no"])
    assert sorted(by_media.get(1, [])) == [0, 2, 4]
    assert 2 not in by_media  # truncated media dropped whole


# ---------------------------------------------------------------------------
# spherical k-means (SemDeDup-style semantic clustering)
# ---------------------------------------------------------------------------

def test_kmeans_separates_obvious_clusters(spark):
    """Two clearly separated direction families must land in two
    clusters with every member assigned to its family's centroid."""
    import random
    rng = random.Random(7)
    rows = []
    for i in range(40):
        base = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 0.0, 0.0, 1.0]
        vec = [v + rng.uniform(-0.05, 0.05) for v in base]
        rows.append((i, vec))
    from lexor_spark.sim import kmeans_assign
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in kmeans_assign(emb, k=2, iters=4).collect()}
    assert len(out) == 40
    evens = {out[i].cluster for i in range(0, 40, 2)}
    odds = {out[i].cluster for i in range(1, 40, 2)}
    assert evens == {0} and odds == {1}
    assert all(r.sim > 0.99 for r in out.values())


def test_kmeans_partitioning_invariant(spark):
    """Same assignment under any input partitioning (round-6 projection
    each iteration keeps summation-order ulps out of the next round)."""
    import random
    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    from lexor_spark.sim import kmeans_assign
    schema = "vec_id long, embedding array<float>"
    a = {r.vec_id: (r.cluster, r.sim) for r in kmeans_assign(
        spark.createDataFrame(rows, schema).repartition(1), k=4).collect()}
    b = {r.vec_id: (r.cluster, r.sim) for r in kmeans_assign(
        spark.createDataFrame(rows, schema).repartition(13), k=4).collect()}
    assert a == b


def test_build_corpus_split_stage(spark):
    from lexor_spark.corpus import build_corpus

    pages = pages_df(spark, SF)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    corpus, _ = build_corpus(pages, min_quality=0.0, min_chars=10,
                             jaccard_threshold=0.95, split_weights=w)
    rows = corpus.collect()
    assert all(r.split in w for r in rows)
    # deterministic: same url -> same split on a re-run
    again = {r.url: r.split
             for r in build_corpus(pages, min_quality=0.0, min_chars=10,
                                   jaccard_threshold=0.95,
                                   split_weights=w)[0].collect()}
    assert all(again[r.url] == r.split for r in rows)


def test_semantic_dedup_keep_set(spark):
    from lexor_spark.sim import semantic_dedup
    rows = semantic_dedup(spark, SF, k=8, iters=2, threshold=0.25).collect()
    assert len(rows) == 500                       # every vector accounted for
    by_group = {}
    for r in rows:
        by_group.setdefault(r.group_id, []).append(r)
    for gid, members in by_group.items():
        assert gid == min(m.vec_id for m in members)
        assert sum(m.is_canonical for m in members) == 1
        assert all(m.group_size == len(members) for m in members)
    # duplicates exist in the synthetic embeddings at this threshold,
    # and the keep-set is strictly smaller than the corpus
    kept = sum(r.is_canonical for r in rows)
    assert 0 < kept < 500


def test_assign_nearest_routes_gemm_above_threshold(spark):
    """_assign_nearest with a declared m above MATMUL_M_THRESHOLD must
    route through the GEMM path (no BroadcastNestedLoopJoin in the
    plan) and agree with the expression path on every row."""
    from lexor_spark.sim import MATMUL_M_THRESHOLD, _assign_nearest

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding")
    m = MATMUL_M_THRESHOLD + 36  # 100 centroids: production-m shape
    cents = (emb.filter(F.col("vec_id") < m)
             .select(F.col("vec_id").alias("cid"),
                     F.col("embedding").alias("cv")))
    gemm = _assign_nearest(emb, cents, m=m)
    plan = gemm._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "NestedLoop" not in plan
    expr = _assign_nearest(emb, cents)  # m undeclared -> expression path
    eplan = expr._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in eplan
    a = {(r.vec_id): (r.cid, r.csim) for r in expr.collect()}
    b = {(r.vec_id): (r.cid, r.csim) for r in gemm.collect()}
    assert a == b and len(a) == emb.count()


def test_semantic_dedup_cluster_cap_bounds_pairs(spark):
    """Degenerate clustering (k=1: every vector in one cluster) with a
    cap below the corpus size must produce NO candidate pairs — every
    vector stays a singleton — instead of an O(n²) self-join."""
    from lexor_spark.sim import semantic_dedup

    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    rows = semantic_dedup(spark, SF, k=1, iters=1, threshold=0.25,
                          cluster_cap=n - 1).collect()
    assert len(rows) == n
    assert all(r.group_size == 1 and r.is_canonical for r in rows)
    # same k with the cap open: pairs exist (the cap was the only gate)
    open_rows = semantic_dedup(spark, SF, k=1, iters=1, threshold=0.25,
                               cluster_cap=n).collect()
    assert any(r.group_size > 1 for r in open_rows)


def test_pq_codes_shape_and_range(spark):
    """PQ codes: one row per vector, M codes each, all in [0, K)."""
    from lexor_spark.sim import PQ_CODEWORDS, PQ_SUBSPACES, pq_codes

    out = pq_codes(spark, SF).collect()
    assert len(out) == 500
    for r in out:
        codes = [int(c) for c in r["codes"].split("-")]
        assert len(codes) == PQ_SUBSPACES
        assert all(0 <= c < PQ_CODEWORDS for c in codes)


def test_pq_adc_tracks_true_distance(spark):
    """ADC is an approximation of true squared-L2: over the whole
    corpus the ADC estimate must correlate positively with the exact
    distance (the synthetic embeddings are near-isotropic, the hardest
    case for a 4×8 codebook — exactness across engines is pinned by the
    DuckDB value oracle, this guards the estimator's sanity), and the
    query's own ADC distance (its quantization error) must sit far
    below the corpus median."""
    import numpy as np

    from lexor_spark.sim import ann_pq

    got = ann_pq(spark, SF, query_id=0, topk=500).collect()
    emb = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in spark.read.parquet(f"{SF}/embeddings.parquet")
           .select("vec_id", "embedding").collect()}
    q = emb[0]
    adist = np.array([r["adist"] for r in got])
    true = np.array([float(((emb[r["vec_id"]] - q) ** 2).sum())
                     for r in got])
    corr = np.corrcoef(adist, true)[0, 1]
    assert corr > 0.5, corr
    own = next(r["adist"] for r in got if r["vec_id"] == 0)
    assert own < np.median(adist) / 2


def test_pq_rejects_indivisible_dim(spark):
    from lexor_spark.sim import pq_codes

    with pytest.raises(ValueError, match="not divisible"):
        pq_codes(spark, SF, m=5)


def test_ivfpq_prunes_probes_and_tracks_distance(spark):
    """IVF-PQ: only vectors in the query's nprobe cells appear (the
    IVF pruning), the query itself ranks first (residual quantization
    error ~0 beats every neighbour's), ADC over residual codes
    correlates with true squared-L2 on the probed subset, and the
    codebook is non-degenerate (guards the all-zero-residual seed
    regression: cell centroids' own residuals must NOT seed the PQ
    codebook)."""
    import numpy as np

    from lexor_spark.sim import ann_ivfpq

    got = ann_ivfpq(spark, SF, query_id=0, topk=500).collect()
    assert 0 < len(got) < 500  # pruned to the probed cells
    assert got[0]["vec_id"] == 0  # self-match first
    adist = np.array([r["adist"] for r in got])
    assert len(np.unique(adist)) > len(got) // 4  # non-collapsed codes
    emb = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in spark.read.parquet(f"{SF}/embeddings.parquet")
           .select("vec_id", "embedding").collect()}
    q = emb[0]
    true = np.array([float(((emb[r["vec_id"]] - q) ** 2).sum())
                     for r in got])
    corr = np.corrcoef(adist, true)[0, 1]
    assert corr > 0.5, corr


def test_ann_recall_bounds_and_methods(spark):
    """ann_recall: one row per index, recall in (0, 1]; every index
    finds at least the query itself (all three include the self-match
    in their candidate set), so recall >= 1/k."""
    from lexor_spark.sim import ann_recall

    rows = {r["method"]: r["recall"]
            for r in ann_recall(spark, SF, query_id=0, k=10).collect()}
    assert set(rows) == {"bucketed", "ivf", "ivfpq"}
    for method, rec in rows.items():
        assert 0.1 <= rec <= 1.0, (method, rec)
