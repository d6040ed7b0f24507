"""Training-data pipeline operators: text analysis, similarity search,
multimodal plumbing, dedup."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from movingspark import ingest, media, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat and the dog went to the market in town", "en"),
        (2, "der hund und die katze das ist gut und der rest", "de"),
        (3, "the cat and the dog went to the market in town", "en"),  # exact dup of 1
        (4, "zzz qqq", "und"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_lang_id(spark, docs):
    out = docs.select("doc_id", text.lang_id_expr(F.col("text")).alias("pred"))
    got = {r["doc_id"]: r["pred"] for r in out.collect()}
    assert got[1] == "en" and got[2] == "de" and got[4] == "und"


def test_token_counts_and_quality(spark, docs):
    out = docs.select(
        "doc_id",
        text.token_count_expr(F.col("text")).alias("n"),
        text.bpe_ish_token_count_expr(F.col("text")).alias("nb"),
        text.quality_score_expr(F.col("text")).alias("q"),
    ).collect()
    by = {r["doc_id"]: r for r in out}
    assert by[1]["n"] == 11
    assert by[1]["nb"] >= 11
    assert by[4]["q"] < by[1]["q"]


def test_fingerprint_dedup(spark, docs):
    out = (
        docs.withColumn("fp", text.fingerprint_expr(F.col("text")))
        .groupBy("fp")
        .count()
        .filter(F.col("count") > 1)
        .collect()
    )
    assert len(out) == 1 and out[0]["count"] == 2


def test_simhash_similar_docs_close(spark, docs):
    out = docs.select("doc_id", text.simhash_expr(F.col("text")).alias("h")).collect()
    by = {r["doc_id"]: r["h"] for r in out}
    assert by[1] == by[3]  # identical text -> identical simhash
    assert by[1] != by[4]


def test_ngram_jaccard_pairs(spark, docs):
    pairs = text.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1, 3)}
    assert pairs[0]["jaccard"] == 1.0


def test_brute_force_topk(spark):
    rows = [(i, [float(i), 1.0]) for i in range(20)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.brute_force_topk(corpus, {0: np.array([0.0, 1.0])}, k=3)
    got = [r["vec_id"] for r in out.orderBy("rk").collect()]
    assert got[0] == 1  # most aligned with (0,1) excluding self


def test_ivf_topk_recall(spark):
    rng = np.random.RandomState(7)
    X = rng.randn(200, 8)
    rows = [(i, X[i].tolist()) for i in range(200)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = {0: X[0], 5: X[5]}
    brute = similarity.brute_force_topk(corpus, queries, k=5)
    ivf = similarity.ivf_topk(corpus, queries, k=5, n_centroids=8, nprobe=4)
    b = {(r["query_id"], r["vec_id"]) for r in brute.collect()}
    i = {(r["query_id"], r["vec_id"]) for r in ivf.collect()}
    recall = len(b & i) / len(b)
    assert recall >= 0.6  # approximate path finds most true neighbors


def test_embedding_near_dups(spark):
    base = np.array([1.0, 2.0, 3.0, 4.0])
    rows = [
        (1, base.tolist()),
        (2, (base * 1.001).tolist()),  # near-dup (same direction)
        (3, [4.0, -3.0, 2.0, -1.0]),
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.embedding_near_dups(corpus, threshold=0.99)
    got = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert got == {(1, 2)}


def test_media_pipeline(spark):
    docs = ingest.synth_interleaved_docs(spark, 20)
    refs = media.media_refs_from_docs(docs)
    n_refs = refs.count()
    assert n_refs > 0
    with_bytes = media.synth_media_bytes(refs, n_bytes=32)
    feats = media.extract_media_features(with_bytes, dim=8)
    rows = feats.collect()
    assert len(rows) == n_refs
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(r["n_bytes"] == 32 for r in rows)
    # deterministic: same ref -> same hash
    again = {r["media_ref"]: r["content_hash"] for r in media.extract_media_features(with_bytes, dim=8).collect()}
    assert all(again[r["media_ref"]] == r["content_hash"] for r in rows)


def test_frame_sample_plan(spark):
    docs = ingest.synth_interleaved_docs(spark, 5)
    refs = media.media_refs_from_docs(docs)
    plan = media.frame_sample_plan(refs, every_n=10)
    rows = plan.collect()
    assert len(rows) >= refs.count()
    assert all(r["frame_index"] % 10 == 0 for r in rows)
