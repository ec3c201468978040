"""Product quantization: code validity, ADC quality vs exact, guards."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pytrousse_spark import read_parquet_df
from pytrousse_spark.functions.vectors import dot
from pytrousse_spark.operators import quantization as pq
from tests.conftest import SF_DIR

S, C, DIM, K = 4, 8, 64, 5


@pytest.fixture(scope="module")
def emb(spark):
    return read_parquet_df(spark, f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def books(emb):
    return pq.pq_codebooks(emb, "vec_id", "embedding", num_sub=S, num_cent=C, dim=DIM)


def test_codebook_shape(books):
    assert len(books) == S
    for cb in books:
        assert [c for c, _ in cb] == list(range(1, C + 1))
        assert all(len(v) == DIM // S for _, v in cb)


def test_encode_codes_valid(emb, books):
    enc = pq.pq_encode(emb, "embedding", books)
    rows = enc.select("pq_code").collect()
    assert all(len(r["pq_code"]) == S for r in rows)
    assert all(1 <= c <= C for r in rows for c in r["pq_code"])


def test_adc_recall_against_exact_dot(emb):
    """ADC candidates + exact re-rank must recover most of the exact
    dot-product top-K; the floor is pinned so codebook/LUT/re-rank
    regressions surface. (Measured 0.84 at S=8/C=16/rerank=100 on the
    sf0.001 embeddings; raw ADC ranking alone is ~0.2 on this
    near-uniform data, which is why the re-rank stage exists.)"""
    kbooks = pq.pq_codebooks_kmeans(
        emb, "vec_id", "embedding", num_sub=8, num_cent=16, dim=DIM, iters=2
    )
    queries = emb.where("vec_id < 20")
    got = pq.pq_adc_topk(
        emb, queries, "vec_id", "embedding", kbooks, k=K, rerank=100
    )
    approx = {}
    for r in got.collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    q = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    exact_pairs = (
        emb.crossJoin(q)
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            dot(F.col("embedding"), F.col("qv")).alias("d"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("d"), "vec_id")
    exact = {}
    for r in exact_pairs.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= K
    ).collect():
        exact.setdefault(r["qid"], set()).add(r["vec_id"])
    recalls = [
        len(approx[qid] & exact[qid]) / K for qid in exact
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.6, f"mean recall@{K} collapsed: {mean_recall}"


def test_more_centroids_reduce_quantization_error(emb):
    def mean_err(c):
        books = pq.pq_codebooks(emb, "vec_id", "embedding", num_sub=S, num_cent=c, dim=DIM)
        enc = pq.pq_encode(emb, "embedding", books)
        # reconstruction error proxy: distance to the chosen centroid
        sub = DIM // S
        total = F.lit(0.0)
        for s in range(S):
            sv = F.slice(F.col("embedding"), s * sub + 1, sub)
            cases = F.when(F.lit(False), F.lit(0.0))
            err_terms = []
            for code, cv in books[s]:
                err_terms.append(
                    F.when(
                        F.col("pq_code")[s] == code,
                        pq._sub_dist2(sv, cv),
                    )
                )
            term = F.coalesce(*err_terms)
            total = total + term
        return enc.agg(F.avg(total)).first()[0]

    assert mean_err(32) < mean_err(2)


def test_lut_collect_guard(emb, books, spark):
    import pytrousse_spark.operators.quantization as q

    old = q.MAX_QUERY_COLLECT
    q.MAX_QUERY_COLLECT = 3
    try:
        with pytest.raises(ValueError, match="collect guard"):
            pq.pq_adc_topk(
                emb, emb.where("vec_id < 10"), "vec_id", "embedding", books
            )
    finally:
        q.MAX_QUERY_COLLECT = old


def test_kmeans_books_reduce_error_vs_hash_pick(emb):
    """Trained codebooks must beat the untrained hash-pick on
    reconstruction error (the property that motivated them)."""
    sub = DIM // S

    def mean_err(books):
        enc = pq.pq_encode(emb, "embedding", books)
        total = F.lit(0.0)
        for s in range(S):
            sv = F.slice(F.col("embedding"), s * sub + 1, sub)
            err_terms = [
                F.when(F.col("pq_code")[s] == code, pq._sub_dist2(sv, cv))
                for code, cv in books[s]
            ]
            total = total + F.coalesce(*err_terms)
        return enc.agg(F.avg(total)).first()[0]

    hash_books = pq.pq_codebooks(emb, "vec_id", "embedding", num_sub=S, num_cent=C, dim=DIM)
    km_books = pq.pq_codebooks_kmeans(
        emb, "vec_id", "embedding", num_sub=S, num_cent=C, dim=DIM, iters=2
    )
    assert mean_err(km_books) < mean_err(hash_books)


def test_dim_divisibility_guard(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_codebooks(emb, "vec_id", "embedding", num_sub=5, num_cent=C, dim=DIM)


def test_ivf_pq_recall_matches_ivf_at_equal_nprobe(emb, spark):
    """IVF-PQ (q101) probes the SAME cells as IVF-flat (q57); with rerank
    covering the candidate sets, its exact-cosine re-rank must recover at
    least IVF's recall@5 vs exhaustive cosine — the ADC stage may only
    drop candidates when rerank binds, never add noise past the re-rank."""
    from pytrousse_spark.operators import similarity as sim

    queries = emb.where("vec_id < 20")
    kbooks = pq.pq_codebooks_kmeans(
        emb, "vec_id", "embedding", num_sub=8, num_cent=16, dim=DIM, iters=1
    )

    def topsets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = topsets(sim.cosine_topk(emb, queries, K))
    ivf = topsets(sim.ivf_topk(emb, queries, K, num_cells=16, nprobe=4))
    ivfpq = topsets(
        pq.ivf_pq_topk(
            emb, queries, "vec_id", "embedding", kbooks,
            k=K, num_cells=16, nprobe=4, rerank=100,
        )
    )

    def recall(approx):
        vals = [
            len(approx.get(q, set()) & exact[q]) / K for q in exact
        ]
        return sum(vals) / len(vals)

    r_ivf, r_ivfpq = recall(ivf), recall(ivfpq)
    assert r_ivfpq >= r_ivf, f"IVF-PQ recall {r_ivfpq} < IVF {r_ivf}"
    # measured 0.5 for BOTH at num_cells=16/nprobe=4 on the 150-vector
    # sf0.001 corpus (probing 1/4 of the cells bounds recall; rerank=100
    # covers every candidate, so the two paths coincide exactly here)
    assert r_ivfpq >= 0.4, f"IVF-PQ recall collapsed: {r_ivfpq}"


def test_ivf_pq_rerank_caps_exact_work(emb):
    """The rerank knob must bound the exact-scored rows per query — the
    'less scored work' contract vs q57 (which exact-scores every
    co-located candidate)."""
    kbooks = pq.pq_codebooks_kmeans(
        emb, "vec_id", "embedding", num_sub=8, num_cent=16, dim=DIM, iters=0
    )
    queries = emb.where("vec_id < 10")
    out = pq.ivf_pq_topk(
        emb, queries, "vec_id", "embedding", kbooks,
        k=3, num_cells=4, nprobe=2, rerank=7,
    )
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert all(v <= 3 for v in per_q.values())
    # with rerank < k the output itself must shrink to rerank
    out2 = pq.ivf_pq_topk(
        emb, queries, "vec_id", "embedding", kbooks,
        k=5, num_cells=4, nprobe=2, rerank=2,
    )
    per_q2 = {}
    for r in out2.collect():
        per_q2[r["query_id"]] = per_q2.get(r["query_id"], 0) + 1
    assert all(v <= 2 for v in per_q2.values())


def test_sq8_encode_and_recall(spark):
    """Int8 scalar quantization: codes bounded to [-127, 127], scales
    cancel in the cosine (pure integer folds), zero vectors handled,
    and recall@5 vs the exact float top-k stays high on the embeddings
    fixture (int8 is a fine-grained quantizer — expect >= 0.8)."""
    from pyspark.sql import functions as F

    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.quantization import (
        sq8_cosine_topk,
        sq8_encode,
    )
    from pytrousse_spark.operators.similarity import cosine_topk

    e = read_parquet_df(spark, "/root/testdata/sf0.001/embeddings.parquet")
    enc = sq8_encode(e).select("vec_id", "sq8_scale", "sq8_codes")
    row = enc.where(F.col("vec_id") == 0).collect()[0]
    assert max(abs(c) for c in row["sq8_codes"]) <= 127
    assert row["sq8_scale"] > 0
    # zero vector -> zero scale, zero codes
    z = spark.createDataFrame(
        [(99, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    zr = sq8_encode(z).collect()[0]
    assert zr["sq8_scale"] == 0.0 and list(zr["sq8_codes"]) == [0, 0, 0]

    q = e.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(e, q, 5).collect()
    }
    quant = {
        (r["query_id"], r["neighbor_id"])
        for r in sq8_cosine_topk(e, 5, query_ids_below=10).collect()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, recall
