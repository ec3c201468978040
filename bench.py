"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall-clock seconds.

Execution is measured with the noop sink (full plan runs, no driver
collect/serialization overhead).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from pytrousse_spark.session import get_spark

import __spark_entry__ as entrymod


def _build_10x_corpus(spark, sf_dir: str, tmp: str) -> None:
    """Materialize a 10x scale-up of documents/embeddings into ``tmp``.

    Replica construction: copy 0 is the original; copies 1-9 shift ids by a
    stride and suffix every 2nd token with a copy marker, which drops
    cross-copy 3-gram Jaccard to ~0.07 — BELOW the 0.2 near-dup threshold —
    so the corpus grows 10x in genuinely distinct documents instead of
    manufacturing quadratic duplicate cliques (that pathological variant is
    exercised separately; see PLANS.md). Embedding copies jitter each
    component by a deterministic +-0.03 so cell populations grow but planted
    neighborhoods survive.
    """
    from pyspark.sql import functions as F

    from pytrousse_spark.io import read_parquet_df

    docs = read_parquet_df(spark, f"{sf_dir}/documents.parquet")
    emb = read_parquet_df(spark, f"{sf_dir}/embeddings.parquet")
    d_stride = docs.agg(F.max("doc_id")).first()[0] + 1
    e_stride = emb.agg(F.max("vec_id")).first()[0] + 1

    d_parts = [docs]
    for i in range(1, 10):
        mut = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w, j: F.when(
                    j % 2 == 0, F.concat(w, F.lit(f"~{i}"))
                ).otherwise(w),
            ),
            " ",
        )
        d_parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * d_stride))
            .withColumn("text", mut)
        )
    big_docs = d_parts[0]
    for p in d_parts[1:]:
        big_docs = big_docs.unionByName(p)
    big_docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    e_parts = [emb]
    for i in range(1, 10):
        jit = F.transform(
            F.col("embedding"),
            lambda x, j: (
                x
                + ((F.col("vec_id") % 13 + F.lit(i) + j) % 7 - 3)
                * F.lit(0.01)
            ).cast("float"),
        )
        e_parts.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * e_stride))
            .withColumn("embedding", jit)
        )
    big_emb = e_parts[0]
    for p in e_parts[1:]:
        big_emb = big_emb.unionByName(p)
    big_emb.write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")

    # lineitem 10x for the mining-family headroom row (q132): baskets
    # replicate under shifted order keys while the part catalog stays
    # fixed — the pair space grows linearly with baskets, which is the
    # claim under test (basket-keyed self-join, not |items|^2)
    li = read_parquet_df(spark, f"{sf_dir}/lineitem.parquet")
    l_stride = li.agg(F.max("l_orderkey")).first()[0] + 1
    l_parts = [li] + [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * l_stride))
        for i in range(1, 10)
    ]
    big_li = l_parts[0]
    for p in l_parts[1:]:
        big_li = big_li.unionByName(p)
    big_li.write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")


def _headroom_10x(spark, big_dir: str) -> dict:
    """Scale-factor headroom evidence (round-2 VERDICT item 7): time the
    three shuffle-heaviest queries against the 10x corpus, so linear-scaling
    claims are recorded as numbers in BENCH_r{N}.json rather than prose."""
    out: dict[str, float] = {}
    for name in (
        "q59_clean_corpus",
        "q65_dup_clusters",
        "q57_ivf_topk",
        "q101_ivf_pq",
        "q132_association_rules",
    ):
        fn = getattr(entrymod, name)
        t0 = time.perf_counter()
        try:
            fn(spark, big_dir).write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:
            out[name] = -1.0
            print(f"bench headroom: {name} failed: {exc}", file=sys.stderr)
    return out


def _streaming_throughput(spark, big_dir: str, tmp: str) -> dict:
    """Stateful-streaming evidence (round-3 VERDICT item 7): drive
    ``near_dup_band_alerts`` as a REAL stream over the 10x documents corpus
    (8 files -> 8 micro-batches at maxFilesPerTrigger=1, availableNow) and
    record rows/s plus the state-store row count — the number that grounds
    the "state bounded by band count, not corpus size" claim.
    """
    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.streaming.neardup import near_dup_band_alerts

    try:
        docs = read_parquet_df(spark, f"{big_dir}/documents.parquet")
        n = docs.count()
        docs.repartition(8).write.mode("overwrite").parquet(f"{tmp}/stream_in")
        schema = spark.read.parquet(f"{tmp}/stream_in").schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/stream_in")
        )
        alerts = near_dup_band_alerts(src)
        t0 = time.perf_counter()
        q = (
            alerts.writeStream.format("noop")
            .option("checkpointLocation", f"{tmp}/stream_ck")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        state_rows = 0
        batches = 0
        for prog in q.recentProgress:
            batches += 1
            for op in prog.get("stateOperators") or []:
                state_rows = max(state_rows, op.get("numRowsTotal") or 0)
        return {
            "query": "near_dup_band_alerts",
            "input_rows": n,
            "micro_batches": batches,
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(n / wall, 1),
            "state_rows": state_rows,
        }
    except Exception as exc:
        print(f"bench streaming: failed: {exc}", file=sys.stderr)
        return {"query": "near_dup_band_alerts", "error": str(exc)[:200]}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="pytrousse-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = dict(entrymod.queries())
    # production-path variants (xxhash tier, raw BLAS) — timed, no oracle
    qs.update(entrymod.bench_extras())
    timings: dict[str, float] = {}
    # Warm the JVM + parquet footers once with the cheapest query.
    entrymod.q04_filter_agg(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    t_all = time.perf_counter()
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # keep the bench line parseable on failure
            timings[name] = -1.0
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 3)

    # 10x scale-up timings for the shuffle-heaviest queries + stateful
    # streaming throughput over the same corpus; kept OUTSIDE the headline
    # total so round-over-round comparisons stay apples-to-apples with
    # BENCH_r01/r02. Skippable for quick local iteration.
    headroom: dict[str, float] = {}
    streaming: dict = {}
    if os.environ.get("SPARK_GRAFT_SKIP_HEADROOM") != "1":
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp(prefix="pytrousse_headroom_")
        try:
            _build_10x_corpus(spark, sf_dir, tmp)
            headroom = _headroom_10x(spark, tmp)
            streaming = _streaming_throughput(spark, tmp, tmp)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "headroom_10x": headroom,
                "streaming": streaming,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
