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

    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
