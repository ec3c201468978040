"""Isolated per-query measurement harness (guide §1): times each named
query with the noop sink on a fresh session, optionally dumps
``.explain("formatted")`` to a file.

Usage:
    python tools/measure.py q287_hits q117_pagerank [--reps 3]
        [--plans plans/r12 --suffix before]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one line per query: name, per-rep walls. Warm-up: q04 noop once.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pytrousse_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 3
    plans_dir = None
    suffix = "before"
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--plans":
            plans_dir = args[i + 1]; i += 2
        elif a == "--suffix":
            suffix = args[i + 1]; i += 2
        else:
            names.append(a); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="pytrousse-measure")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(entrymod.queries())
    try:
        qs.update(entrymod.bench_extras())
    except AttributeError:
        pass

    # warm the JVM + parquet footers
    entrymod.q04_filter_agg(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    results = {}
    for name in names:
        fn = qs[name]
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
        walls = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"measure:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        results[name] = walls
        print(json.dumps({"query": name, "walls": walls}), flush=True)
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
