"""Full-registry plan audit (guide §1): for EVERY declared query, build
the DataFrame and count plan-shape signals in .explain("formatted") —
parquet scans (duplicate-subtree smell), exchanges, broadcast nested
loops, global Sorts, and Python-eval nodes. Build-only: queries that
execute jobs at plan-build time still run them, so the audit doubles as
a smoke test. Prints one JSON line per query plus a flagged summary.

Usage: python tools/audit_plans.py [out.json]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
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
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_audit.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="pytrousse-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(entrymod.queries())
    rows = {}
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            p = buf.getvalue()
            rows[name] = {
                "scan_parquet": p.count("Scan parquet"),
                "scan_rdd": p.count("Scan ExistingRDD"),
                "exchange": p.count("+- Exchange")
                + p.count(":- Exchange"),
                "bnlj": p.count("BroadcastNestedLoopJoin"),
                "global_sort": p.count("Sort ["),
                "pyeval": p.count("BatchEvalPython")
                + p.count("ArrowEvalPython"),
                "mapinpandas": p.count("MapInPandas"),
                "build_sec": round(time.perf_counter() - t0, 2),
            }
        except Exception as exc:  # noqa: BLE001
            rows[name] = {"error": str(exc)[:200]}
        print(json.dumps({name: rows[name]}), flush=True)
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    flagged = {
        k: v
        for k, v in rows.items()
        if v.get("scan_parquet", 0) > 4 or v.get("pyeval", 0) > 0
    }
    print("FLAGGED:", json.dumps(flagged, indent=1))


if __name__ == "__main__":
    main()
