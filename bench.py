"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed to full materialization (count of a cached-free
plan — same work the correctness gate does, minus driver-side
collection of wide rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from listenbrainz_server_spark.queries import load_all
from listenbrainz_server_spark.session import get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # Warm the JVM + parquet footers once so per-query numbers measure
    # query execution, not session cold-start.
    registry["a1_pricing_summary"].fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, q in sorted(registry.items()):
        t0 = time.time()
        try:
            df = q.fn(spark, sf_dir)
            # Force full execution of every operator in the plan.
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001 — one bad query must not kill the bench
            errors[name] = str(e).splitlines()[0][:200]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
