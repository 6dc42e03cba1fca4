"""Per-job time attribution for one registered query.

Runs a query (after one untimed warm-up, same as the bench) with the
DAGScheduler INFO log enabled and prints every Spark job's wall time
plus its job group/description, so a query's seconds can be attributed
to actions (count/collect/checkpoint/final noop write) instead of
guessed. Usage:

    python tools/profile_query.py <query_name> [more names...]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from listenbrainz_server_spark.queries import load_all
from listenbrainz_server_spark.session import get_session


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("profile")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # Warm the session the same way bench.py does.
    registry["a1_pricing_summary"].fn(spark, sf_dir).count()

    log4j = spark.sparkContext._jvm.org.apache.log4j  # noqa: SLF001
    dag_logger = log4j.LogManager.getLogger(
        "org.apache.spark.scheduler.DAGScheduler"
    )

    for name in names:
        # Untimed warm-up (cold mapInPandas worker spin-up etc.).
        registry[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()
        import gc

        gc.collect()

        dag_logger.setLevel(log4j.Level.INFO)
        t0 = time.time()
        registry[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.time() - t0
        dag_logger.setLevel(log4j.Level.ERROR)
        print(f"\n=== {name}: {wall:.2f} s (warm) ===", flush=True)
        spark.catalog.clearCache()
        gc.collect()


if __name__ == "__main__":
    main()
