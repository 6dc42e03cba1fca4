"""Scale-validation smoke (VERDICT r7 #3): run the scale-sensitive
heavies at sf0.1 and at the derived sf1 (tools/gen_scale.py, 10× rows)
and record the wall-time scaling factor. Near-linear (≲12×) validates
the "plans survive a scale-up" claim; a superlinear factor names a
fix task.

Usage: python tools/scaling_smoke.py [--runs N]   (writes SCALING.md)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAVIES = [
    "v_ivfpq_topk",
    "d_substring_spans",
    "d_exact_substring_pairs",
    "t_tfidf_cosine_pairs",
    "v_range_search",
    "g_pagerank",
    # r8 additions: wedge enumeration (density-sensitive threshold),
    # gram-explode importance weights, cluster-bounded semantic dedup.
    "g_triangle_count",
    "x_dsir_weights",
    "d_semdedup",
    # the scale path for the quadratic t_tfidf_cosine_pairs — keep its
    # factor in the artifact next to the uncapped diagnosis.
    "t_tfidf_cosine_pairs_capped",
]
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scale/sf1")


def main() -> None:
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])

    from listenbrainz_server_spark.queries import load_all
    from listenbrainz_server_spark.session import get_session

    if not os.path.isdir(SF1):
        sys.exit(f"{SF1} missing — run tools/gen_scale.py first")
    spark = get_session("scaling_smoke")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    results: dict[str, dict] = {}
    for name in HEAVIES:
        fn = reg[name].fn
        fn(spark, "/root/testdata/sf0.01").count()  # warm code paths
        per_sf: dict[str, dict] = {}
        for label, sf in (("sf0.1", SF01), ("sf1", SF1)):
            samples = []
            for _ in range(runs):
                spark.catalog.clearCache()
                t = time.time()
                fn(spark, sf).count()
                samples.append(round(time.time() - t, 2))
            per_sf[label] = {
                "median": statistics.median(samples),
                "samples": samples,
            }
        factor = round(per_sf["sf1"]["median"] / per_sf["sf0.1"]["median"], 2)
        results[name] = {**per_sf, "factor": factor}
        print(
            f"{name}: sf0.1 {per_sf['sf0.1']['median']}s  "
            f"sf1 {per_sf['sf1']['median']}s  factor {factor}x"
        )

    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump({"runs": runs, "queries": results}, f, indent=1)
    print("wrote SCALING.json — now edit SCALING.md with the analysis")


if __name__ == "__main__":
    main()
