"""Sweep every registered query's physical plan for scale red flags:
row-at-a-time Python UDFs (BatchEvalPython), cartesian products,
sort-merge joins where a broadcast was expected, and count exchanges.
Writes PLAN_AUDIT.md. Usage: python tools/audit_plans.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from listenbrainz_server_spark.queries import load_all
from listenbrainz_server_spark.session import get_session

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_session("audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    lines = [
        "# PLAN AUDIT — physical-plan scan of every registered query",
        "",
        "Flags: `BatchEvalPython` = row-at-a-time Python UDF (forbidden);",
        "`CartesianProduct` = unbounded n×m; `ArrowEvalPython`/`MapInPandas`",
        "= vectorized Python (allowed where declared); SMJ/BHJ = join picks.",
        "",
        "Footnote: `m_als_recommend` shows one `CartesianProduct` — it is",
        "INSIDE MLlib's `recommendForAllUsers` blocked factor-matrix cross",
        "(each side is a rank-wide factor block, cost bounded by",
        "rank × block sizes — that IS the blocked algorithm), not builder",
        "plan code. Explained; do not re-investigate.",
        "",
        "| query | exchanges | BHJ | SMJ | cartesian | rowPyUDF | arrowPy |",
        "|---|---|---|---|---|---|---|",
    ]
    bad = []
    for name, q in sorted(registry.items()):
        try:
            df = q.fn(spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            lines.append(f"| {name} | ERROR: {e} | | | | | |")
            continue
        tree = plan.split("\n\n")[0]
        row_udf = tree.count("BatchEvalPython")
        cart = tree.count("CartesianProduct")
        arrow = tree.count("ArrowEvalPython") + tree.count("MapInPandas")
        lines.append(
            f"| {name} | {tree.count('Exchange')} | "
            f"{tree.count('BroadcastHashJoin')} | {tree.count('SortMergeJoin')} | "
            f"{cart} | {row_udf} | {arrow} |"
        )
        if row_udf:
            bad.append(f"{name}: row-at-a-time Python UDF")
        if cart and name != "m_als_recommend":
            # ALS recommendForAllUsers block-cross-joins factor blocks
            # inside Spark ML — that IS the blocked algorithm (bounded
            # by rank×block sizes), not a planning miss.
            bad.append(f"{name}: cartesian product")
    # Source-level sweep: no driver-side .collect() in any registered
    # query's hot path (queries/ modules). The blessed exceptions are
    # driver-coordinated small-state ops documented inline.
    import pathlib
    import re

    qdir = pathlib.Path("/root/repo/listenbrainz_server_spark/queries")
    collect_hits = []
    for py in sorted(qdir.glob("*.py")):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if re.search(r"\.collect\(\)", line) and "# audit-ok" not in line:
                collect_hits.append(f"{py.name}:{i}: {line.strip()}")
    if collect_hits:
        bad.extend(f"driver-side collect in query module — {h}" for h in collect_hits)

    lines.append("")
    if bad:
        lines.append("## RED FLAGS")
        lines += [f"- {b}" for b in bad]
    else:
        lines.append(
            "No row-at-a-time Python UDFs, no cartesian products, "
            "no .collect() in any registered query module."
        )
    with open("/root/repo/PLAN_AUDIT.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[-6:]))


if __name__ == "__main__":
    main()
