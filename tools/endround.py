"""End-of-round artifact gate (VERDICT r5 #1): regenerate the three
at-head artifacts and REFUSE to pass unless each covers every
registered query.

    python tools/endround.py [round_number]

Runs, in order:
  1. tools/check.py --json CHECK_full_r{N}.json  (full oracle gate,
     sf0.01) — fails on any oracle mismatch;
  2. bench.py --all  (sf0.1) → BENCH_full_latest.json, heavies
     median-of-3 with per-run samples;
  3. tools/audit_plans.py → PLAN_AUDIT.md.

Then asserts len(artifact) == len(registry) for all three and exits
non-zero on any shortfall — the artifact-drift failure mode of rounds
3-5 (BENCH_full/PLAN_AUDIT missing final-commit queries, CHECK_full
never committed) becomes a hard error instead of a memory.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from listenbrainz_server_spark.queries import load_all  # noqa: E402


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "0"
    registry = load_all()
    n_reg = len(registry)
    print(f"registry: {n_reg} queries")
    check_path = os.path.join(REPO, f"CHECK_full_r{int(rnd):02d}.json")

    steps = [
        (
            "oracle gate",
            [sys.executable, os.path.join(REPO, "tools/check.py"),
             "/root/testdata/sf0.01", "--json", check_path],
        ),
        ("full bench", [sys.executable, os.path.join(REPO, "bench.py"), "--all"]),
        ("plan audit", [sys.executable, os.path.join(REPO, "tools/audit_plans.py")]),
    ]
    failures: list[str] = []
    for label, cmd in steps:
        print(f"== {label}: {' '.join(os.path.basename(c) for c in cmd[1:])}")
        r = subprocess.run(cmd, cwd=REPO)
        if r.returncode != 0:
            failures.append(f"{label} exited {r.returncode}")

    # Coverage assertions: every artifact must account for every name.
    with open(check_path) as f:
        check = json.load(f)
    n_check = len(check.get("queries", {}))
    if n_check != n_reg:
        failures.append(f"CHECK_full covers {n_check}/{n_reg}")
    if check.get("n_fail", 1) != 0:
        failures.append(f"CHECK_full has {check['n_fail']} oracle failures")

    with open(os.path.join(REPO, "BENCH_full_latest.json")) as f:
        bench = json.load(f)
    n_bench = len(bench.get("queries", {})) + len(bench.get("errors", {}))
    if n_bench != n_reg:
        failures.append(f"BENCH_full covers {n_bench}/{n_reg}")
    if bench.get("errors"):
        failures.append(f"BENCH_full errors: {sorted(bench['errors'])}")

    audit = open(os.path.join(REPO, "PLAN_AUDIT.md")).read()
    # Data rows only: the markdown header row ("| query | ...") also
    # starts with "| <word>" — counting it made a complete audit fail
    # 246/245 and would let an audit missing exactly one query pass.
    n_audit = len(re.findall(r"^\| (?!query \|)\w", audit, re.M))
    if n_audit != n_reg:
        failures.append(f"PLAN_AUDIT covers {n_audit}/{n_reg}")
    if "## RED FLAGS" in audit:
        failures.append("PLAN_AUDIT has red flags")

    if failures:
        print("ENDROUND FAIL:")
        for x in failures:
            print(" -", x)
        return 1
    print(
        f"ENDROUND OK: {n_reg} queries covered by "
        f"{os.path.basename(check_path)}, BENCH_full_latest.json, PLAN_AUDIT.md"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
