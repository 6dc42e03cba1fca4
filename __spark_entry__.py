"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``listenbrainz_server_spark``; this module
just adapts the registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from listenbrainz_server_spark.queries import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the pricing-summary group-count
    workhorse (the A1 shape every reference stat is built on)."""
    registry = load_all()
    return registry["a1_pricing_summary"].fn(spark, SMOKE_SF_DIR)


# Round 3: the _EXPENSIVE demotion set is gone. It existed to let a
# time-budgeted sweep verify many cheap queries first, but by round 2
# it was starving exactly the never-verified tail (m_user_cosine,
# v_lsh_topk, mm_decode_features, x_chunked_pairs). With <40 names
# left unverified, never-verified-first ordering alone is correct.


def _verified_in_prior_rounds() -> set[str]:
    """Query names that already have a driver verdict in any
    CORRECTNESS_r*.json. Round 1's sweep stopped partway through the
    registry, so we surface never-verified queries first each round —
    the ordering rotates automatically as verdicts accumulate."""
    import glob
    import json

    seen: set[str] = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                seen.update(json.load(f).keys())
        except (OSError, ValueError):
            continue
    return seen


def _sweep_order() -> list[str]:
    names = sorted(load_all())
    seen = _verified_in_prior_rounds()
    key = lambda n: (n in seen, n)  # noqa: E731
    return sorted(names, key=key)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry = load_all()
    return {name: registry[name].fn for name in _sweep_order()}


def oracle_sql() -> dict[str, str]:
    registry = load_all()
    return {
        name: registry[name].oracle
        for name in _sweep_order()
        if registry[name].oracle is not None
    }
