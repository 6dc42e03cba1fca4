"""Driver-contract smoke tests (mirrors the harness in tools/check.py,
which does the full oracle comparison; here: shape + determinism)."""

from __future__ import annotations

import importlib.util
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load_entry():
    spec = importlib.util.spec_from_file_location("entry_mod", REPO / "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_every_query_has_callable_and_most_have_oracles(spark):
    mod = _load_entry()
    qs, oracles = mod.queries(), mod.oracle_sql()
    assert len(qs) >= 50
    missing = set(oracles) - set(qs)
    assert not missing
    for name, fn in qs.items():
        assert callable(fn), name


def test_sweep_order_is_least_recently_verified():
    """VERDICT r3 #3: the sweep must front the stalest names (smallest
    last-verified round, never-verified = 0) so a 50-name/round driver
    budget rotates the whole registry every ~3 rounds."""
    mod = _load_entry()
    order = mod._sweep_order()
    last = mod._last_verified_round()
    ranks = [last.get(n, 0) for n in order]
    assert ranks == sorted(ranks)
    assert len(order) == len(set(order)) == len(mod.queries())


def test_failed_verdicts_front_the_sweep():
    """VERDICT r10 What's-wrong #1: an error / rows-only / mismatch
    verdict must NOT count as verified — only a full pass (no err,
    rows+schema+hash all true) bumps a name's last-verified round, so
    freshly-broken names front the queue instead of sorting to their
    error round."""
    mod = _load_entry()
    ok = {"rows_match": True, "schema_match": True, "hash_match": True,
          "spark_rows": 1, "oracle_rows": 1, "err": None}
    assert mod._is_pass(ok)
    assert not mod._is_pass({**ok, "err": "Traceback ..."})
    assert not mod._is_pass({**ok, "err": "no_oracle"})
    assert not mod._is_pass({**ok, "hash_match": False})
    assert not mod._is_pass({**ok, "rows_match": None, "schema_match": None,
                             "hash_match": None})
    assert not mod._is_pass(None)
    # Regression anchor: st_session_cdc errored in r9 and passed in r10,
    # so its last-verified round must be its last PASS round, never 9.
    last = mod._last_verified_round()
    if "st_session_cdc" in last:
        assert last["st_session_cdc"] != 9


def test_smoke_all_queries_run_at_sf0001(spark):
    """Every registered query must execute at the smoke scale."""
    mod = _load_entry()
    for name, fn in mod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name
