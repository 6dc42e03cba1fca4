"""Blast-radius correctness of the standing sf0.1 gate (VERDICT r13 #2).

The gate is insurance only if its changed-module -> affected-names
computation cannot under-run. _stale_names fails SAFE on every
anomaly (unknown head, git error, non-query file -> full pass); the
one genuine under-run risk is cross-imports between query modules:
dedup.py / extras.py use text.py's _QUALITY_EXPR, handlers4.py uses
ml.py's user_cosine_pairs, api_variants.py uses handlers4's
_COSINE_PAIRS_SQL. These tests pin that the AST dependency map sees
those edges and that the expansion closes over them transitively, so
a text.py change re-gates the dependents too.

No Spark session needed — everything here is pure file/AST work.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from endround import _expand_query_deps, _query_module_deps  # noqa: E402

PKG = "listenbrainz_server_spark/queries"


def test_dependency_map_sees_known_edges():
    deps = _query_module_deps()
    # The four real edges in the codebase today. If one disappears
    # (helper moved/inlined), update BOTH the import and this pin.
    assert f"{PKG}/text.py" in deps[f"{PKG}/dedup.py"]
    assert f"{PKG}/text.py" in deps[f"{PKG}/extras.py"]
    assert f"{PKG}/ml.py" in deps[f"{PKG}/handlers4.py"]
    assert f"{PKG}/handlers4.py" in deps[f"{PKG}/api_variants.py"]


def test_dependency_map_covers_every_query_module():
    deps = _query_module_deps()
    pkg_dir = os.path.join(os.path.dirname(__file__), "..", PKG)
    expected = {
        f"{PKG}/{fn}" for fn in os.listdir(pkg_dir)
        if fn.endswith(".py") and fn != "__init__.py"
    }
    assert set(deps) == expected
    # `from listenbrainz_server_spark.queries import register` is a
    # PACKAGE import (__init__), not a module edge — it must not
    # self-link every module to a phantom queries.py.
    for f, ms in deps.items():
        assert f not in ms
        assert all(m.startswith(PKG + "/") for m in ms)


def test_expansion_is_transitive():
    deps = {
        "q/a.py": {"q/b.py"},   # a imports from b
        "q/b.py": {"q/c.py"},   # b imports from c
        "q/c.py": set(),
        "q/d.py": set(),
    }
    # c changed -> b (imports c) and a (imports b) are stale too.
    assert _expand_query_deps({"q/c.py"}, deps) == {
        "q/a.py", "q/b.py", "q/c.py",
    }
    # d changed -> nothing else depends on it.
    assert _expand_query_deps({"q/d.py"}, deps) == {"q/d.py"}
    # Leaf-only change propagates nowhere.
    assert _expand_query_deps({"q/a.py"}, deps) == {"q/a.py"}


def test_expansion_passes_non_query_files_through():
    deps = {"q/a.py": {"q/b.py"}, "q/b.py": set()}
    # An operators/ file is not in the map: it survives the expansion
    # unchanged so the caller's unknown-file branch still forces the
    # conservative FULL pass.
    out = _expand_query_deps(
        {"listenbrainz_server_spark/operators/joins.py"}, deps
    )
    assert out == {"listenbrainz_server_spark/operators/joins.py"}


def test_real_ml_change_reaches_api_variants():
    """The two-hop chain in the real map: ml.py -> handlers4.py ->
    api_variants.py. A change to ml.py must stale all three."""
    deps = _query_module_deps()
    out = _expand_query_deps({f"{PKG}/ml.py"}, deps)
    assert f"{PKG}/handlers4.py" in out
    assert f"{PKG}/api_variants.py" in out


def test_registry_files_live_in_the_queries_package():
    """_stale_names maps git-diff paths to registered names via
    inspect.getsourcefile + os.path.relpath. That only works if every
    registered query is DEFINED in the queries package (same
    coordinate system as the git paths). A registration that moves
    elsewhere would silently fall out of the file_to_names map and
    its module's changes would stop staling it."""
    import inspect

    from listenbrainz_server_spark.queries import load_all

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    registry = load_all()
    assert len(registry) >= 294
    for name, q in registry.items():
        src = inspect.getsourcefile(q.fn)
        rel = os.path.relpath(src, repo)
        assert rel.startswith(PKG + "/"), (
            f"{name} defined outside the queries package ({rel}) — "
            "the sf0.1 gate's blast radius no longer covers it"
        )
