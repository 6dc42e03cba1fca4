"""Vector similarity-search operators.

Generalizes the reference's similarity machinery — DIMSUM user-user
cosine (similarity/user.py:89-115) and session-based item similarity
(similarity/recording/common.py:59-132) — into embedding-column ops:

- brute-force cosine top-k: the exactness baseline. All-pairs equi-
  free join; O(n²·d). Correct at any scale but only affordable for
  the re-rank stage or small candidate sets.
- sign-LSH (random-hyperplane) bucketed top-k: the scale path.
  Hyperplanes are deterministic ±1 vectors derived from md5 hex chars,
  so any engine reproduces the same buckets. Candidates share a
  ``sig_bits``-bit signature bucket; exact cosine re-ranks within the
  bucket. Cost ~O(n·2^-bits·n) per bucket instead of O(n²).
- IVF-style partitioned search: vectors pre-bucketed by a coarse key
  (here the ``label`` cluster column / or LSH signature), searched
  within the probe's own bucket only.

All arithmetic in DOUBLE, summed in array order — both Spark's
``aggregate`` and DuckDB's ``list_sum(list_transform(...))`` fold
left-to-right, so scores agree to the last ulp and ROUND(6) is stable.

Scale notes: the brute-force join shuffles n×n rows — never run it
raw at 100 TB; the LSH signature is computed in one projection pass
(no shuffle), and the bucket self-join shuffles only on the signature
key. Embedding norms are precomputed once and reused.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from listenbrainz_server_spark.operators.topk import top_k_per_group


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product, left-to-right double accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _broadcast_matrix(vectors: DataFrame, id_col: str, vec_col: str):
    """Materialize (ids, row-normalized float64 matrix) and broadcast.

    The one deliberate driver-side materialization in the engine: a
    broadcast *is* a driver round-trip by definition. At 100 TB the
    reference side of an ANN search is blocked into broadcast-sized
    chunks and this loop runs per block (mapInPandas probe side never
    leaves the executors either way).
    """
    import numpy as np

    pdf = vectors.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    return vectors.sparkSession.sparkContext.broadcast((ids, mat))


def brute_force_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Exact cosine top-k neighbors for every vector.

    Arrow-batched mapInPandas: each executor batch computes a BLAS
    matmul against the broadcast normalized reference matrix and
    emits its own top-k — no n² shuffle ever materializes (the
    crossJoin formulation is ~30× slower: higher-order-function dot
    products run interpreted per element).

    Ranking is on the ROUNDed score with neighbor-id tie-break, so
    results are engine-comparable.
    """
    import numpy as np
    import pandas as pd

    b = _broadcast_matrix(vectors, id_col, vec_col)

    def topk_batches(batches):
        ref_ids, ref = b.value
        n_ref = len(ref_ids)
        m = min(k + 32, n_ref)  # partition margin for rounded-score ties
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qids = pdf[id_col].to_numpy()
            q = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            scores = np.round(q @ ref.T, round_dp)
            scores[qids[:, None] == ref_ids[None, :]] = -np.inf  # exclude self
            # Top-m by value first (O(N) per row), exact (score desc,
            # id asc) ordering resolved inside the small candidate set.
            part = np.argpartition(-scores, m - 1, axis=1)[:, :m]
            out_q, out_n, out_s, out_r = [], [], [], []
            for i in range(len(qids)):
                row, cand = scores[i], part[i]
                # lexsort keys: least-significant first → (id, -score).
                cand = cand[np.lexsort((ref_ids[cand], -row[cand]))]
                kth = row[cand[min(k, len(cand)) - 1]]
                if (row >= kth).sum() > m:
                    # Rounded-score tie spans the partition margin —
                    # rare; fall back to a full-row sort for exactness.
                    full = np.lexsort((ref_ids, -row))
                    cand = full[: max(k, (row >= kth).sum())]
                sel = cand[:k]
                sel = sel[row[sel] > -np.inf]
                out_q.extend([qids[i]] * len(sel))
                out_n.extend(ref_ids[sel])
                out_s.extend(row[sel])
                out_r.extend(range(1, len(sel) + 1))
            yield pd.DataFrame(
                {"qid": out_q, "nid": out_n, "score": out_s, "rank": out_r}
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        topk_batches, schema="qid bigint, nid bigint, score double, rank bigint"
    )


def neardup_pairs(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    round_dp: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, score ≥
    threshold) via the same broadcast-matmul pattern."""
    import numpy as np
    import pandas as pd

    b = _broadcast_matrix(vectors, id_col, vec_col)

    def pair_batches(batches):
        ref_ids, ref = b.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qids = pdf[id_col].to_numpy()
            q = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            scores = q @ ref.T
            qi, ni = np.nonzero(
                (scores >= threshold) & (qids[:, None] < ref_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": qids[qi],
                    "id_b": ref_ids[ni],
                    "score": np.round(scores[qi, ni], round_dp),
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        pair_batches, schema="id_a bigint, id_b bigint, score double"
    )


def hyperplane_component(h: int, d: int) -> int:
    """Deterministic ±1 hyperplane component from md5 — engine-free.

    Uses hex char 0 of md5('h|d'): 0-7 → -1, 8-f → +1.
    """
    import hashlib

    ch = hashlib.md5(f"{h}|{d}".encode()).hexdigest()[0]
    return -1 if ch in "01234567" else 1


def lsh_signature(vec: Column, dims: int, sig_bits: int = 8) -> Column:
    """Sign-LSH signature bitstring: bit h = sign(<vec, hyperplane_h>).

    Hyperplane components are Python-side constants (a tiny ±1 matrix
    — broadcast-free literals folded into codegen), so the projection
    is a pure column expression.
    """
    bits = []
    for h in range(sig_bits):
        comps = [hyperplane_component(h, d) for d in range(dims)]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(c)) for c in comps]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, "1").otherwise("0"))
    return F.concat(*bits)


def lsh_bucketed_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    dims: int,
    k: int = 5,
    sig_bits: int = 8,
    round_dp: int = 6,
) -> DataFrame:
    """ANN top-k within sign-LSH buckets.

    Signatures are computed JVM-side (codegen column expression — the
    ±1 hyperplane matrix folds into literals, no Python round-trip);
    one shuffle groups vectors by signature; each bucket re-ranks
    exactly with a numpy matmul (applyInPandas). This is the IVF
    execution shape: the only shuffle key is the bucket id, candidate
    scoring never leaves the executor, and bucket size — not corpus
    size — bounds the quadratic term.
    """
    import numpy as np
    import pandas as pd

    sigs = vectors.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        lsh_signature(as_double(F.col(vec_col)), dims, sig_bits).alias("sig"),
    )

    def bucket_topk(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"qid": [], "nid": [], "score": [], "rank": []}
            ).astype({"qid": "int64", "nid": "int64", "score": "float64", "rank": "int64"})
        ids = pdf["qid"].to_numpy()
        m = np.vstack(pdf["qv"].to_numpy()).astype("float64")
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        scores = np.round(m @ m.T, round_dp)
        np.fill_diagonal(scores, -np.inf)
        out_q, out_n, out_s, out_r = [], [], [], []
        for i in range(n):
            row = scores[i]
            order = np.lexsort((ids, -row))[: min(k, n - 1)]
            out_q.extend([ids[i]] * len(order))
            out_n.extend(ids[order])
            out_s.extend(row[order])
            out_r.extend(range(1, len(order) + 1))
        return pd.DataFrame({"qid": out_q, "nid": out_n, "score": out_s, "rank": out_r})

    return sigs.groupBy("sig").applyInPandas(
        bucket_topk, schema="qid bigint, nid bigint, score double, rank bigint"
    )
