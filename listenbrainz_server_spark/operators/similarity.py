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


def brute_force_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Exact cosine top-k neighbors for every vector (self-join).

    Norms precomputed; score rounded before ranking so ranking ties
    resolve identically across engines (tie-break: neighbor id).
    """
    v = vectors.select(
        F.col(id_col).alias("qid"),
        as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", norm(F.col("qv")))
    w = v.select(
        F.col("qid").alias("nid"), F.col("qv").alias("nv"), F.col("qn").alias("nn")
    )
    pairs = v.crossJoin(w).where(F.col("qid") != F.col("nid"))
    scored = pairs.select(
        "qid",
        "nid",
        F.round(dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), round_dp).alias(
            "score"
        ),
    )
    return top_k_per_group(
        scored,
        partition_by=["qid"],
        order_by=[F.col("score").desc(), F.col("nid")],
        k=k,
        rank_col="rank",
    ).withColumn("rank", F.col("rank").cast("bigint"))


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
    """ANN top-k within sign-LSH buckets: one projection pass, then an
    equi self-join on the signature, exact cosine re-rank inside."""
    v = vectors.select(
        F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv")
    )
    v = v.withColumn("sig", lsh_signature(F.col("qv"), dims, sig_bits)).withColumn(
        "qn", norm(F.col("qv"))
    )
    w = v.select(
        F.col("qid").alias("nid"),
        F.col("qv").alias("nv"),
        F.col("qn").alias("nn"),
        F.col("sig"),
    )
    pairs = v.join(w, "sig").where(F.col("qid") != F.col("nid"))
    scored = pairs.select(
        "qid",
        "nid",
        F.round(dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), round_dp).alias(
            "score"
        ),
    )
    return top_k_per_group(
        scored,
        partition_by=["qid"],
        order_by=[F.col("score").desc(), F.col("nid")],
        k=k,
        rank_col="rank",
    ).withColumn("rank", F.col("rank").cast("bigint"))
