"""Generate a 10× scale-validation dataset (≈sf1) from the driver's
sf0.1 fixtures, for the SCALING.md smoke (VERDICT r7 #3).

The driver only ships sf≤0.1; this derives an sf1-shaped dataset
WITHOUT touching /root/testdata (output under the repo, gitignored):

* ``orders``/``lineitem``/``customer``/``supplier``: 10 key-offset
  replicas — 10 disjoint copies of the trade graph / star schema
  (keys offset by replica × (max_key+1), every other column kept).
* ``documents``: 10 replicas; replica 0 is the original, replicas
  k>0 deterministically word-shuffle each text (order by
  md5(doc_id:k:pos:word)). The fixture's documents ARE random word
  sequences over a small vocabulary, so a per-replica reshuffle is
  distribution-faithful: term/char frequencies and doc lengths are
  preserved exactly, and cross-replica long-run collisions stay at
  the same by-chance rate as within the original corpus (replicating
  texts VERBATIM instead would manufacture 10-way exact duplicates
  and blow the span/dedup workloads quadratically — an adversarial
  skew, not a scale-up).
* ``embeddings``: 10 replicas with deterministic per-replica
  Gaussian jitter (σ=0.05, seed=replica) — same geometry, no exact
  duplicates.

Usage: python tools/gen_scale.py [out_dir]   (default .scale/sf1)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".scale/sf1")
    os.makedirs(out, exist_ok=True)
    from pyspark.sql import functions as F

    from listenbrainz_server_spark.catalog import load_table
    from listenbrainz_server_spark.session import get_session

    spark = get_session("gen_scale")

    def replicate_keys(name: str, key_cols: list[str]) -> None:
        df = load_table(spark, SRC, name)
        offsets = {c: df.agg(F.max(c)).collect()[0][0] + 1 for c in key_cols}
        reps = df.select(
            F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("_k"),
            *df.columns,
        )
        for c, off in offsets.items():
            reps = reps.withColumn(c, F.col(c) + F.col("_k") * F.lit(off))
        reps.drop("_k").write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: x{REPLICAS} with offsets {offsets}")

    replicate_keys("orders", ["o_orderkey", "o_custkey"])
    # l_partkey is NOT offset: part is copied verbatim below, so
    # offsetting would break the lineitem->part FK for 9/10 of derived
    # rows and silently shrink any part-join under the smoke (r8
    # review finding). Part-key reuse just makes each part 10x hotter,
    # which is the conservative direction for a scaling measurement.
    replicate_keys("lineitem", ["l_orderkey", "l_suppkey"])
    replicate_keys("customer", ["c_custkey"])
    replicate_keys("supplier", ["s_suppkey"])

    docs = load_table(spark, SRC, "documents")
    n_docs = docs.count()
    reps = docs.select(
        F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("_k"),
        *docs.columns,
    )
    exploded = reps.select(
        "_k", "doc_id", "lang", "source", "n_chars",
        F.posexplode(F.split("text", " ")).alias("pos", "word"),
    )
    # Deterministic keyed pseudo-shuffle: replica 0 keeps the original
    # order (sort by pos), k>0 sorts by a per-(doc, replica) hash.
    sort_key = F.when(
        F.col("_k") == 0, F.lpad(F.col("pos").cast("string"), 8, "0")
    ).otherwise(
        F.md5(F.concat_ws(":", "doc_id", "_k", "pos", "word"))
    )
    shuffled = (
        exploded.withColumn("_sk", sort_key)
        .groupBy("_k", "doc_id", "lang", "source", "n_chars")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_sk", "word"))),
                    lambda s: s["word"],
                ),
                " ",
            ).alias("text")
        )
    )
    shuffled.select(
        (F.col("doc_id") + F.col("_k") * F.lit(n_docs)).alias("doc_id"),
        "text", "lang", "source",
        F.length("text").cast("bigint").alias("n_chars"),
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print(f"documents: x{REPLICAS} word-shuffled")

    emb = load_table(spark, SRC, "embeddings")
    n_emb = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    jitter = (
        emb.select(
            F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("_k"),
            *emb.columns,
        )
        .select(
            (F.col("vec_id") + F.col("_k") * F.lit(n_emb)).alias("vec_id"),
            F.when(F.col("_k") == 0, F.col("embedding")).otherwise(
                # Deterministic jitter: hash-derived uniform in
                # [-0.05, 0.05) per element (seeded by vec_id:k:dim).
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x
                        + (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat_ws(
                                            ":",
                                            F.col("vec_id"),
                                            F.col("_k"),
                                            i.cast("string"),
                                        )
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("double")
                            / F.lit(4294967296.0)
                            - F.lit(0.5)
                        )
                        * F.lit(0.1)
                    ).cast(
                        "float"
                    ),
                )
            ).alias("embedding"),
            *[c for c in emb.columns if c not in ("vec_id", "embedding")],
        )
    )
    jitter.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    print(f"embeddings: x{REPLICAS} jittered")

    # events: 10 key-offset replicas (r9 — the event-based heavies
    # joined the smoke; a straight copy made their factors read ~1.0x
    # and measured nothing). user_id and event_id offset per replica,
    # ts/value kept verbatim: each replica is a disjoint user cohort
    # with identical per-user time series, so sessionization and
    # per-day volume scale exactly linearly — distribution-faithful.
    replicate_keys("events", ["event_id", "user_id"])

    # Small dims: straight copies (not scale-sensitive, but
    # load_table callers may expect them to exist).
    for name in ("region", "nation", "part"):
        load_table(spark, SRC, name).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
    print("dims copied")


if __name__ == "__main__":
    main()
