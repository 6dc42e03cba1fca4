"""ML / linear-algebra queries (SURVEY.md §2.10): the CF pipeline
reproduced on the TPC-H-ish tables — customer≈user, part≈recording,
order lineitems≈listens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from listenbrainz_server_spark.catalog import load_table
from listenbrainz_server_spark.operators.ids import surrogate_ids_scalable
from listenbrainz_server_spark.queries import register


def _playcounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """user×item interaction counts (create_dataframes.py:166-183
    shape): customer bought part, capped confidence transform."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
        )
        .agg(F.count(F.lit(1)).alias("playcount"))
    )


# --------------------------------------------------------------------------
# M5: surrogate-id assignment — scalable zipWithIndex variant, checked
# against the windowed ROW_NUMBER oracle (same ids by construction).
# --------------------------------------------------------------------------
@register(
    "m_surrogate_ids",
    """
    SELECT c_custkey,
           CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT) AS spark_user_id
    FROM (SELECT DISTINCT c_custkey FROM customer)
    """,
    doc="M5 dense surrogate ids (scalable zipWithIndex == windowed row_number)",
)
def m_surrogate_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return surrogate_ids_scalable(cust, "c_custkey", "spark_user_id")


# --------------------------------------------------------------------------
# M4: user-user cosine similarity over interaction vectors — the
# DataFrame-native formulation of DIMSUM columnSimilarities
# (similarity/user.py:89-115): normalize per user, join on shared
# item, sum of products. Exact (threshold=0 DIMSUM), no sampling.
# --------------------------------------------------------------------------
@register(
    "m_user_cosine",
    """
    WITH pc AS (
        SELECT o_custkey AS user_id, l_partkey AS item_id, COUNT(*) AS playcount
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    norms AS (
        SELECT user_id, sqrt(SUM(playcount * playcount * 1.0)) AS nrm FROM pc GROUP BY 1
    ),
    dots AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               SUM(a.playcount * b.playcount * 1.0) AS dot
        FROM pc a JOIN pc b ON a.item_id = b.item_id AND a.user_id < b.user_id
        GROUP BY 1, 2
    )
    SELECT user_a, user_b, ROUND(dot / (na.nrm * nb.nrm), 6) AS similarity
    FROM dots
    JOIN norms na ON na.user_id = user_a
    JOIN norms nb ON nb.user_id = user_b
    WHERE dot / (na.nrm * nb.nrm) >= 0.3
    """,
    doc="M4 user-user cosine similarity (DIMSUM semantics, DataFrame-native)",
)
def m_user_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    pc = _playcounts(spark, sf_dir)
    norms = pc.groupBy("user_id").agg(
        F.sqrt(F.sum(F.col("playcount") * F.col("playcount") * F.lit(1.0))).alias("nrm")
    )
    a = pc.select(
        F.col("user_id").alias("user_a"), "item_id", F.col("playcount").alias("pc_a")
    )
    b = pc.select(
        F.col("user_id").alias("user_b"), "item_id", F.col("playcount").alias("pc_b")
    )
    dots = (
        a.join(b, "item_id")
        .where(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.sum(F.col("pc_a") * F.col("pc_b") * F.lit(1.0)).alias("dot"))
    )
    na = norms.select(F.col("user_id").alias("user_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("user_id").alias("user_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "user_a")
        .join(nb, "user_b")
        .withColumn("similarity_raw", F.col("dot") / (F.col("na") * F.col("nb")))
        .where(F.col("similarity_raw") >= 0.3)
        .select(
            "user_a", "user_b", F.round("similarity_raw", 6).alias("similarity")
        )
    )


# --------------------------------------------------------------------------
# M1-M3: implicit-feedback ALS train + batch inference
# (train_models.py:129-193, recommend.py:293-299). Iterative
# factorization — not SQL-expressible; the driver records a rows-only
# check (no oracle entry).
# --------------------------------------------------------------------------
@register(
    "m_als_recommend",
    None,
    doc="M1-M3 implicit ALS train + top-3 recommendations per user (rows-only check)",
)
def m_als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.recommendation import ALS

    pc = _playcounts(spark, sf_dir)
    # Confidence transform (create_dataframes.py:172-183: capped count).
    train = pc.select(
        F.col("user_id").cast("int").alias("user"),
        F.col("item_id").cast("int").alias("item"),
        F.least(F.col("playcount"), F.lit(20)).cast("float").alias("rating"),
    )
    als = ALS(
        rank=8,
        maxIter=5,
        regParam=0.1,
        alpha=1.0,
        implicitPrefs=True,
        seed=45,  # the reference's split seed (train_models.py:78)
        coldStartStrategy="drop",
        userCol="user",
        itemCol="item",
        ratingCol="rating",
    )
    model = als.fit(train)
    recs = model.recommendForAllUsers(3)
    return recs.select(
        F.col("user").cast("bigint").alias("user_id"),
        F.explode("recommendations").alias("rec"),
    ).select(
        "user_id",
        F.col("rec.item").cast("bigint").alias("item_id"),
        F.round(F.col("rec.rating").cast("double"), 4).alias("score"),
    )
