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
# Default per-item degree cap for the cosine self-join. 20 follows the
# reference's own magnitude-capping precedent (the LEAST(listen_count,
# cap) rule, sitewide/entity.py:50-59) applied on the item axis; at
# 100 TB one viral item otherwise contributes |users(item)|²/2 pairs.
_ITEM_DEGREE_CAP = 20


def user_cosine_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.15,
    item_degree_cap: int | None = _ITEM_DEGREE_CAP,
) -> DataFrame:
    """Cosine pairs (user_a < user_b, similarity_raw ≥ threshold).

    ``item_degree_cap``: per-item cap on participating users — the
    shared-item self-join generates |users(item)|²/2 rows per item, so
    one viral item is a straight scale-killer at 100×. Capping keeps
    the top-C users per item by playcount (deterministic user tie-break)
    before the join — the reference's own per-user LEAST cap precedent
    (sitewide/entity.py:50-59) applied on the item axis; DIMSUM's
    sampling bounds the same term probabilistically.

    The cap is ON by default (VERDICT r2 #3): every serving path —
    ``similarity.similar_users`` dispatch, ``h_similar_users``, the
    bench headline — runs the bounded plan. Pass ``None`` explicitly
    for the exact all-pairs form (oracle fixture
    ``m_user_cosine_uncapped`` only).
    """
    pc = _playcounts(spark, sf_dir)
    return cosine_pairs_from_playcounts(pc, threshold, item_degree_cap)


def cosine_pairs_from_playcounts(
    pc: DataFrame,
    threshold: float = 0.15,
    item_degree_cap: int | None = _ITEM_DEGREE_CAP,
) -> DataFrame:
    """Core of ``user_cosine_pairs``, taking a (user_id, item_id,
    playcount) frame directly — unit tests feed skewed fixtures here.
    """
    # The playcount frame feeds three branches (norms, and — through
    # the degree-cap window — both sides of the shared-item self-join);
    # pin it once so the upstream scan→join→agg lineage executes a
    # single time. ~|interactions| rows of 3 narrow columns.
    pc = pc.localCheckpoint(eager=True)
    # Norms over the FULL vector (capping affects candidate pairs, not
    # the definition of a user's vector length).
    norms = pc.groupBy("user_id").agg(
        F.sqrt(F.sum(F.col("playcount") * F.col("playcount") * F.lit(1.0))).alias("nrm")
    )
    joined_pc = pc
    if item_degree_cap is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("item_id").orderBy(
            F.col("playcount").desc(), F.col("user_id")
        )
        # NOT pinned (r15, measured): the cap window's exchange is
        # partitioned by item_id — exactly the self-join key — so both
        # join sides reuse that partitioning and the join adds no
        # exchange of its own. A localCheckpoint here breaks that
        # property and forces two fresh item_id exchanges; interleaved
        # A/B read 1.21x SLOWER with the pin (m_user_cosine_capped
        # 3.13 -> 3.80 s, api_similar_users_top1 3.00 -> 3.64 s,
        # plans/r15/AB_pins_batch1.json). The duplicated window
        # subtree is the cheaper of the two evils.
        joined_pc = (
            pc.withColumn("_idr", F.row_number().over(w))
            .where(F.col("_idr") <= item_degree_cap)
            .drop("_idr")
        )
    a = joined_pc.select(
        F.col("user_id").alias("user_a"), "item_id", F.col("playcount").alias("pc_a")
    )
    b = joined_pc.select(
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
        .where(F.col("similarity_raw") >= threshold)
    )


_COSINE_SQL = """
    WITH pc AS (
        SELECT o_custkey AS user_id, l_partkey AS item_id, COUNT(*) AS playcount
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    {capped_pc}
    norms AS (
        SELECT user_id, sqrt(SUM(playcount * playcount * 1.0)) AS nrm FROM pc GROUP BY 1
    ),
    dots AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               SUM(a.playcount * b.playcount * 1.0) AS dot
        FROM {pair_src} a JOIN {pair_src} b
          ON a.item_id = b.item_id AND a.user_id < b.user_id
        GROUP BY 1, 2
    )
    SELECT user_a, user_b, ROUND(dot / (na.nrm * nb.nrm), 6) AS similarity
    FROM dots
    JOIN norms na ON na.user_id = user_a
    JOIN norms nb ON nb.user_id = user_b
    WHERE dot / (na.nrm * nb.nrm) >= 0.15
"""


@register(
    "m_user_cosine_uncapped",
    _COSINE_SQL.format(capped_pc="", pair_src="pc"),
    doc="M4 exact all-pairs cosine — oracle fixture only; the serving "
    "default is the degree-capped plan (m_user_cosine_capped)",
)
def m_user_cosine_uncapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_cosine_pairs(spark, sf_dir, threshold=0.15, item_degree_cap=None).select(
        "user_a", "user_b", F.round("similarity_raw", 6).alias("similarity")
    )


@register(
    "m_user_cosine_capped",
    _COSINE_SQL.format(
        capped_pc=f"""
    capped AS (
        SELECT user_id, item_id, playcount FROM (
            SELECT user_id, item_id, playcount,
                   ROW_NUMBER() OVER (
                       PARTITION BY item_id
                       ORDER BY playcount DESC, user_id
                   ) AS idr
            FROM pc
        ) WHERE idr <= {_ITEM_DEGREE_CAP}
    ),""",
        pair_src="capped",
    ),
    doc="M4 cosine with per-item degree cap — bounds the |users(item)|² "
    "hot-item pair blowup (the A3/LEAST cap precedent on the item axis)",
)
def m_user_cosine_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_cosine_pairs(
        spark, sf_dir, threshold=0.15, item_degree_cap=_ITEM_DEGREE_CAP
    ).select("user_a", "user_b", F.round("similarity_raw", 6).alias("similarity"))


# --------------------------------------------------------------------------
# M1-M3: implicit-feedback ALS train + batch inference
# (train_models.py:129-193, recommend.py:293-299). Iterative
# factorization — not SQL-expressible; the driver records a rows-only
# check (no oracle entry).
# --------------------------------------------------------------------------
@register(
    "m_als_recommend",
    """
    WITH pc AS (
        SELECT o_custkey AS user_id, l_partkey AS item_id, COUNT(*) AS playcount
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    )
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(3 AS BIGINT) AS k,
           TRUE AS k_per_user,
           TRUE AS items_from_catalog
    FROM pc
    """,
    doc="M1-M3 implicit ALS train + top-3 recommendations per user; "
    "registered form is the hash-gated serving audit (factorization "
    "scores aren't SQL-reproducible): every interacting user got "
    "exactly 3 recs and every recommended item exists in the "
    "interaction catalog; serving form = als_recommend_raw",
)
def m_als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    pc = _playcounts(spark, sf_dir)
    recs = als_recommend_raw(spark, sf_dir).localCheckpoint(eager=True)
    per_user = recs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_recs"))
    items = pc.select(F.col("item_id").cast("bigint")).distinct()
    audit = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_served"),
        F.every(F.col("n_recs") == 3).alias("three_each"),
    )
    catalog_ok = (
        recs.join(items, "item_id", "left_anti")
        .agg((F.count(F.lit(1)) == 0).alias("items_from_catalog"))
    )
    n_users = pc.agg(
        F.count_distinct("user_id").cast("bigint").alias("n_users")
    )
    return (
        n_users.crossJoin(F.broadcast(audit))
        .crossJoin(F.broadcast(catalog_ok))
        .select(
            "n_users",
            F.lit(3).cast("bigint").alias("k"),
            (F.col("three_each") & (F.col("n_served") == F.col("n_users"))).alias(
                "k_per_user"
            ),
            "items_from_catalog",
        )
    )


def als_serving_fit(spark: SparkSession, sf_dir: str):
    """Fit THE serving-form implicit-ALS model (single-sourced so the
    numpy-replay pin in tests/test_als_replay.py audits exactly the
    model ``als_recommend_raw`` serves — MLlib factor init depends on
    seed AND input block structure, so a test refitting with 'the same
    params' on its own frame could silently audit a different model).
    Returns the fitted ALSModel."""
    from pyspark.ml.recommendation import ALS

    pc = _playcounts(spark, sf_dir)
    # Confidence transform (create_dataframes.py:172-183: capped count).
    # localCheckpoint: ALS's internal block construction evaluates the
    # input lineage more than once (user/item block building + the
    # ratings cache warm-up); pin the ~|interactions| rows so the
    # scan→join→agg sub-DAG runs a single time.
    train = pc.select(
        F.col("user_id").cast("int").alias("user"),
        F.col("item_id").cast("int").alias("item"),
        F.least(F.col("playcount"), F.lit(20)).cast("float").alias("rating"),
    ).localCheckpoint(eager=True)
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
    return als.fit(train)


def als_recommend_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving form: (user_id, item_id, score) top-3 per user."""
    model = als_serving_fit(spark, sf_dir)
    recs = model.recommendForAllUsers(3)
    return recs.select(
        F.col("user").cast("bigint").alias("user_id"),
        F.explode("recommendations").alias("rec"),
    ).select(
        "user_id",
        F.col("rec.item").cast("bigint").alias("item_id"),
        F.round(F.col("rec.rating").cast("double"), 4).alias("score"),
    )


# --------------------------------------------------------------------------
# M1+M2 full training parity: 5:1 train/test split, 2-fold
# CrossValidator grid over (rank, regParam, alpha), RMSE evaluation of
# the best model on the held-out test split, model save + metadata
# registry append, latest-model lookup + load, and
# recommendForUserSubset inference — the complete
# train_models.py:71-252 / recommend.py:36-60,285-305 lifecycle.
# Iterative factorization — rows-only driver check (no oracle entry).
# --------------------------------------------------------------------------
# Named CV-grid profiles (VERDICT r7 #8). "reference" is the
# reference's FULL default grid — request_manage.py:295-299 /
# train_models.py:129-193: ranks [100, 120] × lambdas [0.1, 10.0] ×
# iterations [5, 10] × alphas [3.0] = the "eight models" its module
# docstring describes (iterations is a genuine grid axis there, so
# max_iter is a tuple here and joins the ParamGridBuilder).
# "default" is the bench-time profile m_als_cv runs (documented
# trade, VERDICT r3 #5).
ALS_GRID_PROFILES = {
    "default": dict(
        ranks=(4, 8), reg_params=(0.1,), alphas=(1.0,), max_iters=(2,)
    ),
    "reference": dict(
        ranks=(100, 120),
        reg_params=(0.1, 10.0),
        alphas=(3.0,),
        max_iters=(5, 10),
    ),
}


def resolve_als_profile(profile: str) -> dict:
    """Grid kwargs for a named profile (KeyError on unknown names —
    a typo must not silently fall back to the reduced grid)."""
    return dict(ALS_GRID_PROFILES[profile])


def als_cv_lifecycle(
    spark: SparkSession,
    sf_dir: str,
    registry_dir: str,
    ranks=(4, 8),
    reg_params=(0.1,),
    alphas=(1.0,),
    max_iter=3,
    num_folds: int = 2,
    parallelism: int = 2,
    profile: str | None = None,
) -> DataFrame:
    """Returns one row per grid candidate (params, avg CV RMSE) plus
    the winner's held-out test RMSE and registered model_id.

    ``profile`` (optional) overrides the four grid axes from
    ``ALS_GRID_PROFILES`` — ``profile="reference"`` is the reference's
    full 8-candidate grid. ``max_iter`` accepts a scalar (fixed, the
    historical behavior) or a tuple (a grid axis, as the reference's
    ``iterations`` is)."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.recommendation import ALS
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    from listenbrainz_server_spark.operators.model_registry import (
        save_model_with_metadata,
    )
    from listenbrainz_server_spark.operators.sampling import hash_split

    if profile is not None:
        p = resolve_als_profile(profile)
        ranks, reg_params, alphas = p["ranks"], p["reg_params"], p["alphas"]
        max_iter = p["max_iters"]
    max_iters = tuple(max_iter) if hasattr(max_iter, "__iter__") else (max_iter,)

    pc = _playcounts(spark, sf_dir)
    ratings = pc.select(
        F.col("user_id").cast("int").alias("user"),
        F.col("item_id").cast("int").alias("item"),
        F.least(F.col("playcount"), F.lit(20)).cast("float").alias("rating"),
    )
    # 5:1 split, leak-safe on the interaction key (train_models.py:71-85
    # uses randomSplit; hash_split is reproducible across runs/engines).
    split = hash_split(
        ratings.withColumn(
            "split_key", F.concat_ws("|", F.col("user"), F.col("item"))
        ),
        "split_key",
        weights=(5 / 6, 1 / 6),
        labels=("train", "test"),
    )
    # Materialize the split ONCE: CrossValidator triggers the input
    # lineage (scan → playcount agg → hash split) on every candidate ×
    # fold fit plus the refit and the test transform — a localCheckpoint
    # here pins the ~|interactions| rating rows on executors and turns
    # 5+ recomputations of the aggregation into one (the reference gets
    # the same effect by persisting playcounts_df to HDFS between the
    # create_dataframes and train_model requests). ONE checkpoint of
    # the labeled frame, not one per side: two eager checkpoints would
    # execute the aggregation lineage twice (measured 3.5 s → 2.5 s).
    # The repartition right-sizes ALS's input: its many small per-
    # iteration stages inherit this partitioning, and 32 near-empty
    # tasks per stage is pure scheduler overhead at this volume.
    mat = (
        split.drop("split_key")
        .repartition(max(8, spark.sparkContext.defaultParallelism // 4))
        .localCheckpoint(eager=True)
    )
    train = mat.where(F.col("split") == "train").drop("split")
    test = mat.where(F.col("split") == "test").drop("split")

    # Size ALS's block count from the interaction volume instead of the
    # fixed default 10: each block is an independent least-squares task
    # per iteration, so too many blocks on a small split is pure
    # scheduler overhead while too few on a 100 TB split starves the
    # cluster. ~150k interactions per block, clamped to [4, cluster
    # parallelism] — the same sizing rule shape as sized_sig_bits.
    n_train = train.count()
    num_blocks = max(4, min(spark.sparkContext.defaultParallelism,
                            n_train // 150_000))
    als = ALS(
        implicitPrefs=True,
        seed=45,  # the reference's split seed (train_models.py:78)
        coldStartStrategy="drop",
        maxIter=max_iters[0],
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        numUserBlocks=num_blocks,
        numItemBlocks=num_blocks,
    )
    gb = (
        ParamGridBuilder()
        .addGrid(als.rank, list(ranks))
        .addGrid(als.regParam, list(reg_params))
        .addGrid(als.alpha, list(alphas))
    )
    # iterations as a grid axis only when more than one value is asked
    # for — a single-valued addGrid would still work, but keeping the
    # scalar path identical preserves the historical candidate list.
    if len(max_iters) > 1:
        gb = gb.addGrid(als.maxIter, list(max_iters))
    grid = gb.build()
    evaluator = RegressionEvaluator(
        metricName="rmse", labelCol="rating", predictionCol="prediction"
    )
    cv = CrossValidator(
        estimator=als,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=num_folds,
        parallelism=parallelism,
        seed=45,
    )
    cv_model = cv.fit(train)

    test_rmse = evaluator.evaluate(cv_model.bestModel.transform(test))
    best_idx = min(range(len(grid)), key=lambda i: cv_model.avgMetrics[i])
    best_params = {
        "rank": grid[best_idx][als.rank],
        "regParam": grid[best_idx][als.regParam],
        "alpha": grid[best_idx][als.alpha],
        "maxIter": grid[best_idx].get(als.maxIter, max_iters[0]),
    }
    model_id = save_model_with_metadata(
        spark,
        registry_dir,
        cv_model.bestModel,
        params=best_params,
        metrics={
            "validation_rmse": cv_model.avgMetrics[best_idx],
            "test_rmse": test_rmse,
        },
    )

    rows = [
        (
            int(pm[als.rank]),
            float(pm[als.regParam]),
            float(pm[als.alpha]),
            int(pm.get(als.maxIter, max_iters[0])),
            round(float(m), 4),
            i == best_idx,
            model_id if i == best_idx else None,
            round(float(test_rmse), 4) if i == best_idx else None,
        )
        for i, (pm, m) in enumerate(zip(grid, cv_model.avgMetrics))
    ]
    return spark.createDataFrame(
        rows,
        "rank int, reg_param double, alpha double, max_iter int, "
        "cv_rmse double, is_best boolean, model_id string, test_rmse double",
    )


@register(
    "m_als_cv",
    """
    WITH pc AS (
        SELECT o_custkey AS user_id, l_partkey AS item_id, COUNT(*) AS playcount
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    split AS (
        SELECT substr(md5(user_id || '|' || item_id), 1, 8) < 'd5555555'
                   AS is_train
        FROM pc
    )
    SELECT CAST(COUNT_IF(is_train) AS BIGINT) AS n_train,
           CAST(COUNT_IF(NOT is_train) AS BIGINT) AS n_test,
           CAST(2 AS BIGINT) AS n_grid,
           TRUE AS test_rmse_le_bound,
           TRUE AS cv_rmse_le_bound
    FROM split
    """,
    doc="M1-M2 ALS CrossValidator grid + RMSE eval + model registry "
    "(train_models.py:71-252); registered form is the hash-gated "
    "audit: the md5 5:1 split sizes the oracle reproduces exactly, "
    "plus held-out test RMSE <= 1.1 and every grid candidate's CV "
    "RMSE <= 1.2 (measured 0.96-0.98 / 1.00-1.07 at both SFs; "
    "implicit-ALS preference scale) — a training regression that "
    "degrades fit flips a boolean and fails the gate; grid rows = "
    "als_cv_lifecycle",
)
def m_als_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast default profile (VERDICT r3 #5): still a REAL grid search —
    two rank candidates, 2-fold CV, held-out test RMSE, registry append
    — but with maxIter=2 and all candidate×fold fits running
    concurrently (parallelism=4), roughly halving the #1 wall-clock
    line in the bench. The reference-parity depth (maxIter=3,
    sequential-ish fits) stays available through ``als_cv_lifecycle``'s
    defaults for callers that want it."""
    import tempfile

    from listenbrainz_server_spark.operators.sampling import split_label

    registry_dir = tempfile.mkdtemp(prefix="lbs_model_registry_")
    grid_df = als_cv_lifecycle(
        spark, sf_dir, registry_dir, max_iter=2, parallelism=4
    ).localCheckpoint(eager=True)
    grid_audit = grid_df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grid"),
        (F.max(F.when(F.col("is_best"), F.col("test_rmse"))) <= 1.1).alias(
            "test_rmse_le_bound"
        ),
        (F.max("cv_rmse") <= 1.2).alias("cv_rmse_le_bound"),
    )
    # Same md5 split the lifecycle applied (hash_split on user|item).
    is_train = (
        split_label(
            F.concat_ws(
                "|",
                F.col("user_id").cast("int"),
                F.col("item_id").cast("int"),
            ),
            weights=(5 / 6, 1 / 6),
            labels=("train", "test"),
        )
        == "train"
    )
    counts = _playcounts(spark, sf_dir).agg(
        F.count_if(is_train).cast("bigint").alias("n_train"),
        F.count_if(~is_train).cast("bigint").alias("n_test"),
    )
    return counts.crossJoin(F.broadcast(grid_audit)).select(
        "n_train", "n_test", "n_grid", "test_rmse_le_bound", "cv_rmse_le_bound"
    )


# --------------------------------------------------------------------------
# Supervised quality classifier — the learned upgrade of the
# heuristic quality gate: logistic regression on cheap per-doc
# features (token count, top-word share, punctuation share, stopword
# share) against the gate's label. At 100 TB the value is the usual
# distillation loop: score a labeled slice with the expensive gate
# (or human labels), fit the cheap model once on the driver-coordinated
# MLlib job, then the scoring pass is a pure column expression
# (coefficients folded into the plan — no model server, no Python).
# Iterative fit → rows-only driver check; separability of the
# fixture's label makes AUC≈1 a strong correctness signal
# (tests/test_operators.py::test_quality_classifier_auc).
# --------------------------------------------------------------------------
@register(
    "m_quality_classifier",
    """
    WITH uni AS (
        SELECT doc_id, w, COUNT(*) AS n
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY 1, 2
    ),
    lab AS (
        SELECT doc_id,
               CASE WHEN SUM(n) >= 20 AND MAX(n) * 1.0 / SUM(n) <= 0.25
                    THEN 1 ELSE 0 END AS label
        FROM uni GROUP BY doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(label) AS BIGINT) AS n_pos,
           TRUE AS accuracy_ge_floor
    FROM lab
    """,
    doc="logistic-regression quality model on per-doc text features, "
    "scoring folded back into column expressions; registered form is "
    "the hash-gated audit: exact label counts (the gate is a pure "
    "expression the oracle mirrors, d_clean_corpus CTE) + model-vs-"
    "gate agreement >= 0.90 (measured 0.960-0.966 at both SFs; "
    "deterministic LBFGS fit); per-doc scores = "
    "quality_classifier_scores; AUC stays test-pinned. Adjudicated "
    "r10 (VERDICT r9 #7): confusion-matrix CELLS (tp/fp/tn/fn) "
    "cannot be value-oracled — they depend on the fitted "
    "coefficients, which an independent SQL engine cannot recompute "
    "(LBFGS is iterative); the label marginals the oracle CAN "
    "recompute (n_docs, n_pos = tp+fn) are already exact here",
)
def m_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    scores = quality_classifier_scores(spark, sf_dir)
    return scores.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("label").cast("bigint").alias("n_pos"),
        (
            F.avg((F.col("prediction") == F.col("label")).cast("double"))
            >= F.lit(0.90)
        ).alias("accuracy_ge_floor"),
    )


def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving form: per-doc (doc_id, label, prob, prediction)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    from listenbrainz_server_spark.functions.text import (
        punct_ratio,
        quality_flag,
        stopword_ratio,
        token_count,
        top_word_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    feats = docs.select(
        "doc_id",
        token_count(F.col("text")).cast("double").alias("f_tokens"),
        (top_word_count(toks) * 1.0 / F.greatest(F.size(toks), F.lit(1))).alias(
            "f_top_share"
        ),
        punct_ratio(F.col("text")).alias("f_punct"),
        stopword_ratio(F.col("text")).alias("f_stop"),
        quality_flag(F.col("text")).cast("double").alias("label"),
    ).localCheckpoint(eager=True)  # pin: assembler + LR iterate the lineage
    asm = VectorAssembler(
        inputCols=["f_tokens", "f_top_share", "f_punct", "f_stop"],
        outputCol="features",
    )
    lr = LogisticRegression(maxIter=20, regParam=0.01)
    model = lr.fit(asm.transform(feats))
    # Fold the fitted coefficients back into a pure column expression —
    # the deployable scoring path (no MLlib, no Python at inference).
    w = model.coefficients
    b = float(model.intercept)
    margin = (
        F.col("f_tokens") * float(w[0])
        + F.col("f_top_share") * float(w[1])
        + F.col("f_punct") * float(w[2])
        + F.col("f_stop") * float(w[3])
        + F.lit(b)
    )
    prob = 1.0 / (1.0 + F.exp(-margin))
    return feats.select(
        "doc_id",
        F.col("label").cast("int").alias("label"),
        F.round(prob, 6).alias("prob"),
        (prob >= 0.5).cast("int").alias("prediction"),
    )


# --------------------------------------------------------------------------
# Item-item cosine CF — the transpose of m_user_cosine_capped and the
# production-common serving variant (item neighborhoods are stabler
# than user neighborhoods and cacheable per catalog item; the
# reference's similarity.recording handler is this axis —
# similarity/recording/common.py). Pure reuse of the capped-cosine
# core with roles swapped: the shared-USER self-join generates
# |items(user)|² pairs per user, so the degree cap moves to the user
# axis. Same 100 TB bound, same deterministic tie-breaks.
# --------------------------------------------------------------------------
@register(
    "m_item_cosine_capped",
    f"""
    WITH pc AS (
        SELECT l_partkey AS item_id, o_custkey AS user_id, COUNT(*) AS playcount
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    capped AS (
        SELECT item_id, user_id, playcount FROM (
            SELECT item_id, user_id, playcount,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY playcount DESC, item_id
                   ) AS udr
            FROM pc
        ) WHERE udr <= {_ITEM_DEGREE_CAP}
    ),
    norms AS (
        SELECT item_id, sqrt(SUM(playcount * playcount * 1.0)) AS nrm
        FROM pc GROUP BY 1
    ),
    dots AS (
        SELECT a.item_id AS item_a, b.item_id AS item_b,
               SUM(a.playcount * b.playcount * 1.0) AS dot
        FROM capped a JOIN capped b
          ON a.user_id = b.user_id AND a.item_id < b.item_id
        GROUP BY 1, 2
    )
    SELECT item_a, item_b, ROUND(dot / (na.nrm * nb.nrm), 6) AS similarity
    FROM dots
    JOIN norms na ON na.item_id = item_a
    JOIN norms nb ON nb.item_id = item_b
    WHERE dot / (na.nrm * nb.nrm) >= 0.1
    """,
    doc="item-item cosine CF with per-user degree cap (transpose of "
    "m_user_cosine_capped; the similarity.recording axis)",
)
def m_item_cosine_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    pc = _playcounts(spark, sf_dir).select(
        F.col("item_id").alias("user_id"),  # roles swapped: items are
        F.col("user_id").alias("item_id"),  # the "users" of the core
        "playcount",
    )
    return cosine_pairs_from_playcounts(
        pc, threshold=0.1, item_degree_cap=_ITEM_DEGREE_CAP
    ).select(
        F.col("user_a").alias("item_a"),
        F.col("user_b").alias("item_b"),
        F.round("similarity_raw", 6).alias("similarity"),
    )


# --------------------------------------------------------------------------
# m_item_cf_topk (r9): item-item neighborhood CF — the classic
# memory-based recommender (Sarwar et al. WWW'01 / the "customers
# who bought X" shape), the neighbor-based sibling of the
# model-based m_als_recommend and the ITEM-axis twin of
# m_user_cosine: cosine between item playcount vectors over the
# shared-user axis, top-3 neighbors per item. Candidate pairs come
# only from users' baskets (user-keyed self-join — co-rated items
# only, never |I|²); per-user basket cap bounds the quadratic basket
# term exactly like m_user_cosine_capped's hot-item cap (a power
# user's basket contributes |basket|² pairs; cap documented, not
# silent). Integer dot products and norms make the cosine doubles
# bit-identical cross-engine (mul/sqrt/div are IEEE-correctly-
# rounded), so rank order is engine-exact.
# --------------------------------------------------------------------------
@register(
    "m_item_cf_topk",
    """
    WITH pc AS (
        SELECT o_custkey AS user_id, l_partkey AS item_id,
               COUNT(*) AS playcount
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    capped AS (
        SELECT user_id, item_id, playcount FROM (
            SELECT user_id, item_id, playcount,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY playcount DESC, item_id)
                       AS brk
            FROM pc
        ) WHERE brk <= 50
    ),
    norms AS (
        SELECT item_id, SUM(playcount * playcount) AS nrm
        FROM capped GROUP BY item_id
    ),
    dots AS (
        SELECT a.item_id AS item_a, b.item_id AS item_b,
               SUM(a.playcount * b.playcount) AS dot,
               COUNT(*) AS n_common
        FROM capped a JOIN capped b
          ON a.user_id = b.user_id AND a.item_id <> b.item_id
        GROUP BY 1, 2
    )
    SELECT item_a, item_b, n_common, cosine, rank FROM (
        SELECT d.item_a, d.item_b,
               CAST(d.n_common AS BIGINT) AS n_common,
               ROUND(d.dot / (SQRT(na.nrm) * SQRT(nb.nrm)), 6) AS cosine,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY d.item_a
                   ORDER BY d.dot / (SQRT(na.nrm) * SQRT(nb.nrm)) DESC,
                            d.item_b) AS BIGINT) AS rank
        FROM dots d
        JOIN norms na ON na.item_id = d.item_a
        JOIN norms nb ON nb.item_id = d.item_b
    ) WHERE rank <= 3
    """,
    doc="item-item CF top-3 neighbors: cosine over item playcount "
    "vectors via the shared-user axis (co-rated pairs only, per-user "
    "basket cap 50 bounds the quadratic term); integer dots/norms "
    "make cosines bit-identical cross-engine; 6dp",
)
def m_item_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pc = _playcounts(spark, sf_dir)
    wcap = Window.partitionBy("user_id").orderBy(
        F.col("playcount").desc(), "item_id"
    )
    capped = (
        pc.withColumn("brk", F.row_number().over(wcap))
        .where(F.col("brk") <= 50)
        .drop("brk")
    )
    norms = capped.groupBy("item_id").agg(
        F.sum(F.col("playcount") * F.col("playcount")).alias("nrm")
    )
    a = capped.select(
        "user_id", F.col("item_id").alias("item_a"), F.col("playcount").alias("pa")
    )
    b = capped.select(
        "user_id", F.col("item_id").alias("item_b"), F.col("playcount").alias("pb")
    )
    # Generate each unordered pair ONCE (item_a < item_b) and mirror
    # after the aggregate (guide §2.3 — shuffle fewer bytes): the old
    # `item_a != item_b` emitted both orientations of every pair into
    # the partial agg + exchange (the r15 profile's single 5.6 s map
    # stage), twice the rows for values that are symmetric anyway.
    # Value-safe: dot and n_common are integer sums (order-free), and
    # cosine divides by sqrt(na)*sqrt(nb) — commutative product — so
    # the mirrored row carries bit-identical doubles to what the
    # two-sided join produced. The explode runs post-agg on the
    # collapsed pair set (no shuffle of its own; the window exchange
    # downstream sees the same rows as before).
    half = (
        a.join(b, "user_id")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(
            F.sum(F.col("pa") * F.col("pb")).alias("dot"),
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
        )
    )
    dots = half.select(
        F.explode(
            F.array(
                F.struct("item_a", "item_b", "dot", "n_common"),
                F.struct(
                    F.col("item_b").alias("item_a"),
                    F.col("item_a").alias("item_b"),
                    F.col("dot"),
                    F.col("n_common"),
                ),
            )
        ).alias("e")
    ).select("e.*")
    cos = (
        dots.join(
            F.broadcast(norms.select(F.col("item_id").alias("item_a"),
                                     F.col("nrm").alias("na"))),
            "item_a",
        )
        .join(
            F.broadcast(norms.select(F.col("item_id").alias("item_b"),
                                     F.col("nrm").alias("nb"))),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "n_common",
            (F.col("dot") / (F.sqrt("na") * F.sqrt("nb"))).alias("cos_raw"),
        )
    )
    wr = Window.partitionBy("item_a").orderBy(F.col("cos_raw").desc(), "item_b")
    return (
        cos.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .where(F.col("rank") <= 3)
        .select(
            "item_a",
            "item_b",
            "n_common",
            F.round("cos_raw", 6).alias("cosine"),
            "rank",
        )
    )
