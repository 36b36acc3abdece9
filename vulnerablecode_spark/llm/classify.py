"""Learned quality filtering: the fastText/LR-style classifier step real
pretraining pipelines run after rule-based quality signals — GPT-3's
Wikipedia-vs-CommonCrawl logistic regression, CCNet's fastText stage —
expressed with Spark MLlib so training is distributed L-BFGS over the
executors, not a driver-side fit.

Featurization is the hashing trick over whitespace tokens
(``pyspark.ml.feature.HashingTF``, murmur3 — the MLlib-native sibling of
``llm.text.feature_hash_counts``'s engine-portable integer variant:
training needs no cross-engine oracle, so the idiomatic vectorizer wins
here). The model object is a broadcastable coefficient vector; scoring is
a map-side projection — no shuffle beyond the tokenize-free transform.

Relation to the DSIR scorer (llm/select.py): DSIR reweights by a
generative bucket-ratio model with no training loop; this is the
discriminative twin — a trained decision boundary — and real pipelines
run both (DSIR to resample, a classifier to hard-filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def train_quality_classifier(
    docs: DataFrame,
    positive: "F.Column",
    n_features: int = 4096,
    max_iter: int = 25,
    reg_param: float = 0.01,
    text_col: str = "text",
):
    """Fit the quality model: logistic regression over hashed token
    vectors, label 1 = ``positive`` (the curated/target-domain slice),
    0 = the rest. Returns a fitted ``PipelineModel`` (tokens → HashingTF
    → LR) whose coefficients broadcast into any later scoring pass.

    Scale shape: HashingTF is a stateless map-side transform (no
    vocabulary broadcast, no fit pass over the corpus); LR training is
    MLlib's distributed L-BFGS — each iteration one treeAggregate of
    gradient partials, driver state = one coefficient vector of
    ``n_features`` doubles.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    labeled = docs.select(
        F.split(F.col(text_col), " ").alias("tokens"),
        positive.cast("double").alias("label"),
    )
    pipeline = Pipeline(stages=[
        HashingTF(inputCol="tokens", outputCol="features",
                  numFeatures=int(n_features)),
        LogisticRegression(maxIter=int(max_iter), regParam=float(reg_param),
                           featuresCol="features", labelCol="label"),
    ])
    return pipeline.fit(labeled)


def score_quality(
    model,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: "tuple[str, ...]" = (),
) -> DataFrame:
    """Score documents with a fitted quality model: (doc_id,
    [passthrough...], quality_prob, quality_pred) where ``quality_prob``
    is P(label=1). Pure map-side: hash-transform + broadcast coefficient
    dot product, embarrassingly parallel over input splits —
    ``passthrough`` columns ride the transform untouched, so callers
    never need a join to recover them.
    """
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(
        docs.select(F.col(id_col), *[F.col(c) for c in passthrough],
                    F.split(F.col(text_col), " ").alias("tokens"))
    )
    return scored.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        vector_to_array("probability").getItem(1).alias("quality_prob"),
        F.col("prediction").cast("bigint").alias("quality_pred"),
    )


def classifier_filter_report(
    model,
    docs: DataFrame,
    threshold: float = 0.5,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source report of what a probability threshold would keep —
    the artifact a curator reads before committing to a hard filter:
    (source, n_docs, n_kept, kept_bp). The group column rides the
    scoring transform as a passthrough, so the plan is score → one
    group-key aggregation, no corpus self-join."""
    scored = score_quality(model, docs, text_col=text_col, id_col=id_col,
                           passthrough=(group_col,))
    return scored.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("quality_prob") >= float(threshold)).cast("bigint"))
        .cast("bigint").alias("n_kept"),
    ).withColumn(
        "kept_bp", F.expr("n_kept * 10000 div n_docs").cast("bigint"))


def auc_rank_eval(df: DataFrame, *, score_col: str, label_col: str,
                  group_cols: tuple[str, ...] = ("source",)) -> DataFrame:
    """Exact ROC-AUC per group via the Mann-Whitney rank statistic —
    the distributed classifier-evaluation step (quality filters, PII
    detectors, language ID all get threshold-free eval this way before
    a cutoff is chosen). Tie handling is the textbook average-rank rule,
    carried in DOUBLED integer ranks so everything stays exact BIGINT:
    a score class preceded by ``cum`` rows with ``c`` members has
    2·avg_rank = 2·cum + c + 1, and
    ``AUC = (Σ_pos 2·avg_rank − n₁(n₁+1)) / (2·n₁·n₀)``
    → ``auc_bp = (s2 − n₁(n₁+1)) · 5000 div (n₁·n₀)`` (numerator is
    provably non-negative, so trunc-vs-floor never diverges).

    Headroom: the rank-sum s2 and the bp numerator run in
    DECIMAL(38,0) (oracle side: DuckDB's SUM(BIGINT)→HUGEINT), the
    same escalation as the other integer-bp operators — in BIGINT the
    numerator bound 10⁴·n₁·n₀ wraps int64 near ~2·10⁶ rows per group
    (and s2's per-term p·(2·cum+c+1) ≤ 2·N² near ~3·10⁹), where Spark
    would wrap silently while DuckDB stays exact. The DECIMAL bound is
    10⁴·n₁·n₀ < 10³⁸ → ~10¹⁷ rows per group.

    Scale: the input collapses to (group, score) CLASSES first — a
    map-side-combinable aggregate that shrinks a 100 TB frame to
    |distinct scores| rows per group — and the rank windows run over
    those classes only, never the raw rows. This is the histogram-AUC
    shape, exact because scores are integers; no global per-row sort
    ever happens.

    Output: (group..., n_pos, n_neg, auc_bp); groups missing one class
    have undefined AUC and are excluded.
    """
    cls = df.groupBy(*group_cols, score_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum(F.col(label_col).cast("bigint")).cast("bigint").alias("p"))
    w = (Window.partitionBy(*group_cols).orderBy(F.col(score_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    r = cls.withColumn(
        "cum", F.coalesce(F.sum("c").over(w), F.lit(0).cast("bigint")))
    per = r.groupBy(*group_cols).agg(
        F.sum((F.col("p").cast("decimal(38,0)")
               * (2 * F.col("cum") + F.col("c") + 1)).cast("decimal(38,0)"))
        .alias("s2"),
        F.sum("p").alias("n_pos"),
        F.sum(F.col("c") - F.col("p")).alias("n_neg"))
    return (per.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
            .selectExpr(*group_cols,
                        "CAST(n_pos AS BIGINT) AS n_pos",
                        "CAST(n_neg AS BIGINT) AS n_neg",
                        "CAST((s2 - CAST(n_pos AS DECIMAL(38,0))"
                        " * (n_pos + 1)) * 5000 "
                        "div (CAST(n_pos AS DECIMAL(38,0)) * n_neg)"
                        " AS BIGINT) AS auc_bp"))
