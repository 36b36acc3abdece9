"""Learned quality classifier (llm/classify.py): train/score round trip
on synthetic separable corpora. No cross-engine oracle — the model is
float-valued by nature — so correctness here is behavioral: separation,
probability sanity, report arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from vulnerablecode_spark.llm import classify


def _corpus(spark, n=40):
    # "curated" docs share a clean vocabulary; "raw" docs share a junky
    # one; two held-out docs (one of each style) test generalization
    rows = []
    for i in range(n):
        if i % 2 == 0:
            rows.append((i, "clean prose with careful structure and ideas",
                         "en", "curated"))
        else:
            rows.append((i, "buy now click here spam winner prize lottery",
                         "en", "raw"))
    rows.append((1000, "careful prose with clean ideas", "en", "unseen"))
    rows.append((1001, "click the spam prize winner", "en", "unseen"))
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string")


class TestQualityClassifier:
    def test_separates_and_generalizes(self, spark):
        docs = _corpus(spark)
        model = classify.train_quality_classifier(
            docs.filter(F.col("source") != "unseen"),
            positive=F.col("source") == "curated")
        scored = {r.doc_id: r for r in
                  classify.score_quality(model, docs).collect()}
        # training docs separate
        assert all(scored[i].quality_pred == 1
                   for i in range(0, 40, 2))
        assert all(scored[i].quality_pred == 0
                   for i in range(1, 40, 2))
        # held-out docs follow their style
        assert scored[1000].quality_prob > 0.5 > scored[1001].quality_prob
        assert all(0.0 <= r.quality_prob <= 1.0 for r in scored.values())

    def test_filter_report_arithmetic(self, spark):
        docs = _corpus(spark)
        model = classify.train_quality_classifier(
            docs, positive=F.col("source") == "curated")
        rep = {r.source: r for r in classify.classifier_filter_report(
            model, docs, threshold=0.5).collect()}
        assert rep["curated"].n_docs == 20
        assert rep["curated"].n_kept == 20  # its own training class
        assert rep["curated"].kept_bp == 10000
        assert rep["raw"].n_kept == 0 and rep["raw"].kept_bp == 0
        for r in rep.values():
            assert r.kept_bp == r.n_kept * 10000 // r.n_docs

    def test_scoring_is_mapside(self, spark):
        # the scoring plan must contain no join or shuffle beyond the
        # model transform: coefficients ride the closure, not a join
        docs = _corpus(spark)
        model = classify.train_quality_classifier(
            docs, positive=F.col("source") == "curated")
        plan = classify.score_quality(
            model, docs)._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert "Exchange" not in plan
