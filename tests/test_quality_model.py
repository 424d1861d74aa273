import math

from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.quality_model import (
    fit_quality_classifier,
    hashed_token_features,
    quality_model_scores,
)


def test_hashed_features_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, ""), (3, "Alpha")], "doc_id long, text string"
    )
    rows = hashed_token_features(df, n_features=64).collect()
    by_doc = {}
    for r in rows:
        assert 0 <= r.bucket < 64
        by_doc.setdefault(r.doc_id, {})[r.bucket] = r.cnt
    assert sum(by_doc[1].values()) == 3 and len(by_doc[1]) == 2  # alpha x2 + beta
    assert 2 not in by_doc  # empty text -> no feature rows
    # case-folded: 'Alpha' lands in the same bucket as 'alpha'
    alpha_bucket = max(by_doc[1], key=by_doc[1].get)
    assert by_doc[3] == {alpha_bucket: 1}


def test_classifier_learns_planted_token_and_scores_relationally(spark):
    good = ["quality prose here", "more quality text now", "fine quality words again"]
    bad = ["junk spam noise", "noise spam junk junk", "spam junk filler"]
    rows = []
    for i in range(30):
        base = good[i % 3] if i % 2 == 0 else bad[i % 3]
        rows.append((i, base + f" pad{i % 5}", 1 if i % 2 == 0 else 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    weights, intercept = fit_quality_classifier(df, "label", n_features=256)
    assert weights.count() > 0
    scored = quality_model_scores(df, weights, intercept, n_features=256)
    out = scored.select("doc_id", "label", "quality_prob").collect()
    acc = sum(1 for r in out if (r.quality_prob >= 0.5) == (r.label == 1)) / len(out)
    assert acc == 1.0  # linearly separable vocab -> perfect train fit
    # empty doc scores exactly sigmoid(intercept) through the left join
    empty = spark.createDataFrame([(99, "")], "doc_id long, text string")
    p = quality_model_scores(empty, weights, intercept, n_features=256).collect()[0]
    assert abs(p.quality_prob - 1 / (1 + math.exp(-intercept))) < 1e-12


def test_scoring_plan_broadcasts_weights(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    weights = spark.createDataFrame([(0, 1.0)], "bucket long, weight double")
    plan = (
        quality_model_scores(df, weights, 0.0, n_features=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
