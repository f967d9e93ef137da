"""Model-based quality filter (functions/quality_model.py): weak
labels, separation on a planted corpus, determinism, real-table
smoke, and map-side scoring plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl___2023_spark.functions.quality_model import (
    model_quality_filter,
    score_documents,
    train_quality_classifier,
    weak_labels_from_source,
)
from big_data_bowl___2023_spark.sources.io import load_table

CLEAN = ("careful analysis of the experimental results shows the "
         "method improves accuracy across every evaluated benchmark "
         "while requiring substantially less computation overall")
JUNK = "click here buy now free offer winner " * 5


def _planted(spark):
    rows = ([(i, CLEAN + f" variant {i}", "docs") for i in range(20)]
            + [(100 + i, JUNK + f" spam {i}", "web") for i in range(20)])
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_weak_labels(spark):
    docs = _planted(spark)
    lab = weak_labels_from_source(docs, ("docs",))
    got = {r.doc_id: r.label for r in lab.collect()}
    assert all(got[i] == 1.0 for i in range(20))
    assert all(got[100 + i] == 0.0 for i in range(20))


def test_classifier_separates_planted_corpus(spark):
    docs = _planted(spark)
    model = train_quality_classifier(
        weak_labels_from_source(docs, ("docs",)))
    scored = score_documents(model, docs)
    rows = {r.doc_id: r.quality_prob for r in scored.collect()}
    clean_mean = sum(rows[i] for i in range(20)) / 20
    junk_mean = sum(rows[100 + i] for i in range(20)) / 20
    assert clean_mean > 0.9 > 0.1 > junk_mean
    kept = model_quality_filter(docs, model, threshold=0.5)
    assert {r.doc_id for r in kept.select("doc_id").collect()} == set(
        range(20))


def test_scoring_deterministic(spark):
    docs = _planted(spark)
    lab = weak_labels_from_source(docs, ("docs",))
    m1 = train_quality_classifier(lab)
    m2 = train_quality_classifier(lab)
    s1 = {(r.doc_id, r.quality_prob)
          for r in score_documents(m1, docs).collect()}
    s2 = {(r.doc_id, r.quality_prob)
          for r in score_documents(m2, docs.repartition(7)).collect()}
    assert s1 == s2


def test_real_documents_smoke_and_schema(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    model = train_quality_classifier(
        weak_labels_from_source(docs, ("docs", "wiki")))
    scored = score_documents(model, docs)
    assert scored.columns == docs.columns + ["quality_prob"]
    row = scored.agg(F.min("quality_prob"), F.max("quality_prob")).first()
    assert 0.0 <= row[0] <= row[1] <= 1.0
    assert scored.count() == docs.count()


def test_scoring_is_map_side(spark, sf_dir):
    """Scoring must not introduce a shuffle: the plan from scan to
    probability is exchange-free."""
    docs = load_table(spark, sf_dir, "documents")
    model = train_quality_classifier(
        weak_labels_from_source(docs, ("docs",)))
    plan = score_documents(model, docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
