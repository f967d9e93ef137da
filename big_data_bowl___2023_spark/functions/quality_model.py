"""Model-based document quality filtering (fastText-classifier
style).

Rule-based gates (Gopher, functions/gopher.py) catch mechanical junk;
the second quality stage in modern corpus pipelines is a *learned*
filter: train a cheap linear classifier to distinguish a
high-quality reference slice from the raw crawl, then keep documents
the model scores as reference-like (the approach popularized by the
GPT-3/LLaMA data recipes with fastText/logistic classifiers over
bag-of-words features).

Spark-first shape:

* features: hashed bag-of-words (``HashingTF`` over the shared
  ``functions.text`` tokenizer pattern) — the hashing trick keeps the
  feature space fixed-width with zero vocabulary state to ship;
* model: MLlib ``LogisticRegression`` — training runs as distributed
  L-BFGS over the (usually sampled) labeled frame; the fitted model
  is a single dense coefficient vector;
* scoring: ``PipelineModel.transform`` — the coefficients broadcast
  to executors and scoring is a per-row dot product, no shuffle, so
  the 100 TB corpus streams through map-side;
* weak labels: ``weak_labels_from_source`` derives the standard
  reference-vs-crawl supervision from the ``source`` column without
  any hand labeling.

Training at full scale is done on a sample (the classifier needs
~10⁵-10⁶ rows, not the corpus); pair with
``operators.sampling.hash_sample`` for a deterministic slice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = r"\s+"
_PROB_COL = "quality_prob"


def weak_labels_from_source(docs: DataFrame,
                            positive_sources: tuple[str, ...],
                            source_col: str = "source") -> DataFrame:
    """Label = 1.0 for documents from the reference-quality sources,
    0.0 otherwise — the crawl-vs-reference weak supervision used when
    no hand labels exist."""
    return docs.withColumn(
        "label",
        F.col(source_col).isin(*positive_sources).cast("double"))


def train_quality_classifier(labeled: DataFrame,
                             text_col: str = "text",
                             label_col: str = "label",
                             n_features: int = 4096,
                             reg_param: float = 1e-3,
                             max_iter: int = 50):
    """Fit tokenize → hashed-BoW → logistic regression; returns the
    PipelineModel. Deterministic: HashingTF is seedless (pure hash)
    and L-BFGS from a fixed zero init converges to the same optimum
    for the same data."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(inputCol=text_col, outputCol="__tokens",
                         pattern=TOKEN_PATTERN, toLowercase=True)
    tf = HashingTF(inputCol="__tokens", outputCol="__features",
                   numFeatures=n_features)
    lr = LogisticRegression(featuresCol="__features",
                            labelCol=label_col,
                            regParam=reg_param, maxIter=max_iter)
    return Pipeline(stages=[tok, tf, lr]).fit(labeled)


def score_documents(model, docs: DataFrame,
                    prob_col: str = _PROB_COL) -> DataFrame:
    """Attach P(reference-quality) per document. Map-side only: the
    model broadcasts, no shuffle is introduced."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs)
    p1 = F.element_at(vector_to_array("probability"), 2)
    return (scored
            .withColumn(prob_col, F.round(p1, 6))
            .drop("__tokens", "__features", "rawPrediction",
                  "probability", "prediction"))


def model_quality_filter(docs: DataFrame, model,
                         threshold: float = 0.5,
                         prob_col: str = _PROB_COL) -> DataFrame:
    """Keep documents scoring ≥ threshold; the score column stays
    attached for downstream mixture/selection stages to reuse."""
    return (score_documents(model, docs, prob_col)
            .filter(F.col(prob_col) >= threshold))
