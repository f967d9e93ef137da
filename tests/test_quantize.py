"""Scalar (int8) embedding quantization artifacts (round 9, E103):
per-dimension ranges as a mergeable artifact, saturating encode with
a hard reconstruction bound, and the quantized-screen → exact-rerank
search composition."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.similarity.ann import brute_force_topk
from big_data_bowl___2023_spark.similarity.quantize import (
    dequantize,
    embedding_ranges,
    merge_ranges,
    quantize_embeddings,
    quantized_topk_rerank,
)
from big_data_bowl___2023_spark.sources.io import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def ranges(emb):
    return embedding_ranges(emb, dim=64)


def test_ranges_match_numpy(emb, ranges):
    M = np.array([list(r.embedding) for r in emb.collect()],
                 dtype=np.float64)
    for d, (lo, hi) in enumerate(ranges):
        assert lo == pytest.approx(M[:, d].min(), abs=1e-6)
        assert hi == pytest.approx(M[:, d].max(), abs=1e-6)


def test_merge_ranges_laws(ranges):
    n = len(ranges)
    a = ranges[: n // 2] + [(lo - 1, hi) for lo, hi in ranges[n // 2:]]
    b = ranges[: n // 2] + [(lo, hi + 1) for lo, hi in ranges[n // 2:]]
    m = merge_ranges(a, b)
    assert m == merge_ranges(b, a)            # commutative
    assert merge_ranges(m, m) == m            # idempotent
    for (lo, hi), (la, ha), (lb, hb) in zip(m, a, b):
        assert lo == min(la, lb) and hi == max(ha, hb)
    with pytest.raises(ValueError, match="dims differ"):
        merge_ranges(a, a[:-1])


def test_disjoint_batch_ranges_merge_to_whole(emb):
    a = embedding_ranges(emb.filter(F.col("vec_id") % 2 == 0), dim=64)
    b = embedding_ranges(emb.filter(F.col("vec_id") % 2 == 1), dim=64)
    whole = embedding_ranges(emb, dim=64)
    assert merge_ranges(a, b) == whole


def test_roundtrip_error_bound(emb, ranges):
    """|x − dequant(quant(x))| ≤ span/254/2 per dimension, the hard
    bound the artifact promises; codes are genuine tinyints."""
    codes = quantize_embeddings(emb, ranges)
    assert dict(codes.dtypes)["codes"] == "array<tinyint>"
    back = codes.select("id", dequantize(F.col("codes"),
                                         ranges).alias("dq"))
    joined = (emb.select(F.col("vec_id").alias("id"), "embedding")
              .join(back, "id").collect())
    spans = [(hi - lo) if hi > lo else 1.0 for lo, hi in ranges]
    for r in joined:
        for d, (x, y) in enumerate(zip(r.embedding, r.dq)):
            assert abs(float(x) - y) <= spans[d] / 254 / 2 + 1e-12, (
                r.id, d)


def test_saturation_and_degenerate_dim(spark):
    df = spark.createDataFrame(
        [(1, [5.0, 3.0]), (2, [-5.0, 3.0])],
        "vec_id long, embedding array<double>")
    ranges = [(-1.0, 1.0), (3.0, 3.0)]     # dim0 out-of-range both ways
    rows = {r.id: list(r.codes) for r in
            quantize_embeddings(df, ranges).collect()}
    assert rows[1][0] == 127 and rows[2][0] == -127   # saturated
    assert rows[1][1] == -127                          # degenerate dim
    back = (quantize_embeddings(df, ranges)
            .select(dequantize(F.col("codes"), ranges).alias("dq"))
            .collect())
    assert all(abs(r.dq[1] - 3.0) < 1e-12 for r in back)  # exact lo


def test_nan_inf_components_encode_to_null(spark):
    """Spark's least/greatest sort NaN GREATEST, so without the
    explicit guard a corrupt component would saturate to code 127 —
    a legitimate-looking max-range value that outranks real
    neighbors. The contract: NaN/Inf → NULL element, and the row's
    dequantized cosine falls to the 0.0 degenerate score."""
    df = spark.createDataFrame(
        [(1, [float("nan"), 0.5]), (2, [float("inf"), 0.5]),
         (3, [0.5, 0.5])],
        "vec_id long, embedding array<double>")
    ranges = [(-1.0, 1.0), (-1.0, 1.0)]
    rows = {r.id: list(r.codes) for r in
            quantize_embeddings(df, ranges).collect()}
    assert rows[1][0] is None and rows[2][0] is None
    assert rows[3][0] is not None
    # corrupt rows score 0.0 (rank last), never as extreme vectors
    from big_data_bowl___2023_spark.functions import vectors as V
    dq = (quantize_embeddings(df, ranges)
          .select("id", dequantize(F.col("codes"), ranges).alias("v")))
    scored = dq.select(
        "id", F.round(V.cosine(F.col("v"),
                               F.array(F.lit(1.0), F.lit(1.0))), 6)
        .alias("c")).collect()
    by_id = {r.id: r.c for r in scored}
    assert by_id[1] == 0.0 and by_id[2] == 0.0 and by_id[3] > 0.9


def test_ranges_refuse_corrupt_dimension(spark):
    df = spark.createDataFrame(
        [(1, [float("nan"), 0.5]), (2, [float("inf"), 0.7])],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="dimension 0 has no finite"):
        embedding_ranges(df, dim=2)
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no finite values"):
        embedding_ranges(empty, dim=2)


def test_quantized_rerank_matches_exact_topk(emb, ranges):
    """End-to-end: int8 screen + exact re-rank reproduces the exact
    brute-force top-k on the test corpus — same neighbors, same
    bit-exact cosines (the re-rank IS the exact kernel; the screen
    only has to not lose a true neighbor at int8 resolution)."""
    queries = emb.limit(8)
    codes = quantize_embeddings(emb, ranges).cache()
    got = {(r.query_id, r.neighbor_id, r.cosine, r.rank) for r in
           quantized_topk_rerank(codes, emb, queries, ranges,
                                 k=5).collect()}
    want = {(r.query_id, r.neighbor_id, r.cosine, r.rank) for r in
            brute_force_topk(emb, queries, 5).collect()}
    assert got == want and got


def test_saturation_report_in_range_batch_is_zero(spark, emb, ranges):
    """A batch drawn from the distribution the ranges were learned on
    clips nothing."""
    from big_data_bowl___2023_spark.similarity.quantize import (
        saturation_report,
    )

    rep = saturation_report(emb.limit(50), ranges)
    assert rep["rows"] == 50
    assert rep["clipped_values"] == 0 and rep["rows_clipped"] == 0
    assert rep["value_fraction"] == 0.0 and rep["row_fraction"] == 0.0


def test_saturation_report_measures_drift(spark, ranges):
    """A drifted batch (dim 0 pushed past the learned hi, dim 1 past
    lo) is measured exactly: per-dim counts, worst dim, fractions.
    NaN components count in neither numerator nor denominator
    (corruption, not drift)."""
    from big_data_bowl___2023_spark.similarity.quantize import (
        saturation_report,
    )

    lo0, hi0 = ranges[0]
    lo1, hi1 = ranges[1]
    base = [0.0] * 64
    rows = []
    for i in range(8):          # 8 rows clip dim 0 high
        v = list(base)
        v[0] = hi0 + 1.0
        rows.append((i, v))
    for i in range(8, 12):      # 4 rows clip dim 1 low
        v = list(base)
        v[1] = lo1 - 1.0
        rows.append((i, v))
    v = list(base)
    v[2] = float("nan")         # 1 corrupt row, clips nothing
    rows.append((12, v))
    rows.append((13, list(base)))   # 1 clean in-range row
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>")
    rep = saturation_report(df, ranges)
    assert rep["rows"] == 14
    assert rep["per_dim"][0] == 8 and rep["per_dim"][1] == 4
    assert sum(rep["per_dim"]) == 12 == rep["clipped_values"]
    assert rep["rows_clipped"] == 12
    assert rep["worst_dim"] == 0
    # denominators are FINITE-slot counts (review r10: an n·dim
    # denominator diluted the clip signal by the corruption rate):
    # 14·64 slots minus the one NaN slot = 895 finite values; dim 0
    # is finite in all 14 rows
    assert rep["finite_values"] == 14 * 64 - 1
    assert rep["worst_dim_fraction"] == pytest.approx(8 / 14)
    assert rep["value_fraction"] == pytest.approx(12 / 895)


def test_append_monitors_saturation_and_history(spark, emb, tmp_path):
    """VERDICT r9 #2: a quantized-index append measures what the
    frozen ranges clip, logs it to the _index_saturation history,
    warns past the rebuild threshold, and a rebuild clears the
    (old-ranges) history. Float indexes return None and log nothing."""
    import warnings

    from big_data_bowl___2023_spark.similarity import (
        append_to_index,
        build_ann_index,
        saturation_history,
    )

    idx = str(tmp_path / "qidx")
    b1 = emb.filter(F.col("vec_id") % 2 == 0)
    build_ann_index(b1, idx, quantize=True)
    assert saturation_history(spark, idx) is None

    # in-range append: report ~0, one history row, no warning
    b2 = emb.filter(F.col("vec_id") % 2 == 1)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        rep = append_to_index(b2, idx)
    assert rep is not None and rep["value_fraction"] < 0.01
    hist = saturation_history(spark, idx)
    assert hist.count() == 1

    # drifted append: all of dim 0 pushed far past hi → warning +
    # measured fraction ≈ 1/64
    drifted = b2.limit(20).withColumn(
        "embedding",
        F.transform(F.col("embedding"),
                    lambda x, i: F.when(i == 0, F.lit(1e6))
                    .otherwise(x)))
    with pytest.warns(UserWarning, match="saturates"):
        rep2 = append_to_index(drifted, idx)
    assert rep2["per_dim"][0] == 20
    # ≥ 1/64: every row clips the injected dim; the odd-id half can
    # also clip a few dims naturally against even-half-learned ranges
    assert rep2["value_fraction"] >= 1 / 64
    assert rep2["worst_dim"] == 0 and rep2["worst_dim_fraction"] == 1.0
    assert saturation_history(spark, idx).count() == 2

    # monitoring is skippable; nothing logged
    append_to_index(b2.limit(5), idx, monitor_saturation=False)
    assert saturation_history(spark, idx).count() == 2

    # a rebuild re-learns ranges → the old history must not survive
    build_ann_index(emb, idx, quantize=True)
    assert saturation_history(spark, idx) is None

    # float index: no report, no history
    fidx = str(tmp_path / "fidx")
    build_ann_index(b1, fidx)
    assert append_to_index(b2, fidx) is None
    assert saturation_history(spark, fidx) is None
