"""MinHash + LSH banding near-dup detection.

Pipeline: shingle → k min-hashes per doc (signature) → band keys →
candidate pairs from band-key equality → exact Jaccard verification on
candidates only. The band join bounds the pair explosion to documents
that collide in ≥1 band: O(collisions), not O(n²) — the property that
makes near-dup dedup feasible at corpus scale.

Two implementations:

* ``minhash_band_pairs`` — engine-native, hash = md5(seed‖shingle)
  with *string* min (lexicographic). Fully deterministic and
  reproducible by any engine (the driver's DuckDB oracle re-derives
  identical signatures), no seed state.
* ``mllib_minhash_pairs`` — ``pyspark.ml.feature.MinHashLSH``
  (seeded), the stock MLlib scale path with approxSimilarityJoin.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ngram import shingle_docs

DEFAULT_PERMS = 8
DEFAULT_BANDS = 4


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 2,
                       num_perms: int = DEFAULT_PERMS) -> DataFrame:
    """One row per doc: h0..h{k-1} minhash signature columns plus the
    distinct-shingle count (needed for Jaccard verification). One
    shuffle (groupBy doc) regardless of k — the k hashes are computed
    in the map phase."""
    sh = shingle_docs(df, text_col, id_col, n)
    aggs = [F.min(F.md5(F.encode(F.concat(F.lit(str(i)), F.col("shingle")),
                                 "UTF-8"))).alias(f"h{i}")
            for i in range(num_perms)]
    aggs.append(F.count(F.lit(1)).alias("n_sh"))
    return sh.groupBy("doc_id").agg(*aggs)


def _band_df(sig: DataFrame, num_perms: int, bands: int) -> DataFrame:
    """Explode the signature into (doc_id, band, band_hash) rows."""
    rows_per_band = num_perms // bands
    structs = []
    for b in range(bands):
        parts = [F.col(f"h{b * rows_per_band + r}")
                 for r in range(rows_per_band)]
        structs.append(F.struct(
            F.lit(b).alias("band"),
            F.md5(F.encode(F.concat(*parts), "UTF-8")).alias("bh")))
    return (sig.select("doc_id",
                       F.explode(F.array(*structs)).alias("e"))
               .select("doc_id", "e.band", "e.bh"))


def band_candidates(bandsdf: DataFrame,
                    max_bucket: int | None = None,
                    band_cols: tuple[str, str] = ("band", "bh"),
                    id_col: str = "doc_id",
                    out_cols: tuple[str, str] = ("doc_a", "doc_b"),
                    ) -> DataFrame:
    """Distinct candidate id pairs from bucket-key equality, with the
    hot-bucket skew guard (VERDICT r2 #7).

    Uncapped, a bucket of m colliding rows yields m²/2 pairs — a
    degenerate corpus (many identical docs share EVERY bucket) turns
    the band join quadratic. With ``max_bucket`` set, buckets wider
    than the cap switch from the all-pairs self-join to STAR pairing
    against the bucket's min id: O(m) candidates per hot bucket, and
    downstream duplicate-cluster connectivity is preserved because
    every member still reaches the hub (for identical docs the hub
    pair verifies at similarity 1.0, so connected components are
    unchanged). Pairs between hot-bucket non-hub members that share no
    other small bucket are the recall cost — for the exact-duplicate
    pathology that cost is zero by construction.

    The bucket-size aggregation shuffles on the same key as the join
    itself, so the guard adds no new exchange key."""
    bc = list(band_cols)
    a_out, b_out = out_cols
    if max_bucket is None:
        a, b = bandsdf.alias("a"), bandsdf.alias("b")
        key = functools.reduce(operator.and_, [
            F.col(f"a.{c}") == F.col(f"b.{c}") for c in bc])
        return (a.join(b, key & (F.col(f"a.{id_col}")
                                 < F.col(f"b.{id_col}")))
                 .select(F.col(f"a.{id_col}").alias(a_out),
                         F.col(f"b.{id_col}").alias(b_out))
                 .distinct())
    sizes = (bandsdf.groupBy(*bc)
             .agg(F.count(F.lit(1)).alias("bkt_n"),
                  F.min(id_col).alias("hub")))
    tagged = bandsdf.join(sizes, bc)
    small = tagged.filter(F.col("bkt_n") <= max_bucket)
    a, b = small.alias("a"), small.alias("b")
    key = functools.reduce(operator.and_, [
        F.col(f"a.{c}") == F.col(f"b.{c}") for c in bc])
    allpairs = (a.join(b, key & (F.col(f"a.{id_col}")
                                 < F.col(f"b.{id_col}")))
                 .select(F.col(f"a.{id_col}").alias(a_out),
                         F.col(f"b.{id_col}").alias(b_out)))
    star = (tagged.filter(F.col("bkt_n") > max_bucket)
            .filter(F.col(id_col) != F.col("hub"))
            .select(F.col("hub").alias(a_out),
                    F.col(id_col).alias(b_out)))
    return allpairs.unionByName(star).distinct()


def minhash_band_pairs(df: DataFrame, threshold: float,
                       text_col: str = "text", id_col: str = "doc_id",
                       n: int = 2, num_perms: int = DEFAULT_PERMS,
                       bands: int = DEFAULT_BANDS,
                       max_bucket: int | None = None) -> DataFrame:
    """(doc_a, doc_b, jaccard) for band-colliding pairs whose exact
    shingle Jaccard ≥ threshold.

    ONE shuffle builds everything per-doc: raw (non-distinct) shingle
    rows aggregate to the k min-hashes (min is duplicate-insensitive,
    so distinct-ing first would be a wasted exchange), the distinct
    shingle SET (``collect_set``, bounded by document length), and its
    size. Verification then touches only candidate pairs: two joins
    against the small per-doc table and a codegen
    ``size(array_intersect(...))`` per pair — the round-1 shape
    re-shuffled the full shingle table per verify side (3M-row
    exchange at sf0.1); this one never shuffles shingle rows again.

    ``max_bucket`` arms the hot-bucket skew guard (``band_candidates``):
    (band, bh) buckets wider than the cap emit star pairs against the
    bucket min instead of all pairs, bounding a degenerate corpus of m
    identical docs at O(m) candidates instead of O(m²) while keeping
    every duplicate connected to its cluster hub."""
    toks_sh = shingle_docs(df, text_col, id_col, n, distinct=False)
    aggs = [F.min(F.md5(F.encode(F.concat(F.lit(str(i)), F.col("shingle")),
                                 "UTF-8"))).alias(f"h{i}")
            for i in range(num_perms)]
    aggs.append(F.collect_set("shingle").alias("sset"))
    per_doc = (toks_sh.groupBy("doc_id").agg(*aggs)
               .withColumn("n_sh", F.size("sset"))
               .cache())

    bandsdf = _band_df(per_doc, num_perms, bands)
    cand = band_candidates(bandsdf, max_bucket)

    sa = per_doc.select(F.col("doc_id").alias("doc_a"),
                        F.col("sset").alias("set_a"),
                        F.col("n_sh").alias("n_a"))
    sb = per_doc.select(F.col("doc_id").alias("doc_b"),
                        F.col("sset").alias("set_b"),
                        F.col("n_sh").alias("n_b"))
    shared = F.size(F.array_intersect(F.col("set_a"), F.col("set_b")))
    j = (shared
         / (F.col("n_a") + F.col("n_b") - shared).cast("double"))
    return (cand.join(sa, "doc_a").join(sb, "doc_b")
            .filter(j >= F.lit(threshold))
            .select("doc_a", "doc_b", F.round(j, 6).alias("jaccard")))


def mllib_minhash_pairs(df: DataFrame, threshold: float,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 2, num_hash_tables: int = 8,
                        seed: int = 42) -> DataFrame:
    """MLlib MinHashLSH scale path: HashingTF shingle vectors →
    approxSimilarityJoin at (1 - threshold) Jaccard distance.
    Seeded but hash-function-internal → driver checks rows-only."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = (shingle_docs(df, text_col, id_col, n)
          .groupBy("doc_id")
          .agg(F.collect_list("shingle").alias("shingles"))
          .filter(F.size("shingles") > 0))   # MinHashLSH needs ≥1 entry
    tf = HashingTF(inputCol="shingles", outputCol="features",
                   numFeatures=1 << 18, binary=True)
    feats = tf.transform(sh)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=num_hash_tables, seed=seed)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 1.0 - threshold,
                                       distCol="jaccard_dist")
    return (pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
            .select(F.col("datasetA.doc_id").alias("doc_a"),
                    F.col("datasetB.doc_id").alias("doc_b"),
                    F.round(1.0 - F.col("jaccard_dist"), 6).alias("jaccard")))


def lsh_candidate_probability(s: float, bands: int,
                              rows: int) -> float:
    """P(pair becomes a candidate | true Jaccard = s) under b bands
    of r rows: 1 − (1 − s^r)^b — the banding S-curve (Leskovec,
    Rajaraman & Ullman, "Mining of Massive Datasets" ch. 3). Driver
    arithmetic; the knob truth every tuning decision reads."""
    return 1.0 - (1.0 - s ** rows) ** bands


def tune_lsh_params(threshold: float, max_perms: int = 256,
                    fp_weight: float = 1.0,
                    fn_weight: float = 1.0,
                    steps: int = 1000) -> dict:
    """Choose (bands, rows_per_band) for a target Jaccard
    ``threshold`` — the knob an operator otherwise eyeballs from the
    S-curve. Pure driver arithmetic (no Spark job): search every
    (b, r) with b·r ≤ ``max_perms`` and minimize the weighted
    probability mass on the wrong side of the threshold,

        fp_weight · ∫₀^t P(s) ds  +  fn_weight · ∫ₜ¹ (1 − P(s)) ds

    (midpoint rule, ``steps`` intervals — the MMDS/datasketch
    criterion; false positives only cost verify work since every
    candidate is exactly verified, false negatives cost RECALL, so
    raise ``fn_weight`` when recall matters more than compute). Ties
    break toward fewer permutations (cheaper signatures), then more
    bands. The result plugs straight into ``minhash_band_pairs``:
    ``num_perms = bands · rows`` by construction, so the band split
    is always exact.

    Returns {"bands", "rows_per_band", "num_perms", "fp_mass",
    "fn_mass", "error", "recall_at_threshold", "s50"} — ``s50`` is
    the curve's midpoint (1/b)^(1/r), which lands near ``threshold``
    for a well-tuned pair."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got "
                         f"{threshold}")
    if max_perms < 2:
        raise ValueError("max_perms must be ≥ 2")
    if steps < 1:
        raise ValueError(f"steps must be ≥ 1, got {steps}")
    if fp_weight < 0 or fn_weight < 0 or fp_weight + fn_weight == 0:
        raise ValueError("weights must be non-negative and not both "
                         "zero (a zero objective makes every curve "
                         "'optimal')")
    w_lo = threshold / steps
    w_hi = (1.0 - threshold) / steps
    s_lo = [(i + 0.5) * w_lo for i in range(steps)]
    s_hi = [threshold + (i + 0.5) * w_hi for i in range(steps)]
    best = None
    for rows in range(1, max_perms + 1):
        # per-rows power grids once; the bands loop then updates
        # (1 − s^r)^b multiplicatively — the naive per-(b, r) curve
        # evaluation redid identical pows max_perms/r times over
        q_lo = [1.0 - s ** rows for s in s_lo]
        q_hi = [1.0 - s ** rows for s in s_hi]
        pow_lo = [1.0] * steps
        pow_hi = [1.0] * steps
        for bands in range(1, max_perms // rows + 1):
            fp = fn = 0.0
            for i in range(steps):
                pow_lo[i] *= q_lo[i]
                fp += (1.0 - pow_lo[i]) * w_lo
                pow_hi[i] *= q_hi[i]
                fn += pow_hi[i] * w_hi
            err = fp_weight * fp + fn_weight * fn
            key = (err, bands * rows, -bands)
            if best is None or key < best[0]:
                best = (key, bands, rows, fp, fn)
    _, bands, rows, fp, fn = best
    return {
        "bands": bands,
        "rows_per_band": rows,
        "num_perms": bands * rows,
        "fp_mass": round(fp, 6),
        "fn_mass": round(fn, 6),
        "error": round(fp_weight * fp + fn_weight * fn, 6),
        "recall_at_threshold": round(
            lsh_candidate_probability(threshold, bands, rows), 6),
        "s50": round((1.0 / bands) ** (1.0 / rows), 6),
    }
