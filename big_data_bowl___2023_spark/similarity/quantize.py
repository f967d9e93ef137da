"""Scalar (int8) embedding quantization — the STORAGE/IO compression
artifact for a corpus-scale embedding table, complementing product
quantization (similarity/pq.py):

* PQ compresses for SEARCH (m codes per vector, ADC table lookups,
  ~32× but lossy enough to need a re-rank stage);
* scalar quantization compresses for STORAGE AND TRANSFER: one int8
  per dimension against per-dimension [lo, hi] ranges — 4× smaller
  than float32 on disk (8× vs the double arrays the testdata
  carries), with a HARD per-dimension error bound of
  (hi − lo) / 254 / 2 (255 code points span 254 intervals), so
  dequantized vectors are drop-in inputs for any screening stage
  while exact stages re-fetch raw vectors for survivors only.

The ranges are a tiny mergeable artifact (2·dim doubles): computed
in ONE aggregation pass, persisted beside the codes table, merged
across ingest batches by element-wise min/max (``merge_ranges``) —
the same append-only artifact discipline as the sketch families.
Out-of-range values in LATER batches (a batch quantized against
yesterday's ranges) saturate to the range edge — lossy but bounded,
and the merged artifact tells the reader which batches predate which
ranges.

Spark mapping: everything is expressions (codegen scan for the
ranges aggregate; the encode/decode transforms are higher-order
functions — interpreted, but these are ONE-TIME storage passes per
batch, not per-pair inner loops, the same cost class as
``l2_normalize``). Search composes as quantized screen → exact
re-rank, mirroring ``pq_topk_rerank``.

Reference scope note: north-star extension (SURVEY.md §2 extensions,
E103); the reference has no vector surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V

_LEVELS = 255            # int8 code points used: −127 … +127 around 0


def embedding_ranges(df: DataFrame, vec_col: str = "embedding",
                     dim: int = 64) -> list:
    """Per-dimension [lo, hi] as a plain Python list of (lo, hi)
    pairs — ONE aggregation job (2·dim codegen min/max columns), a
    KB-scale artifact the encoder broadcasts as literals. NaN/Inf
    components are excluded from the ranges (nanvl-guarded), so a
    corrupt row cannot blow a dimension's range to ±Inf and zero out
    every real value's resolution."""
    v = V.as_double(F.col(vec_col))
    aggs = []
    for d in range(dim):
        x = F.element_at(v, d + 1)
        x = F.when(x.isNotNull() & ~F.isnan(x)
                   & (F.abs(x) < F.lit(float("inf"))), x)
        aggs.append(F.min(x).alias(f"lo{d}"))
        aggs.append(F.max(x).alias(f"hi{d}"))
    row = df.agg(*aggs).first()
    out = []
    for d in range(dim):
        lo, hi = row[f"lo{d}"], row[f"hi{d}"]
        if lo is None or hi is None:
            # an empty batch, or a dimension with zero finite values
            # — there is no range to learn; fail with the dimension
            # named instead of an opaque float(None) downstream
            raise ValueError(
                f"dimension {d} has no finite values "
                "(empty batch or fully corrupt column) — no range "
                "artifact can be built from it")
        out.append((float(lo), float(hi)))
    return out


def merge_ranges(a: list, b: list) -> list:
    """Element-wise min/max union of two range artifacts — the
    associative, idempotent merge law every mergeable artifact in
    the engine obeys; ranges from disjoint ingest batches combine to
    exactly the whole-corpus ranges."""
    if len(a) != len(b):
        raise ValueError(f"range dims differ: {len(a)} vs {len(b)}")
    return [(min(la, lb), max(ha, hb))
            for (la, ha), (lb, hb) in zip(a, b)]


def _spans(ranges: list) -> tuple:
    los = [lo for lo, _ in ranges]
    spans = [(hi - lo) if hi > lo else 1.0 for lo, hi in ranges]
    return los, spans


def saturation_report(df: DataFrame, ranges: list,
                      vec_col: str = "embedding") -> dict:
    """How much of ``df`` the frozen ``ranges`` would CLIP: encoding a
    later batch against build-time ranges saturates out-of-range
    values to the edges — bounded but lossy, and without a measurement
    a drifting embedding distribution erodes screen recall with no
    signal (the round-9 verdict's #2). ONE aggregation pass (dim clip
    counters + a per-row any-clip flag ride the same codegen agg):

    * ``rows`` / ``rows_clipped`` / ``row_fraction`` — rows with ≥ 1
      saturating dimension;
    * ``clipped_values`` / ``value_fraction`` — clipped values over
      the FINITE (row, dimension) slots (``finite_values`` — the
      population the encode can actually saturate);
    * ``per_dim`` — clip count per dimension; ``worst_dim`` /
      ``worst_dim_fraction`` — the dimension drifting hardest (the
      first thing to inspect before a rebuild), its fraction over
      that dimension's finite count.

    NaN/Inf components are corruption, not drift (the encoder NULLs
    them), so they count in neither numerator nor denominator —
    literally: every fraction's denominator is a finite-slot count,
    so a heavily corrupt batch cannot DILUTE the clipping signal of
    its healthy values (review r10 finding: an n·dim denominator
    understated drift in proportion to corruption). Missing slots
    (short or NULL vectors — which `_assign` refuses at write time)
    read as NULL, not an ANSI index error, and are likewise excluded.
    An empty batch reports zeros. Compose with the rebuild rule:
    when ``value_fraction`` exceeds the documented threshold
    (`index.SATURATION_REBUILD_THRESHOLD`), re-learn ranges on the
    accumulated corpus and rebuild — and cross-check distributional
    movement with ``operators.drift.embedding_psi_report`` (E114),
    which sees shifts long before they saturate."""
    dim = len(ranges)
    v = V.as_double(F.col(vec_col))
    clips, finites = [], []
    for d, (lo, hi) in enumerate(ranges):
        # F.get (0-based) returns NULL past the end where the ANSI
        # session's element_at raises — a short vector must surface
        # as _assign's engineered wrong-dimension error at the write,
        # not as an opaque agg crash in the monitoring pass
        x = F.get(v, d)
        finite = (x.isNotNull() & ~F.isnan(x)
                  & (F.abs(x) < F.lit(float("inf"))))
        finites.append(finite)
        clips.append(finite & ((x < F.lit(float(lo)))
                               | (x > F.lit(float(hi)))))
    any_clip = clips[0]
    for c in clips[1:]:
        any_clip = any_clip | c
    aggs = [F.count(F.lit(1)).alias("__n"),
            F.sum(any_clip.cast("long")).alias("__rows_clipped")]
    aggs += [F.sum(c.cast("long")).alias(f"__c{d}")
             for d, c in enumerate(clips)]
    aggs += [F.sum(fin.cast("long")).alias(f"__f{d}")
             for d, fin in enumerate(finites)]
    row = df.agg(*aggs).first()
    n = int(row["__n"])
    per_dim = [int(row[f"__c{d}"] or 0) for d in range(dim)]
    fin_dim = [int(row[f"__f{d}"] or 0) for d in range(dim)]
    rows_clipped = int(row["__rows_clipped"] or 0)
    clipped = sum(per_dim)
    finite_total = sum(fin_dim)
    worst = max(range(dim), key=lambda d: per_dim[d]) if n else 0
    return {
        "rows": n,
        "rows_clipped": rows_clipped,
        "row_fraction": rows_clipped / n if n else 0.0,
        "clipped_values": clipped,
        "finite_values": finite_total,
        "value_fraction": (clipped / finite_total
                           if finite_total else 0.0),
        "per_dim": per_dim,
        "worst_dim": worst,
        "worst_dim_fraction": (per_dim[worst] / fin_dim[worst]
                               if fin_dim[worst] else 0.0),
    }


def quantize_embeddings(df: DataFrame, ranges: list,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """(id, codes array<tinyint>): each dimension mapped affinely
    from its [lo, hi] onto −127…+127 with round-half-up, values
    outside the range SATURATED to the edges (later-batch drift is
    bounded, never wrapped). A degenerate dimension (hi == lo)
    encodes to −127 everywhere and decodes back to lo exactly.
    NaN/Inf components encode to NULL elements (corruption, not
    range drift — saturating them would launder a corrupt row into
    a legitimate-looking extreme); a NULL element makes the row's
    dequantized cosine fall to ``V.cosine``'s 0.0 degenerate score,
    so corrupt rows rank LAST in the quantized screen, matching the
    engine-wide degenerate-vector policy."""
    code = encode_codes(V.as_double(F.col(vec_col)), ranges)
    return df.select(F.col(id_col).alias("id"), code.alias("codes"))


def encode_codes(vec, ranges: list):
    """Column expression: array<double> → array<tinyint> under the
    affine per-dimension map (the body of :func:`quantize_embeddings`,
    exposed so composite layouts — e.g. the quantized ANN index —
    can encode alongside their own columns)."""
    los, spans = _spans(ranges)
    lo_arr = F.array(*[F.lit(float(x)) for x in los])
    sp_arr = F.array(*[F.lit(float(x)) for x in spans])

    def enc(x, i):
        sat = F.least(
            F.lit(127), F.greatest(
                F.lit(-127),
                F.round((x - F.element_at(lo_arr, i + 1))
                        / F.element_at(sp_arr, i + 1)
                        * F.lit(float(_LEVELS - 1))
                        - F.lit(127.0), 0)))
        # NaN must become NULL explicitly: Spark's least/greatest sort
        # NaN GREATEST, so the saturation alone would silently encode
        # a corrupt component as 127 — a legitimate-looking max-range
        # value that then outranks real neighbors in the screen
        # (Inf too: the ranges exclude it, so it is corruption, not
        # range drift — saturating it to the edge would also launder
        # a corrupt row into a legitimate extreme value)
        return F.when(x.isNull() | F.isnan(x)
                      | (F.abs(x) >= F.lit(float("inf"))),
                      F.lit(None)).otherwise(sat).cast("byte")

    return F.transform(vec, enc)


def dequantize(codes_col, ranges: list):
    """Column expression: codes array<tinyint> → array<double>
    midpoint reconstruction. |x − dequant(quant(x))| ≤ span/254/2
    per dimension for in-range x (the bound the tests pin)."""
    los, spans = _spans(ranges)
    lo_arr = F.array(*[F.lit(float(x)) for x in los])
    sp_arr = F.array(*[F.lit(float(x)) for x in spans])
    return F.transform(
        codes_col,
        lambda c, i: (c.cast("double") + F.lit(127.0))
        / F.lit(float(_LEVELS - 1))
        * F.element_at(sp_arr, i + 1)
        + F.element_at(lo_arr, i + 1))


def quantized_topk_rerank(codes: DataFrame, corpus: DataFrame,
                          queries: DataFrame, ranges: list, k: int,
                          shortlist: int | None = None,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """Quantized screen → EXACT cosine re-rank, the scalar-quant
    sibling of ``pq_topk_rerank``: (query_id, neighbor_id, cosine,
    rank). The corpus-wide pass reads ONLY the int8 codes table
    (¼ the float32 bytes), scores dequantized cosine against the
    broadcast queries, and keeps ``shortlist`` (default 5k)
    candidates per query; raw vectors are fetched for those few rows
    only and re-scored exactly — output cosines are bit-identical to
    the exact kernel, recall is the screen's (near-1 at int8
    resolution, pinned by pytest on the test corpus)."""
    if shortlist is None:
        shortlist = 5 * k
    dq = codes.select(F.col("id").alias("neighbor_id"),
                      dequantize(F.col("codes"), ranges).alias("nv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       V.as_double(F.col(vec_col)).alias("qv"))
    approx = F.nanvl(V.cosine(F.col("qv"), F.col("nv")), F.lit(0.0))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx"), F.asc("neighbor_id"))
    cand = (dq.join(F.broadcast(q),
                    F.col("query_id") != F.col("neighbor_id"))
            .withColumn("approx", approx)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= shortlist)
            .select("query_id", "neighbor_id"))

    from .pq import exact_rerank

    return exact_rerank(cand, corpus, queries, k, vec_col, id_col)
