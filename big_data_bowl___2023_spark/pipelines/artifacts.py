"""Per-batch corpus artifact store — the mergeable-sketch family as
one product surface.

Each ingest batch of a growing corpus leaves behind one bounded
artifact per standing question (membership / distincts / heavy keys /
frequencies / distributions / examples), and corpus-lifetime answers
come from merging artifacts — NEVER from rescanning old batches. This
module is the glue: one call writes every family member for a batch,
one call reads them back merged with each sketch's own merge law.

The layout is the correctness mechanism. Artifacts land under

    {out_dir}/{kind}/batch={batch_id}/...

and readers merge across ``batch=`` partitions. Three properties fall
out of the partitioning, without any bookkeeping:

* **coverage tracking for the additive sketches** — count-min cells,
  t-digest weights, and MG lower bounds ADD on merge (re-merging a
  batch double-counts it). Here each batch occupies exactly one
  partition, so the reader's merge sees every batch exactly once.
* **retry safety** — :func:`write_batch_artifacts` rewrites its own
  ``batch=N`` partitions via dynamic partition overwrite: a crashed-
  and-retried batch REPLACES its partial artifacts instead of
  appending a second copy. (The idempotent sketches — Bloom OR,
  bottom-k union — would shrug off duplicates anyway; the additive
  ones are the reason this matters.)
* **time travel / late audit** — dropping or filtering ``batch=``
  partitions re-derives any prefix's corpus state.

The per-batch write is a handful of bounded jobs over one batch (each
artifact is one scan + one bounded shuffle; see the family modules);
the read side merges KB–MB artifact rows only. The heavy-hitter
artifact is the summary HALF of the two-pass exact operator — exact
counts still need the recount join against the archived corpus
(``operators.heavy.heavy_hitters_from_summary``); the merged summary
read here is the guaranteed candidate superset.

Reference scope note: north-star extension (SURVEY.md §2 extensions);
composes dedup/bloom.py, operators/{cardinality,heavy,frequency,
quantiles,bottomk}.py.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dedup.bloom import bloom_parameters, bloom_summary
from ..operators.bottomk import bottomk_summary
from ..operators.cardinality import cardinality_summary
from ..operators.frequency import cms_parameters, cms_summary
from ..operators.heavy import mg_capacity, partition_summaries
from ..operators.quantiles import quantile_summary

KINDS = ("bloom", "cardinality", "heavy", "frequency", "quantiles",
         "samples")


class ArtifactSpec(NamedTuple):
    """Sizing knobs shared by every batch of one store. Keep ONE spec
    per store directory: the binary artifacts only merge when their
    parameters match (each module enforces its own check).

    ``bloom_expected_keys`` sizes the membership filter for the
    corpus LIFETIME (an overfull filter degrades fpr gracefully);
    ``heavy_min_freq_ratio`` is the phi the candidate guarantee must
    hold for; frequency defaults give a ~1 MB sketch."""

    id_col: str = "doc_id"
    text_col: str = "text"
    group_col: str = "source"
    bloom_expected_keys: int = 1_000_000
    bloom_fpr: float = 0.01
    heavy_min_freq_ratio: float = 0.001
    cms_epsilon: float = 1e-4
    cms_delta: float = 0.01
    compression: int = 200
    sample_k: int = 100


def _fingerprints(docs: DataFrame, spec: ArtifactSpec) -> DataFrame:
    return docs.select(F.md5(spec.text_col).alias("fingerprint"))


def batch_artifacts(docs: DataFrame, spec: ArtifactSpec = ArtifactSpec()
                    ) -> dict[str, DataFrame]:
    """The family's per-batch artifact DataFrames for one document
    batch (unwritten — :func:`write_batch_artifacts` adds the layout):

    * ``bloom`` — membership filter over content fingerprints;
    * ``cardinality`` — per-group HLL of distinct ids;
    * ``heavy`` — MG summaries of content fingerprints (boilerplate /
      mass-duplicate candidates);
    * ``frequency`` — count-min over content fingerprints;
    * ``quantiles`` — per-group t-digest of document lengths;
    * ``samples`` — bottom-k ids per group with (length) payload."""
    fps = _fingerprints(docs, spec)
    bloom_p = bloom_parameters(spec.bloom_expected_keys,
                               spec.bloom_fpr)
    cms_p = cms_parameters(spec.cms_epsilon, spec.cms_delta)
    lens = docs.select(
        spec.group_col, spec.id_col,
        F.length(spec.text_col).alias("n_chars_artifact"))
    return {
        "bloom": bloom_summary(fps, "fingerprint", *bloom_p),
        "cardinality": cardinality_summary(docs, spec.id_col,
                                           [spec.group_col]),
        "heavy": partition_summaries(
            fps, "fingerprint",
            mg_capacity(spec.heavy_min_freq_ratio)),
        "frequency": cms_summary(fps, "fingerprint", *cms_p),
        "quantiles": quantile_summary(lens, "n_chars_artifact",
                                      [spec.group_col],
                                      spec.compression),
        "samples": bottomk_summary(lens, spec.id_col, spec.sample_k,
                                   group_cols=[spec.group_col],
                                   payload_cols=["n_chars_artifact"]),
    }


def write_batch_artifacts(docs: DataFrame, out_dir: str,
                          batch_id: int,
                          spec: ArtifactSpec = ArtifactSpec()
                          ) -> None:
    """Write every family artifact for one batch under
    ``{out_dir}/{kind}/batch={batch_id}/``. Dynamic partition
    overwrite: retrying a batch id replaces its previous (possibly
    partial) artifacts — never double-counts them."""
    # six independent artifact jobs read the batch — persist once so
    # the micro-batch lineage (parse/transform/source read) executes
    # once, not six times per trigger
    docs = docs.persist()
    try:
        for kind, df in batch_artifacts(docs, spec).items():
            # per-WRITE dynamic overwrite (not a session-conf toggle:
            # two concurrent streams racing a global set/restore could
            # land a STATIC overwrite that wipes every other batch)
            (df.withColumn("batch", F.lit(int(batch_id)))
               .write.mode("overwrite").partitionBy("batch")
               .option("partitionOverwriteMode", "dynamic")
               .parquet(f"{out_dir}/{kind}"))
    finally:
        docs.unpersist()


def make_artifact_batch_fn(out_dir: str,
                           spec: ArtifactSpec = ArtifactSpec()):
    """``foreachBatch`` adapter: attach the artifact store to a
    document stream so every micro-batch leaves its sketches behind.

        stream.writeStream.foreachBatch(
            make_artifact_batch_fn(out_dir)).start()

    Micro-batch ids are Structured Streaming's batch ids — replayed
    batches (checkpoint recovery re-runs the last uncommitted batch)
    hit the dynamic-partition-overwrite path and REPLACE their
    earlier artifacts, so exactly-once artifact accounting falls out
    of the store's layout. Also directly callable with
    (batch_df, batch_id) for batch backfills."""
    def process(docs: DataFrame, batch_id: int) -> None:
        write_batch_artifacts(docs, out_dir, int(batch_id), spec)

    return process


def corpus_artifact_views(spark: SparkSession, out_dir: str,
                          spec: ArtifactSpec = ArtifactSpec(),
                          batches: Sequence[int] | None = None
                          ) -> dict[str, DataFrame]:
    """Corpus-lifetime artifacts merged across batch partitions with
    each sketch's own merge law (``batches`` restricts to a subset —
    the time-travel read). Output schemas match the family modules'
    single-pass builds, so every downstream helper (``might_contain``,
    ``cardinality_estimate``, ``heavy_hitters_from_summary``,
    ``estimate_counts``, ``quantile_estimate``, KMV) applies
    directly."""
    from ..dedup.bloom import merge_blooms
    from ..operators.bottomk import merge_bottomk
    from ..operators.cardinality import merge_cardinality
    from ..operators.frequency import merge_cms
    from ..operators.heavy import merge_summaries
    from ..operators.quantiles import merge_quantile_summaries

    def load(kind: str) -> DataFrame:
        df = spark.read.parquet(f"{out_dir}/{kind}")
        if batches is not None:
            df = df.filter(F.col("batch").isin([int(b)
                                                for b in batches]))
        return df.drop("batch")

    return {
        "bloom": merge_blooms(load("bloom")),
        "cardinality": merge_cardinality(
            load("cardinality"), group_cols=[spec.group_col]),
        "heavy": merge_summaries(load("heavy")),
        "frequency": merge_cms(load("frequency")),
        "quantiles": merge_quantile_summaries(
            load("quantiles"), compression=spec.compression,
            group_cols=[spec.group_col]),
        "samples": merge_bottomk(
            load("samples"), key_col=spec.id_col, k=spec.sample_k,
            group_cols=[spec.group_col],
            payload_cols=["n_chars_artifact"]),
    }
