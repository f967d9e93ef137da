"""The full corpus-curation → training-shard export pipeline.

Each stage already exists as a tested operator; this module is the
PRODUCT composition — the one function a data engineer calls to turn
a raw document table into packed training shards:

    [HTML→text extraction (C4 §2.1)] → [language gate] →
    quality gate (Gopher rules) → [n-gram repetition ceilings
    (Gopher A1)] → [learned quality filter
    (fastText-style classifier)] → PII redaction →
    [corpus-wide repeated-line scrub (C4 rule)] → exact dedup →
    near-dup cluster resolution (MinHash-LSH → connected components,
    keep best per cluster) → [verbatim-overlap dedup (winnowing)] →
    benchmark decontamination → [DSIR target-domain selection] →
    [per-source quota cap] → context-window chunking →
    per-source token-budget packing →
    sharded JSONL export (partitioned by source/shard)

    Bracketed stages are opt-in (``html_input`` / ``lang_keep`` /
    ``repetition_rules`` / ``quality_model`` /
    ``line_dedup_min_chars`` / ``overlap_shared`` / ``dsir_target`` /
    ``max_docs_per_source`` arguments); embedding-space
    SemDeDup runs separately on the embeddings table
    (dedup/semantic.py) because it keys on vectors, not text.

Stages compose as Catalyst chains between PINNED fan-out boundaries
(session.pin — the scrub input, the dedup survivor sets): a boundary
consumed by two downstream subtrees materializes once instead of
re-deriving the whole upstream per consumer. The returned stats (one
count per stage) are the audit record a curation run must emit
anyway. At 100 TB each stage keeps its own scale contract
(documented in its module) — the composition adds no new shuffles
beyond the stages themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup import (
    canonical_docs,
    exact_dedup,
    minhash_band_pairs,
    remove_repeated_lines,
)
from ..dedup.decontaminate import decontaminate
from ..dedup.winnow import fingerprint_overlap_pairs
from ..operators.dsir import dsir_resample
from ..functions.gopher import gopher_filter
from ..functions.quality_model import model_quality_filter
from ..functions.redact import redact_documents
from ..functions import text as Tx
from ..operators.chunking import chunk_sequences
from ..operators.sampling import cap_per_group, pack_by_budget
from ..session import pin
from ..sources.io import write_jsonl


def curation_frame(docs: DataFrame,
                   benchmark: DataFrame | None = None,
                   seq_len: int = 512,
                   shard_budget: int = 4096,
                   jaccard_threshold: float = 0.3,
                   min_words: int = 50,
                   overlap_shared: int | None = None,
                   dsir_target: DataFrame | None = None,
                   dsir_n_docs: int | None = None,
                   line_dedup_min_chars: int | None = None,
                   quality_model=None,
                   quality_model_threshold: float = 0.5,
                   max_docs_per_source: int | None = None,
                   html_input: bool = False,
                   lang_keep: list | None = None,
                   repetition_rules: bool = False,
                   stage_hook=None) -> DataFrame:
    """Build the full curation chain and return the packed frame
    (one row per training chunk with its (source, shard)
    assignment) — the caller picks the sink: ``curate_and_export``
    writes JSONL shards, the bench runs it through the noop sink to
    time pure compute. Fan-out boundaries materialize eagerly at
    build time (see below); everything between them stays one lazy
    Catalyst chain.

    ``stage_hook(key, frame)``, when given, is called at every stage
    boundary — ``curate_and_export`` uses it for the per-stage audit
    counts. A hook that returns the row count (as the audit tally
    does) lets the DSIR default reuse it instead of re-counting the
    raw corpus. A hook that returns a **DataFrame** REPLACES the
    boundary frame in the chain — the injection point
    `curation_audit` uses to pin each stage's output so every stage
    evaluates exactly once instead of once per downstream prefix
    (any value-preserving wrap is legal; changing the rows is the
    hook author's foot-gun).

    Fan-out boundaries consumed by MORE THAN ONE downstream subtree
    (the scrub input, the exact-dedup output, the near-dup survivor
    set) are PINNED here (``session.pin``) unless the hook already
    replaced them: without the pin every consumer re-evaluates the
    whole upstream chain — the sf0.1 bench plan held 28 parquet
    scans and 102 exchanges of pure re-derivation (guide §2.4), and
    at corpus scale each re-derivation is a full extra pass. The
    pins materialize at plan-build time, so the chain is no longer
    construction-lazy; it still computes everything from the inputs
    on every call, and the caller-visible rows are unchanged in
    every pin-durability mode."""
    def hook(key: str, frame: DataFrame):
        if stage_hook is None:
            return None, frame, False
        r = stage_hook(key, frame)
        if isinstance(r, DataFrame):
            return None, r, True
        return r, frame, False

    input_n, docs, _ = hook("input", docs)

    if html_input:
        # web-crawl front door (C4 §2.1 / RefinedWeb §3.1): markup +
        # boilerplate-line extraction BEFORE any quality/dedup stage,
        # so every downstream rule sees prose, not tag soup. A pure
        # projection — Catalyst fuses it into the gopher_filter scan,
        # adding zero jobs or shuffles (functions/html.py).
        from ..functions.html import extract_html_text
        docs = docs.withColumn("text", extract_html_text(F.col("text")))
        _, docs, _ = hook("after_html_extract", docs)

    if lang_keep is not None:
        # language gate BEFORE the quality rules (the CCNet /
        # RefinedWeb order: off-language pages shouldn't spend
        # quality/dedup compute): marker-stopword language ID
        # (functions/text.py::detect_lang) — a pure codegen
        # predicate, fused into the same scan as everything else
        docs = docs.filter(Tx.detect_lang(F.col("text"))
                           .isin(list(lang_keep)))
        _, docs, _ = hook("after_lang_filter", docs)

    quality = gopher_filter(docs, min_words=min_words)
    _, quality, _ = hook("after_quality", quality)

    if repetition_rules:
        # the aggregation half of the Gopher rule set (A1 top/dup
        # n-gram character ceilings): one extra (id, n, gram)
        # shuffle over the quality survivors only — after the cheap
        # projection gate, before any dedup pays per-doc cost
        from ..functions.gopher import repetition_filter
        quality = repetition_filter(quality)
        _, quality, _ = hook("after_repetition", quality)

    if quality_model is not None:
        # learned second gate (functions/quality_model.py): scoring
        # is a broadcast-model map pass, no shuffle added.
        quality = model_quality_filter(
            quality, quality_model,
            threshold=quality_model_threshold).drop("quality_prob")
        _, quality, _ = hook("after_model_quality", quality)

    clean = redact_documents(quality)

    if line_dedup_min_chars is not None:
        # corpus-wide boilerplate scrub (C4 repeated-span rule) BEFORE
        # exact dedup: stripping shared footers/banners first lets the
        # whole-text fingerprint see the real content. The scrub
        # consumes its input twice (stats pass + rewrite pass) — pin
        # the gate/redaction prefix so both passes read one
        # materialization instead of re-running the upstream chain.
        clean = pin(clean)
        clean = remove_repeated_lines(clean,
                                      min_chars=line_dedup_min_chars)
        _, clean, _ = hook("after_line_dedup", clean)

    deduped = exact_dedup(clean).drop("fingerprint")
    _, deduped, replaced = hook("after_exact_dedup", deduped)
    if not replaced:
        # fan-out: consumed by the MinHash pair mine AND the survivor
        # window below
        deduped = pin(deduped)

    pairs = minhash_band_pairs(deduped, jaccard_threshold)
    # keep the longest doc per near-dup cluster (id tiebreak)
    withlen = deduped.withColumn("__len", F.length("text"))
    canon = (canonical_docs(withlen, pairs, prefer_col="__len")
             .drop("__len", "cluster_id"))
    _, canon, replaced = hook("after_near_dedup", canon)
    if not replaced and (overlap_shared is not None
                        or benchmark is not None):
        # fan-out: the winnow stage consumes canon for fingerprints
        # AND the keep-longest window; decontamination consumes it
        # for the shingle probe AND the anti-join pass-through
        canon = pin(canon)

    if overlap_shared is not None:
        # verbatim-overlap (winnowed fingerprint) dedup: same
        # keep-longest rule over overlap clusters as the MinHash stage
        ov = fingerprint_overlap_pairs(canon, min_shared=overlap_shared,
                                       max_doc_freq=1000)
        withlen = canon.withColumn("__len", F.length("text"))
        canon = (canonical_docs(withlen, ov, prefer_col="__len")
                 .drop("__len", "cluster_id"))
        _, canon, replaced = hook("after_overlap_dedup", canon)
        if not replaced and benchmark is not None:
            canon = pin(canon)

    if benchmark is not None:
        canon = decontaminate(canon, benchmark)
        _, canon, replaced = hook("after_decontamination", canon)
        if not replaced and dsir_target is not None:
            # DSIR consumes its raw side twice (feature pass + the
            # final selected join)
            canon = pin(canon)

    if dsir_target is not None:
        n_sel = dsir_n_docs or max(
            1, (input_n if input_n is not None else docs.count()) // 2)
        canon = dsir_resample(canon, dsir_target, n_sel) \
            .drop("logw", "key")
        _, canon, _ = hook("after_dsir_selection", canon)

    if max_docs_per_source is not None:
        # RefinedWeb-style per-source quota AFTER dedup/selection so
        # the cap counts surviving docs, not raw crawl volume.
        canon = cap_per_group(canon, ["source"], max_docs_per_source)
        _, canon, _ = hook("after_source_cap", canon)

    # `source` rides the chunk explode instead of a join-back against
    # canon — the join re-evaluated the whole surviving chain once
    # more just to attach one metadata column (guide §2.4); the
    # carried column produces the identical rows.
    chunks = chunk_sequences(canon, seq_len, carry_cols=("source",))
    _, chunks, _ = hook("chunks", chunks)

    return pack_by_budget(chunks, shard_budget, "n_tokens",
                          ["source"], id_col="doc_id")


def curate_and_export(docs: DataFrame, out_dir: str,
                      lazy_stats: bool = False, **kwargs) -> dict:
    """Run the pipeline and write shards; returns per-stage counts.
    Accepts every :func:`curation_frame` keyword.

    Shards are packed per source (the parallelism unit — a global
    pack would serialize) and written as JSONL partitioned by
    (source, shard) for straight consumption by a trainer.

    ``lazy_stats=False`` (default) counts after every stage — the
    audit record a curation run must emit anyway, at the cost of one
    extra job per stage. ``lazy_stats=True`` skips every count so
    only the fan-out boundary pins and the export action run — the
    100 TB mode when the audit comes from the written manifest
    instead."""
    stats: dict = {}

    def tally(key: str, frame: DataFrame):
        if not lazy_stats:
            stats[key] = frame.count()
            return stats[key]
        return None

    packed = curation_frame(docs, stage_hook=tally, **kwargs)
    write_jsonl(packed.repartition("source", "shard")
                .sortWithinPartitions("doc_id", "seq_idx"),
                out_dir)
    if not lazy_stats:
        stats["shards"] = (packed.select("source", "shard")
                           .distinct().count())
    return stats


def curation_audit(docs: DataFrame, min_words: int = 50,
                   pin_handles: list | None = None,
                   **kwargs) -> DataFrame:
    """Per-DOCUMENT curation lineage: (doc_id, source, stage, reason,
    detail) — for every input document, either the FIRST stage that
    dropped it (with a human-debuggable reason) or ``stage="kept"``.
    The per-stage COUNTS `curate_and_export` emits say how many died
    where; this answers the question an operator actually asks when a
    slice of a 100 TB corpus vanishes: WHICH documents, and WHY.

    Built from the same lazy chain as :func:`curation_frame` (every
    keyword forwards): each doc-grain stage boundary is captured via
    the existing ``stage_hook``, drops are id-only anti-joins between
    consecutive boundaries, and reasons are enriched where the stage
    has per-document structure to expose —

    * the Gopher gate names the FIRST FAILING RULE (`gopher.flags`,
      evaluated only over the dropped subset);
    * exact dedup names the kept twin (``detail`` = the min-id
      SURVIVOR sharing the raw fingerprint; NULL when the collision
      was created by an upstream rewrite, so detail never names a
      doc absent from the corpus);
    * the line scrub never drops rows — it EMPTIES fully-boilerplate
      docs, whose husks would die later at exact dedup — so emptied
      docs are attributed here (``emptied_by_line_scrub``), where
      the cause is, not where the husk happens to fall;
    * every other stage tags its cause label (near_duplicate,
      verbatim_overlap, benchmark_contaminated, not_selected_dsir,
      source_quota, quality_model).

    Cost: ONE pipeline evaluation (verdict r10 #3 — previously one
    PREFIX evaluation per stage, ~stages× the pipeline). The capture
    hook PINS each doc-grain boundary (`session.pin` — the boundary
    frame it hands back into the chain), so stage i+1 computes from
    stage i's materialization instead of re-running the prefix, and
    every audit branch reads pinned data. The price is stage-count ×
    corpus bytes of pin storage held until the audit result is
    consumed (pass ``pin_handles=[]`` to receive the pinned frames
    and ``unpersist()`` them after — only meaningful under durable
    pins; localCheckpoint blocks free on GC). Every join here
    carries ids only — document text is touched just twice (the
    gopher re-flag and the fingerprint join, both restricted to
    dropped/duplicated docs). At full corpus scale the pin storage,
    not CPU, is now the budget: sample (``docs.sample(...)``) when
    stage-count × corpus exceeds scratch disk."""
    from ..dedup.exact import fingerprint_docs
    from ..functions.gopher import flags as gopher_flags_fn
    from ..session import pin

    reasons = {
        "after_lang_filter": "wrong_language",
        "after_quality": "gopher",           # enriched below
        "after_repetition": "ngram_repetition",
        "after_model_quality": "quality_model",
        "after_line_dedup": "emptied_by_line_scrub",
        "after_exact_dedup": "exact_duplicate",
        "after_near_dedup": "near_duplicate",
        "after_overlap_dedup": "verbatim_overlap",
        "after_decontamination": "benchmark_contaminated",
        "after_dsir_selection": "not_selected_dsir",
        "after_source_cap": "source_quota",
    }
    captured: list[tuple[str, DataFrame]] = []
    # reason-enrichment must see the text the STAGES saw: under
    # html_input the gopher rules (and the dedup fingerprint key)
    # run on post-extraction text, so a tag-soup page with many raw
    # "words" that extracts to '' must be re-flagged against the
    # extracted text, not the markup (review r15)
    text_source = [docs]

    def capture(key, frame):
        if key == "after_html_extract":
            pinned = pin(frame)
            if pin_handles is not None:
                pin_handles.append(pinned)
            text_source[0] = pinned
            return pinned
        if key not in reasons:
            return None              # input / chunk-grain stages
        pinned = pin(frame)
        if pin_handles is not None:
            pin_handles.append(pinned)
        captured.append((key, pinned))
        return pinned                # replaces the boundary in-chain

    curation_frame(docs, stage_hook=capture, min_words=min_words,
                   **kwargs)
    text_docs = text_source[0]

    prev = docs.select("doc_id", "source")
    parts: list[DataFrame] = []
    for key, frame in captured:
        if key not in reasons:
            continue                     # input / chunk-grain stages
        if key == "after_line_dedup":
            # the scrub never DROPS a doc — it empties the ones whose
            # every line was boilerplate, and the husks die later at
            # exact dedup (all empty texts share one fingerprint).
            # Attribute them HERE, where the cause is (review r10
            # finding: the anti-join at this boundary is always empty
            # and the husks were mislabeled exact_duplicate).
            # "empty" must mean what the FINGERPRINT means by it: a
            # husk reduced to whitespace/newlines only (trim strips
            # spaces, not \n — review r10) normalizes to zero tokens
            emptied = (frame.filter(
                F.size(Tx.norm_tokens(F.col("text"))) == 0)
                .select("doc_id"))
            parts.append(prev.join(emptied, "doc_id", "semi")
                         .withColumn("stage", F.lit(key))
                         .withColumn("reason",
                                     F.lit(reasons[key]))
                         .withColumn("detail",
                                     F.lit(None).cast("string")))
            prev = prev.join(emptied, "doc_id", "left_anti")
            continue
        cur = frame.select("doc_id")
        dropped = (prev.join(cur, "doc_id", "left_anti")
                   .withColumn("stage", F.lit(key))
                   .withColumn("reason", F.lit(reasons[key]))
                   .withColumn("detail",
                               F.lit(None).cast("string")))
        if key == "after_quality":
            # name the first failing rule: re-flag ONLY the dropped
            # docs (map-side over a drop-sized join back to text)
            txt = dropped.join(text_docs.select("doc_id", "text"),
                               "doc_id")
            rule_flags = gopher_flags_fn(F.col("text"),
                                         min_words=min_words)
            first_fail = F.coalesce(
                *[F.when(~passes, F.lit(name))
                  for name, passes in rule_flags.items()],
                F.lit("null_text"))
            dropped = txt.select(
                "doc_id", "source", "stage",
                first_fail.alias("reason"),
                F.lit(None).cast("string").alias("detail"))
        elif key == "after_exact_dedup":
            # name the kept twin: the dropped doc's RAW fingerprint
            # joined to the min-id doc sharing it AMONG THE STAGE'S
            # SURVIVORS — so detail can only ever name a doc that is
            # actually in the corpus (review r10: an unrestricted
            # min-per-raw-fingerprint could name a fellow DROPPED doc
            # when the pipeline deduped on rewritten text). A
            # collision CREATED by an upstream rewrite (redaction,
            # line scrub) has no surviving raw twin — detail stays
            # NULL there; stage and reason are exact regardless.
            fp = fingerprint_docs(text_docs).select("doc_id",
                                                    "fingerprint")
            canon = (fp.join(cur, "doc_id", "semi")
                     .groupBy("fingerprint")
                     .agg(F.min("doc_id").alias("__kept")))
            dropped = (dropped.drop("detail")
                       .join(fp, "doc_id")
                       .join(canon, "fingerprint", "left")
                       .select("doc_id", "source", "stage", "reason",
                               F.col("__kept").cast("string")
                               .alias("detail")))
        parts.append(dropped)
        prev = prev.join(cur, "doc_id", "semi")

    kept = (prev.withColumn("stage", F.lit("kept"))
            .withColumn("reason", F.lit("kept"))
            .withColumn("detail", F.lit(None).cast("string")))
    out = kept
    for p in parts:
        out = out.unionByName(p)
    return out.select("doc_id", "source", "stage", "reason", "detail")


def curation_report(docs: DataFrame) -> DataFrame:
    """Pre-flight per-source health: doc counts, Gopher pass rate,
    token volume — the numbers that decide thresholds BEFORE running
    the pipeline. One aggregation scan."""
    from ..functions.gopher import all_pass

    return (docs.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg(all_pass(F.col("text"))
                               .cast("double")), 6)
                 .alias("gopher_pass_rate"),
                 F.sum(Tx.token_count(F.col("text"))).alias("n_tokens")))


def corpus_profile(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   source_col: str = "source") -> DataFrame:
    """Per-source corpus data card — the one-call report that feeds
    dataset documentation and threshold decisions before a curation
    run: (source, n_docs, n_tokens, avg_tokens, gopher_pass_rate,
    mean_quality, en_share, compression_p50, exact_dup_rate).

    ONE corpus text pass regardless of size (r16; previously two):
    a single scan computes every per-document signal (token counts,
    Gopher flags, heuristic quality, language ID, zlib compression
    ratio, md5 fingerprint) map-side; the narrow signal table
    (~9 scalars/doc, no text) is pinned and BOTH aggregates read it —
    the per-source signal fold, and the exact-duplicate rate's
    fingerprint shuffle (count per md5, docs in shared fingerprints)
    whose tiny per-source tally joins back broadcast-side. At corpus
    scale the pin trades a ~100 B/doc materialization for a second
    full read+decompress of the text column. Medians use Spark's
    exact ``percentile`` (same interpolation DuckDB's quantile_cont
    applies, so the card is oracle-checkable).
    """
    from ..functions.gopher import all_pass
    from ..functions.text import compression_ratio_udf, detect_lang

    enriched = pin(docs.select(
        F.col(source_col).alias("source"),
        Tx.token_count(F.col(text_col)).alias("__tok"),
        all_pass(F.col(text_col)).cast("double").alias("__pass"),
        Tx.quality_score(F.col(text_col)).alias("__q"),
        (detect_lang(F.col(text_col)) == "en")
        .cast("double").alias("__en"),
        compression_ratio_udf()(F.col(text_col)).alias("__c"),
        Tx.fingerprint(F.col(text_col)).alias("fingerprint")))
    base = (enriched.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__tok").alias("n_tokens"),
        F.round(F.avg("__tok"), 6).alias("avg_tokens"),
        F.round(F.avg("__pass"), 6).alias("gopher_pass_rate"),
        F.round(F.avg("__q"), 6).alias("mean_quality"),
        F.round(F.avg("__en"), 6).alias("en_share"),
        F.round(F.expr("percentile(__c, 0.5)"), 6)
        .alias("compression_p50")))

    from pyspark.sql import Window

    # the dup-rate pass reads the PINNED signal table — source rides
    # along, no join-back, and the text column is never re-scanned
    fp = enriched.select("source", "fingerprint")
    shared = (fp.withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy("fingerprint")))
        .filter(F.col("__n") > 1)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("__dups")))
    return (base.join(F.broadcast(shared), "source", "left")
            .withColumn("exact_dup_rate",
                        F.round(F.coalesce(F.col("__dups"), F.lit(0))
                                / F.col("n_docs"), 6))
            .drop("__dups"))


def curation_sequences(docs: DataFrame, seq_len: int = 2048,
                       sep_tokens: int = 1,
                       stage_hook=None, **kwargs) -> DataFrame:
    """The trainer-facing output mode: run the SAME gate chain as
    :func:`curation_frame` (every keyword forwards), then emit
    cross-document packed-sequence manifests
    (``operators.chunking.assemble_sequences`` → one record per
    training sequence, per-source streams) instead of per-doc chunk
    shards. Use when the consumer is a pretraining loader that wants
    fixed ``seq_len`` windows crossing document boundaries rather
    than document-grain JSONL.

    Everything stays lazy: the chunk/pack tail of the underlying
    chain is constructed but never executed — only the manifest plan
    the caller acts on runs. ``seq_len`` here is the TRAINING
    sequence length (the forwarded chain's own ``seq_len`` is
    irrelevant because its chunk stage is discarded)."""
    from ..operators.chunking import assemble_sequences, sequence_manifest

    captured: dict = {}
    # boundaries that can be the curated corpus the manifest reads —
    # pin them via the replacement protocol (unless the user hook
    # already replaced), so the manifest consumes a materialization
    # and the chain's own internal fan-out pins are not duplicated
    terminal = ("after_source_cap", "after_dsir_selection",
                "after_decontamination", "after_overlap_dedup",
                "after_near_dedup")

    def capture(key, frame):
        from ..session import pin

        r = stage_hook(key, frame) if stage_hook is not None else None
        # when the user hook exercises the DataFrame-replacement
        # protocol (e.g. a pin-injecting audit hook), the chain runs
        # on the replacement — record THAT frame, or the manifest
        # below would silently re-evaluate the unpinned original
        # (review r11 finding)
        if not isinstance(r, DataFrame) and key in terminal:
            r = pin(frame)
        captured[key] = r if isinstance(r, DataFrame) else frame
        return r

    curation_frame(docs, stage_hook=capture, **kwargs)
    # the last doc-grain stage that ran is the curated corpus
    for key in terminal:
        if key in captured:
            canon = captured[key]
            break
    spans = assemble_sequences(canon, seq_len, sep_tokens,
                               group_cols=("source",))
    return sequence_manifest(spans, group_cols=("source",))
