"""Readers/writers (SURVEY.md §2.1 S1–S4).

S1  single-CSV scan with header            — Data Load and Cleaning.R:15-17
S2  multi-file glob scan + UNION ALL       — Data Load and Cleaning.R:20-22
S3  external parquet dataset loader        — EPA_Comparison.R:3
S4  standardized parquet sink (the reference has none; every named
    output table here writes parquet so downstream stages re-read
    columnar data with pushdown/pruning intact)

Glob reads are the scale path: ``spark.read.csv("weeks/week*.csv")``
unions natively with one task per file split — no driver-side loop,
unlike the reference's ``lapply(read_csv) %>% bind_rows``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import pin


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver star-schema table (parquet, self-describing).

    ``events.ts`` has shipped as both parquet TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) across testdata generations, so the handling is
    type-adaptive on the *read* dtype rather than assuming an encoding:

    - NANOS files: Spark's vectorized reader rejects them, so they are
      read as raw nanos (``nanosAsLong`` → LongType) and truncated to
      a microsecond TimestampType — the same truncation DuckDB applies
      on ``CAST(ts AS TIMESTAMP)``.
    - MICROS files (plain timestamp / timestamp_ntz): cast straight to
      TimestampType; ``nanosAsLong`` is a no-op on them.

    Either way the output column is a session-tz TimestampType with
    microsecond values identical to the DuckDB oracle's.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_csv_glob(spark: SparkSession, pattern: str,
                  schema: T.StructType) -> DataFrame:
    """S1/S2: schema-pinned CSV scan; a glob pattern is a native
    multi-file union (reference: DLC:20-22 reads week1..8 and binds
    rows — here one declarative scan, parallel by file split)."""
    return (spark.read
            .option("header", True)
            .schema(schema)
            .csv(pattern))


def read_jsonl_glob(spark: SparkSession, pattern: str,
                    schema: T.StructType) -> DataFrame:
    """S1/S2 for JSON-lines — the standard interchange format of
    text-corpus pipelines. Schema-pinned (no sampling inference job);
    a glob is a native multi-file union, one task per file split.
    Corrupt records fail fast (FAILFAST) rather than silently nulling
    — at 100 TB a permissive default hides data loss."""
    return (spark.read
            .schema(schema)
            .option("mode", "FAILFAST")
            .json(pattern))


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (interchange with non-columnar consumers; for
    engine-internal round trips prefer write_parquet — columnar,
    pushdown-friendly, ~5-10x smaller)."""
    df.write.mode(mode).json(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    """S4: standard sink. ``partition_by`` enables partition pruning
    for downstream readers (e.g. partition tracking by gameId at full
    scale so per-game queries touch one directory)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_parquet_clustered(df: DataFrame, path: str,
                            cluster_by: list[str],
                            num_files: int | None = None,
                            max_records_per_file: int | None = None,
                            mode: str = "overwrite") -> None:
    """Range-clustered layout: ``repartitionByRange`` on the cluster
    keys + ``sortWithinPartitions``, so every output file covers a
    disjoint key range (equal keys never straddle files). Parquet
    min/max statistics then let any reader skip whole files/row-groups
    for range predicates on those keys — the single biggest scan
    saving available at 100 TB for time- or id-ranged queries, without
    any table-format dependency.

    ``num_files`` sizes the output explicitly (file-count control is
    the compaction knob: thousands of small files destroy scan setup
    time at scale); ``max_records_per_file`` bounds file size when one
    range is hot."""
    parts = ([F.col(c) for c in cluster_by])
    out = (df.repartitionByRange(num_files, *parts) if num_files
           else df.repartitionByRange(*parts))
    out = out.sortWithinPartitions(*cluster_by)
    w = out.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def upsert_partitioned(spark: SparkSession, table_dir: str,
                       updates: DataFrame, key_cols: list[str],
                       partition_col: str) -> None:
    """Copy-on-write upsert scoped to TOUCHED partitions only.

    At 100 TB a merge cannot rewrite the table: the write amplification
    must be bounded by the partitions the updates land in. Plan:

    1. the touched partition values come off the (small) update set;
    2. the base is read WITH a partition-pruned scan of only those
       partitions (PartitionFilters — untouched data is never read);
    3. merged = updates ∪ (pruned base ANTI-JOIN update keys) — an
       update row replaces its key, other rows pass through;
    4. ``partitionOverwriteMode=dynamic`` overwrites exactly the
       partitions present in the merged output; every other
       partition's files are untouched on disk (asserted in tests by
       file identity).

    The merged frame is localCheckpoint-ed before the write because
    the sink overwrites a path the plan reads from (at larger scale,
    stage to a sibling directory and swap — same partition scoping)."""
    parts = [r[0] for r in
             updates.select(partition_col).distinct().collect()]
    base = (spark.read.parquet(table_dir)
            .filter(F.col(partition_col).isin(parts)))
    keys = updates.select(*key_cols)
    merged = updates.unionByName(
        base.join(keys, key_cols, "left_anti"))
    merged = pin(merged, truncate=True)
    # per-WRITE dynamic overwrite — a session-global conf toggle can
    # race concurrent writers into a STATIC overwrite of the table
    (merged.write.mode("overwrite")
     .partitionBy(partition_col)
     .option("partitionOverwriteMode", "dynamic")
     .parquet(table_dir))


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other columnar interchange format (Hive/Trino
    estates); same pushdown/pruning properties as parquet."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_binary_files(spark: SparkSession, pattern: str,
                      glob_filter: str | None = None) -> DataFrame:
    """Raw-asset ingestion via the ``binaryFile`` source: one row per
    file with (path, modificationTime, length, content binary) — the
    entry point that turns a bucket of images/audio into a DataFrame
    the multimodal ops (multimodal/binary_ops.py) consume. Spark
    splits at file granularity, so thousands of assets parallelize
    across executors; pair with ``pathGlobFilter`` to prune by
    extension at listing time."""
    r = spark.read.format("binaryFile")
    if glob_filter:
        r = r.option("pathGlobFilter", glob_filter)
    return r.load(pattern)


def read_binary_files_stream(spark: SparkSession, pattern: str,
                             glob_filter: str | None = None,
                             max_files_per_trigger: int | None = None
                             ) -> DataFrame:
    """Streaming twin of :func:`read_binary_files`: a Structured
    Streaming ``binaryFile`` source over a landing bucket — new
    assets become micro-batch rows with the same (path,
    modificationTime, length, content) schema, so
    ``media_from_binary_files`` and the decode/features/resize
    passes compose unchanged inside ``foreachBatch``. The
    continuous-ingestion shape for media at 100 TB: the object
    store is the queue, file granularity is the unit of progress,
    and ``maxFilesPerTrigger`` bounds per-batch memory (blobs ride
    whole)."""
    r = spark.readStream.format("binaryFile") \
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
    if glob_filter:
        r = r.option("pathGlobFilter", glob_filter)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger",
                     str(int(max_files_per_trigger)))
    return r.load(pattern)


def _file_digests(df: DataFrame) -> dict:
    """Per-file {rows, xor64} over every data column: one scan,
    bit_xor of row hashes (order-insensitive, overflow-free — a sum
    would trip ANSI overflow; ordering-sensitive digests would tie the
    manifest to task scheduling)."""
    import os

    cols = [F.col(c) for c in df.columns]
    rows = (df.groupBy(F.input_file_name().alias("f"))
            .agg(F.count(F.lit(1)).alias("rows"),
                 F.bit_xor(F.xxhash64(*cols)).alias("xor64"))
            .collect())
    return {os.path.basename(r.f): {"rows": r.rows, "xor64": r.xor64}
            for r in rows}


def write_parquet_with_manifest(df: DataFrame, path: str,
                                mode: str = "overwrite") -> dict:
    """Parquet sink + integrity manifest (``_MANIFEST.json``).

    Object stores lose files, partial job retries leave orphans, and
    a 100 TB table cannot be eyeballed: the manifest records per-file
    row counts and content digests at write time so any later reader
    can cheaply answer "is this dataset exactly what the job wrote?".
    ``verify_parquet_manifest`` recomputes and reports missing,
    extra, and modified files."""
    import json
    import os

    df.write.mode(mode).parquet(path)
    written = df.sparkSession.read.parquet(path)
    manifest = {
        "columns": written.columns,
        "files": _file_digests(written),
    }
    manifest["total_rows"] = sum(
        f["rows"] for f in manifest["files"].values())
    with open(os.path.join(path, "_MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def verify_parquet_manifest(spark: SparkSession, path: str) -> dict:
    """Recompute digests and diff against the manifest. Returns
    {"ok", "missing", "extra", "modified", "rows_expected",
    "rows_found"} — one scan, same cost as any full read."""
    import json
    import os

    with open(os.path.join(path, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    # List through the Hadoop FS API (works on any scheme) and read
    # the EXPLICIT current file set: verification must see the
    # filesystem as it is now, not the session's FileStatusCache view
    # of a directory it read before the tampering.
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(
        spark._jsc.hadoopConfiguration())  # type: ignore[union-attr]
    files = [s.getPath().toString() for s in fs.listStatus(jpath)
             if s.getPath().getName().endswith(".parquet")]
    spark.catalog.refreshByPath(path)
    found = _file_digests(
        spark.read.parquet(*files).select(*manifest["columns"]))
    expected = manifest["files"]
    missing = sorted(set(expected) - set(found))
    extra = sorted(set(found) - set(expected))
    modified = sorted(f for f in set(found) & set(expected)
                      if found[f] != expected[f])
    rows_found = sum(f["rows"] for f in found.values())
    return {
        "ok": not (missing or extra or modified),
        "missing": missing, "extra": extra, "modified": modified,
        "rows_expected": manifest["total_rows"],
        "rows_found": rows_found,
    }


def read_parquet_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet written under an EVOLVING schema (columns added
    over time, the normal state of a long-lived 100 TB table):
    ``mergeSchema`` unions the footers' schemas, rows from older files
    null-fill the newer columns. Footer merging costs one metadata
    pass — which is why it is opt-in here and not a default read
    setting; pushdown and pruning still apply to every column that
    exists in a given file."""
    return (spark.read.option("mergeSchema", "true").parquet(*paths))


def zorder_column(df: DataFrame, cols: list[str],
                  bits: int = 8) -> "F.Column":
    """Z-value (Morton code) over ≥2 numeric columns.

    Each column is rank-bucketed into 2^bits equal-frequency buckets
    via approxQuantile boundaries (a driver-side array of ≤255 doubles
    — one tiny GK-sketch job, never a global window, so no
    single-partition bottleneck), then the bucket bits are interleaved.
    Rank bucketing makes the code distribution-free: skewed or
    arbitrary-range columns get the same balanced 2^(bits·k) key
    space. The whole expression is codegen (array/filter/shift) —
    no UDF."""
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    bucket_cols = []
    for c in cols:
        bounds = df.approxQuantile(c, probs, 1.0 / (1 << (bits + 2)))
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        v = F.col(c).cast("double")
        bucket_cols.append(
            F.size(F.filter(arr, lambda b: v > b)).cast("long"))
    z = F.lit(0).cast("long")
    k = len(cols)
    for i in range(bits):
        for ci, b in enumerate(bucket_cols):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + ci))
    return z


def write_parquet_zordered(df: DataFrame, path: str, zorder_by: list[str],
                           num_files: int = 16, bits: int = 8,
                           max_records_per_file: int | None = None,
                           mode: str = "overwrite") -> None:
    """Multi-dimension clustered layout (the OPTIMIZE ZORDER shape).

    Single-key range clustering (``write_parquet_clustered``) gives
    perfect file skipping on ONE column and none on the others;
    interleaving the rank-bucket bits of k columns into one Morton key
    and range-clustering on THAT bounds every column's per-file
    min/max span to roughly range/2^(log2(num_files)/k) — so parquet
    footer stats can skip files for predicates on ANY of the z-ordered
    columns. The standard layout for multi-tenant scan patterns at
    100 TB (query by time AND by user AND by domain).

    The z key is computed, used for the range exchange + local sort,
    and dropped — the written schema is unchanged."""
    z = zorder_column(df, zorder_by, bits)
    out = (df.withColumn("__z", z)
           .repartitionByRange(num_files, F.col("__z"))
           .sortWithinPartitions("__z")
           .drop("__z"))
    w = out.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def snapshot_versions(spark: SparkSession, table_dir: str) -> list[int]:
    """Existing version numbers under a snapshot table (``v=N``
    children), via the Hadoop FS API (any scheme)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(table_dir)
    fs = jpath.getFileSystem(
        spark._jsc.hadoopConfiguration())  # type: ignore[union-attr]
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v="):
            try:
                out.append(int(name[2:]))
            except ValueError:
                pass
    return sorted(out)


def publish_snapshot(df: DataFrame, table_dir: str,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> dict:
    """Publish an immutable, versioned corpus snapshot:
    ``table_dir/v=N`` (N = previous max + 1) written with the
    integrity manifest (per-file row counts + digests), plus a
    change-count diff against the previous version.

    Versioned immutable snapshots are how a 100 TB corpus ships to
    consumers safely: readers pin a version (no torn reads during a
    publish), the manifest answers "is this exactly what was
    written?", and the diff is the audit record deciding what an
    incremental reprocess must touch (only added/modified ids flow
    through dedup/scoring again; removed ids tombstone downstream
    indexes). The diff joins (id, fingerprint) projections only —
    document text never enters its shuffle.

    Returns {"version", "path", "rows", "diff": {added, removed,
    modified} | None}."""
    from ..dedup.exact import corpus_diff

    spark = df.sparkSession
    versions = snapshot_versions(spark, table_dir)
    version = (versions[-1] + 1) if versions else 1
    path = f"{table_dir.rstrip('/')}/v={version}"
    manifest = write_parquet_with_manifest(df, path)
    diff = None
    if versions:
        prev = spark.read.parquet(
            f"{table_dir.rstrip('/')}/v={versions[-1]}")
        counts = {r.change: r.n for r in
                  corpus_diff(prev, spark.read.parquet(path),
                              text_col, id_col)
                  .groupBy("change")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
        diff = {k: counts.get(k, 0)
                for k in ("added", "removed", "modified")}
    return {"version": version, "path": path,
            "rows": manifest["total_rows"], "diff": diff}


def read_snapshot(spark: SparkSession, table_dir: str,
                  version: int | None = None) -> DataFrame:
    """Read a pinned (or the latest) snapshot version. Pinning is the
    reader-side contract: a concurrent publish creates v=N+1 and
    never mutates the version being read."""
    versions = snapshot_versions(spark, table_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshots under {table_dir}")
    v = version if version is not None else versions[-1]
    if v not in versions:
        raise FileNotFoundError(
            f"version {v} not in {versions} under {table_dir}")
    return spark.read.parquet(f"{table_dir.rstrip('/')}/v={v}")


def compact_parquet(spark: SparkSession, path: str,
                    target_file_mb: int = 128,
                    sort_within_by: list[str] | None = None,
                    dedupe_by: list[str] | None = None) -> dict:
    """Rewrite a parquet directory into ~``target_file_mb`` files —
    the small-files maintenance pass every long-running ingest needs
    (each file costs a task, an open, and a footer read; a directory
    with 100k tiny files makes every downstream scan
    scheduling-bound).

    Sizing comes from the actual on-disk bytes (not row counts), so
    compression ratio is accounted for. ``sort_within_by`` optionally
    re-sorts rows inside each output file to restore min/max
    statistics locality lost across many small appends.
    ``dedupe_by`` drops duplicate rows by the given key columns while
    rewriting — the reclaim pass for at-least-once appenders (e.g.
    the streaming ANN index ingest, whose crash replays double-append
    rows that are result-identical but cost scan bytes).

    All listing and renaming goes through the Hadoop FileSystem API,
    so the same code runs against local FS, HDFS, or any object store
    with a Hadoop connector — no ``os``/``glob`` path assumptions.
    The rewrite is staged through a sibling temp dir, then swapped in
    with two FS renames. The swap is NOT atomic: there is a brief
    window (old→backup, tmp→final) in which the path does not exist,
    so treat compaction as stop-the-world per directory — schedule it
    when no reader is mid-scan of that path. Any failure during or
    after the swap restores the backup to the original path before
    re-raising, so the directory is never left missing.

    Returns {"files_before", "files_after", "bytes"}.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()  # type: ignore[union-attr]

    def _jpath(p: str):
        return jvm.org.apache.hadoop.fs.Path(p)

    root = _jpath(path.rstrip("/"))
    fs = root.getFileSystem(conf)

    def _list_parquet(p):
        out = []
        it = fs.listFiles(p, True)  # recursive
        while it.hasNext():
            st = it.next()
            if st.getPath().getName().endswith(".parquet"):
                out.append(st)
        return out

    before = _list_parquet(root)
    total_bytes = sum(st.getLen() for st in before)
    out_bytes = total_bytes
    df = spark.read.parquet(path)
    pinned = None
    if dedupe_by:
        # size the output from the SURVIVOR volume, not the raw
        # bytes: after a full replay half the rows are duplicates and
        # pre-dedupe sizing would emit twice the files at half the
        # target size — recreating the small-files pathology this
        # pass exists to fix. The pre-dedupe count is parquet-footer
        # metadata; the deduped frame is PINNED so its shuffle runs
        # once for the sizing count and the rewrite reuses it.
        from ..session import pin

        total_rows = df.count()
        df = pinned = pin(df.dropDuplicates(list(dedupe_by)))
        if total_rows > 0:
            out_bytes = int(total_bytes * df.count() / total_rows)
    n_out = max(1, -(-out_bytes // (target_file_mb * 1024 * 1024)))
    out = df.repartition(int(n_out))
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)

    tmp = _jpath(path.rstrip("/") + "__compact_tmp")
    backup = _jpath(path.rstrip("/") + "__compact_old")
    fs.delete(tmp, True)
    # A leftover backup can only be stale: if a prior run died MID-swap
    # (data only in backup), the dataset path would not exist and the
    # spark.read above would already have failed — reaching this point
    # means the live data is at `path`, so any existing backup is a
    # prior run's undeleted copy. It must go now: Hadoop rename into an
    # existing directory nests the source INSIDE it, which would
    # corrupt both the swap and the rollback.
    fs.delete(backup, True)
    try:
        try:
            out.write.mode("overwrite").parquet(tmp.toString())
        except Exception:
            fs.delete(tmp, True)    # no partial staging left behind
            raise

        swapped_out = False
        try:
            if not fs.rename(root, backup):
                raise IOError(f"rename {root} -> {backup} failed")
            swapped_out = True
            if not fs.rename(tmp, root):
                raise IOError(f"rename {tmp} -> {root} failed")
        except Exception:
            # Restore the original directory before surfacing the
            # error — a failed compaction must leave the dataset
            # readable.
            if swapped_out and not fs.exists(root):
                fs.rename(backup, root)
            fs.delete(tmp, True)
            raise
    finally:
        # Free the sizing pin once the rewrite no longer needs it:
        # callers like compact_index invoke this once PER cell
        # directory, and in durable-pins mode each leaked
        # persist(DISK_ONLY) frame would otherwise sit on disk until
        # GC. No-op for the localCheckpoint flavor.
        if pinned is not None:
            pinned.unpersist(blocking=False)
    fs.delete(backup, True)
    spark.catalog.refreshByPath(path)

    after = len(_list_parquet(root))
    return {"files_before": len(before), "files_after": after,
            "bytes": total_bytes}


def replace_state_dir(df: DataFrame, path: str) -> None:
    """Replace a SMALL state-carrying parquet dir (delete markers,
    tombstone indexes) with ``df``'s rows, crash-safely: the new rows
    COMMIT to a ``__new`` staging dir first, then two renames swap it
    live with the old state parked at ``__bak`` until the swap
    completes. An in-place ``mode("overwrite")`` deletes the old
    files before the new ones commit — a crash there LOSES the state
    (review r10: compliance markers vanishing is strictly worse than
    any staleness). Worst crash window here leaves the PRE-replace
    state at ``__bak``, which :func:`read_state_dir` falls back to —
    state can regress one step (conservative: previously-hidden rows
    stay hidden), never vanish. A prior crash is healed AFTER the
    staged write, not before: callers build ``df`` from
    :func:`read_state_dir`, whose post-crash fallback reads ``__bak``
    — healing first would rename the very files the write is about to
    recompute from (ADVICE r10: the documented crash-recovery path
    failed with FileNotFoundException on its first exercise). Safe to
    call with a ``df`` whose lineage READS ``path`` (live or
    ``__bak``): the write targets the staging dir, and the renames
    move files without recomputation."""
    spark = df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()

    def _jp(p):
        return jvm.org.apache.hadoop.fs.Path(p)

    live = _jp(path.rstrip("/"))
    tmp = _jp(path.rstrip("/") + "__new")
    bak = _jp(path.rstrip("/") + "__bak")
    fs = live.getFileSystem(conf)
    fs.delete(tmp, True)
    try:
        # Materialize FIRST: if a prior replace crashed mid-swap the
        # state lives only at __bak and df's lineage points there —
        # this write is the last moment those files are guaranteed
        # to exist under that name.
        df.write.mode("overwrite").parquet(tmp.toString())
    except Exception:
        fs.delete(tmp, True)
        raise
    if not fs.exists(live) and fs.exists(bak):
        # heal a prior mid-swap; the rename result MUST be checked
        # before the unconditional backup delete below — a failed
        # heal followed by delete(bak) would destroy the only
        # surviving copy of the state (review r11)
        if not fs.rename(bak, live):
            fs.delete(tmp, True)
            raise IOError(f"replace_state_dir: heal rename "
                          f"{bak} -> {live} failed")
    fs.delete(bak, True)
    swapped = False
    try:
        if fs.exists(live):
            if not fs.rename(live, bak):
                raise IOError(f"rename {live} -> {bak} failed")
            swapped = True
        if not fs.rename(tmp, live):
            raise IOError(f"rename {tmp} -> {live} failed")
    except Exception:
        if swapped and not fs.exists(live):
            fs.rename(bak, live)
        fs.delete(tmp, True)
        raise
    fs.delete(bak, True)
    spark.catalog.refreshByPath(path)


def heal_state_dir(spark: SparkSession, path: str) -> bool:
    """Heal a crash-parked `replace_state_dir` swap: when the live
    dir is ABSENT and the pre-crash state sits at ``__bak``, rename
    it back live. MUST be called before any ``mode("append")`` write
    into a state dir (ADVICE r10: an append after an unhealed crash
    creates a fresh live dir holding only the new rows, and
    :func:`read_state_dir` — which prefers live — then permanently
    ignores the parked markers, silently resurrecting every
    pre-crash takedown/tombstone). Reads stay write-free: the heal
    belongs to WRITERS, which the maintenance lease already
    serializes. Returns True when a heal happened."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    live = jvm.org.apache.hadoop.fs.Path(path.rstrip("/"))
    bak = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__bak")
    fs = live.getFileSystem(conf)
    if not fs.exists(live) and fs.exists(bak):
        if not fs.rename(bak, live):
            raise IOError(f"heal_state_dir: rename {bak} -> {live} "
                          f"failed")
        spark.catalog.refreshByPath(path)
        return True
    return False


def read_hidden_parquet(spark: SparkSession, path: str) -> DataFrame:
    """`spark.read.parquet` on a directory whose basename starts
    with ``_`` (Spark's hidden-path convention — the engine's
    ``_index_meta`` / ``_index_deletes`` state dirs) WITHOUT
    tripping DataSource's "All paths were ignored" WARN on every
    serving call (verdict r12 #7): glob straight to the ``part-*``
    files, whose basenames are not hidden. When the dir carries no
    part files (never produced by an engine write, but cheap to
    guard) fall back to the plain read — identical semantics, one
    warn."""
    jvm = spark._jvm
    glob = path.rstrip("/") + "/part-*"
    jp = jvm.org.apache.hadoop.fs.Path(glob)
    fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
    matches = fs.globStatus(jp)
    if matches is not None and len(matches) > 0:
        # hand the read the CONCRETE matched files, not the glob
        # string: FileStreamSink.hasMetadata probes a single read
        # path literally (getFileStatus on "part-*"), and the miss
        # logged an 80-line WARN stack per serving call — the same
        # unattributed-trace family as the bootstrap probes fixed
        # for the streaming loop (verdict r15 #6). Multiple concrete
        # paths skip that probe entirely; a single one resolves to a
        # real file.
        return spark.read.parquet(
            *[m.getPath().toString() for m in matches])
    return spark.read.parquet(path)


def read_state_dir(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a `replace_state_dir`-managed dir: the live dir, else the
    ``__bak`` parked by a mid-swap crash (one step stale —
    conservative for hide-lists), else None."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    live = jvm.org.apache.hadoop.fs.Path(path.rstrip("/"))
    fs = live.getFileSystem(conf)
    if fs.exists(live):
        return read_hidden_parquet(spark, path)
    bak = path.rstrip("/") + "__bak"
    if fs.exists(jvm.org.apache.hadoop.fs.Path(bak)):
        return read_hidden_parquet(spark, bak)
    return None


def drop_state_dir(spark: SparkSession, path: str) -> None:
    """Delete a `replace_state_dir`-managed dir AND its crash
    leftovers (``__bak`` / ``__new``) — a GC that leaves a stale
    backup behind would resurrect the state at the next read."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for p in (path.rstrip("/"), path.rstrip("/") + "__bak",
              path.rstrip("/") + "__new"):
        jp = jvm.org.apache.hadoop.fs.Path(p)
        jp.getFileSystem(conf).delete(jp, True)
