"""Slowly-changing-dimension (type 2) versioning.

The warehouse-side complement of the snapshot/upsert sinks: instead
of overwriting a dimension row in place (losing history) or keeping
whole-corpus versions (``publish_snapshot``), SCD2 keeps one row PER
VERSION of each entity with a validity interval — the shape every
point-in-time join (``operators.asof``) wants on its build side.

Spark shape: the merge is two window passes and a union — no
iterative driver logic, no per-key loop:

* updates: per-key ordered dedupe + no-change suppression (a lag
  window over the compared attributes), then each surviving update
  becomes a version row whose ``valid_to`` is the NEXT update's
  timestamp (lead window) — open-ended for the last;
* current dimension: open rows of keys touched by surviving updates
  close at that key's first update timestamp (broadcast-joinable
  per-key aggregate); history rows and untouched keys pass through
  byte-identical.

Both windows shuffle on the entity key only; attribute payloads ride
along. At 100 TB-dimension scale the update batch is the small side
and its per-key aggregate broadcasts.

Reference scope note: north-star extension (SURVEY.md §2
extensions); the reference has no dimension-versioning surface.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dedup_per_ts(updates: DataFrame, keys: list, ts_col: str,
                  attrs: list) -> DataFrame:
    """Deterministic (key, ts) uniqueness: ties keep the row whose
    attribute tuple sorts first — duplicate-timestamp updates would
    otherwise make the version windows order-nondeterministic.
    Partitioned on the KEYS alone (duplicates detected by lag on the
    timestamp), so it shares the version windows' exchange instead of
    adding a (keys, ts)-keyed one."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc_nulls_first(),
        *[F.col(c).asc_nulls_first() for c in attrs])
    # lag the ts INSIDE a struct: a NULL lag result then means "no
    # previous row", unambiguously — lagging the bare column can't
    # tell "first row" from "previous ts is NULL", which let
    # duplicate NULL-timestamp rows both survive the dedupe
    prev = F.lag(F.struct(F.col(ts_col).alias("t"))).over(w)
    return (updates.withColumn("__prev", prev)
            .filter(F.col("__prev").isNull()
                    | ~F.col("__prev")["t"].eqNullSafe(F.col(ts_col)))
            .drop("__prev"))


def scd2_init(updates: DataFrame, key_cols: Sequence[str],
              ts_col: str = "effective_ts",
              compare_cols: Sequence[str] | None = None) -> DataFrame:
    """Bootstrap an SCD2 dimension from an update stream alone:
    every no-change-suppressed update becomes a version row with
    (valid_from, valid_to, is_current). Equivalent to scd2_apply
    against an empty dimension.

    ``compare_cols`` narrows CHANGE DETECTION only — every non-key,
    non-ts column is always carried as version payload; columns
    outside the compare set keep the value of the update that opened
    the version. Duplicate (key, ts) updates are deduplicated
    deterministically (smallest attribute tuple wins)."""
    keys = list(key_cols)
    attrs = [c for c in updates.columns
             if c not in keys and c != ts_col]
    cmp_cols = list(compare_cols) if compare_cols is not None else attrs

    updates = _dedup_per_ts(updates, keys, ts_col, attrs)
    w_ord = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    cmp_struct = F.struct(*[F.col(c) for c in cmp_cols])
    changed = (updates
               .withColumn("__prev", F.lag(cmp_struct).over(w_ord))
               # first version per key always survives; later ones
               # only when the compared attributes actually changed
               # (null-safe: <=> treats NULL==NULL as equal)
               .filter(F.col("__prev").isNull()
                       | ~F.col("__prev").eqNullSafe(cmp_struct))
               .drop("__prev"))
    out = (changed
           .withColumn("valid_from", F.col(ts_col))
           .withColumn("valid_to", F.lead(ts_col).over(w_ord))
           .withColumn("is_current", F.col("valid_to").isNull())
           .drop(ts_col))
    return out.select(*keys, *attrs, "valid_from", "valid_to",
                      "is_current")


def scd2_apply(dim: DataFrame, updates: DataFrame,
               key_cols: Sequence[str],
               ts_col: str = "effective_ts",
               compare_cols: Sequence[str] | None = None) -> DataFrame:
    """The new dimension snapshot after applying an update batch.

    ``dim`` is an SCD2 table (output of :func:`scd2_init` or a prior
    apply): keys + attributes + (valid_from, valid_to, is_current).
    ``updates`` carries keys + attributes + ``ts_col``. Semantics:

    * an update whose attributes equal the entity's attributes at
      that point of the update sequence is suppressed (no version
      churn on no-op upserts);
    * each surviving update opens a new version at its timestamp and
      closes at the key's next surviving update (open-ended last);
    * the previously-open row of a touched key closes at that key's
      first surviving update timestamp;
    * LATE updates — timestamped at or before a touched key's
      current ``valid_from`` — are DROPPED (the open row's validity
      would have to be rewritten retroactively; route genuinely
      late-arriving history through :func:`scd2_init` rebuilds
      instead). History rows and untouched keys pass through
      unchanged.

    ``compare_cols`` narrows CHANGE DETECTION only; every non-key,
    non-ts update column is carried as version payload. Duplicate
    (key, ts) updates are deduplicated deterministically (smallest
    attribute tuple wins).

    A CDC consumer that needs the dropped late rows back (to decide
    on reprocessing / an scd2_init rebuild) should call
    :func:`scd2_apply_with_quarantine` instead — same result
    dimension, plus the quarantined updates as a DataFrame.

    Invariants (tested): exactly one ``is_current`` row per key;
    per-key intervals are non-overlapping and contiguous."""
    new_dim, _ = scd2_apply_with_quarantine(dim, updates, key_cols,
                                            ts_col, compare_cols)
    return new_dim


def scd2_apply_with_quarantine(
        dim: DataFrame, updates: DataFrame, key_cols: Sequence[str],
        ts_col: str = "effective_ts",
        compare_cols: Sequence[str] | None = None,
        pin: Callable[[DataFrame], DataFrame] | None = None
        ) -> tuple[DataFrame, DataFrame]:
    """(new_dim, quarantined): :func:`scd2_apply` plus the inadmissible
    updates it dropped, in the update batch's own schema (keys +
    attributes + ``ts_col``). An update is quarantined when its
    timestamp is at or before its key's currently-open ``valid_from``
    (applying it would rewrite closed history) or NULL (a malformed
    CDC row — no version can open at an unknown time); for in-order,
    well-formed feeds the quarantine is empty (zero behavior change).
    Duplicate-(key, ts) rows removed by the deterministic dedupe are
    NOT quarantined (they are redundant, not late). The quarantine
    rides the same keys-join the admission filter already performs,
    so exposing it adds no extra shuffle.

    Both returned frames branch from the same dedupe+join lineage;
    a caller that ACTIONS both (e.g. the streaming loop writing
    quarantine and snapshot per micro-batch) would compute that
    shared prefix twice. ``pin`` (typically :func:`session.pin`)
    materializes the shared joined frame once so each action pays
    only its own suffix. Default None: pure lazy plan, unchanged."""
    keys = list(key_cols)
    attrs = [c for c in updates.columns
             if c not in keys and c != ts_col]
    cmp_cols = list(compare_cols) if compare_cols is not None else attrs
    updates = _dedup_per_ts(updates, keys, ts_col, attrs)

    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))

    # drop late updates: ts must be strictly after the open row's
    # valid_from (unknown keys have no open row — all ts admissible)
    open_meta = cur.select(*keys, F.col("valid_from").alias("__cur_vf"),
                           F.struct(*[F.col(c) for c in cmp_cols])
                           .alias("__cur_attrs"))
    joined = updates.join(open_meta, keys, "left")
    if pin is not None:
        joined = pin(joined)
    # NULL-timestamp updates are malformed CDC rows: inadmissible for
    # ANY key (a version can't open at an unknown time). The leading
    # isNotNull also keeps `admissible` two-valued, so the ~admissible
    # quarantine complement is exact — with a bare NULL > comparison
    # both filters would drop the row and it would vanish from BOTH
    # outputs.
    admissible = (F.col(ts_col).isNotNull()
                  & (F.col("__cur_vf").isNull()
                     | (F.col(ts_col) > F.col("__cur_vf"))))
    quarantined = (joined.filter(~admissible)
                   .select(*updates.columns))
    upd = joined.filter(admissible)

    # no-change suppression against the running previous attributes:
    # the first update per key compares against the OPEN row's
    # attributes, later ones against the preceding update
    w_ord = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    cmp_struct = F.struct(*[F.col(c) for c in cmp_cols])
    prev = F.coalesce(F.lag(cmp_struct).over(w_ord),
                      F.col("__cur_attrs"))
    changed = (upd.withColumn("__prev", prev)
               .filter(F.col("__prev").isNull()
                       | ~F.col("__prev").eqNullSafe(cmp_struct))
               .drop("__prev", "__cur_vf", "__cur_attrs"))

    new_versions = (changed
                    .withColumn("valid_from", F.col(ts_col))
                    .withColumn("valid_to",
                                F.lead(ts_col).over(
                                    Window.partitionBy(*keys)
                                    .orderBy(F.col(ts_col).asc())))
                    .withColumn("is_current",
                                F.col("valid_to").isNull())
                    .drop(ts_col)
                    .select(*keys, *attrs, "valid_from", "valid_to",
                            "is_current"))

    # close open rows of touched keys at the first surviving update
    first_ts = (changed.groupBy(*keys)
                .agg(F.min(ts_col).alias("__close_at")))
    closed = (cur.join(F.broadcast(first_ts), keys, "left")
              .withColumn("valid_to",
                          F.when(F.col("__close_at").isNotNull(),
                                 F.col("__close_at"))
                          .otherwise(F.col("valid_to")))
              .withColumn("is_current", F.col("__close_at").isNull())
              .drop("__close_at"))

    return (hist.unionByName(closed)
            .unionByName(new_versions)), quarantined


def scd2_at(dim: DataFrame, ts) -> DataFrame:
    """Point-in-time view: the version of every entity valid at
    ``ts`` (a literal or Column) — the dimension side of a
    time-travel join. Codegen interval filter, no shuffle."""
    t = ts if hasattr(ts, "_jc") else F.lit(ts)
    return dim.filter((F.col("valid_from") <= t)
                      & (F.col("valid_to").isNull()
                         | (F.col("valid_to") > t)))


def scd2_enrich(facts: DataFrame, dim: DataFrame,
                key_cols: Sequence[str], ts_col: str,
                how: str = "left") -> DataFrame:
    """Fact rows enriched with the dimension VERSION valid at each
    fact's timestamp — the time-travel join SCD2 exists for. The
    interval predicate rides in the join condition (equi on the
    entity keys + non-equi on validity), so Spark hash-joins on the
    keys and evaluates the interval per key-match: cost is facts ×
    versions-per-key, and versions are non-overlapping so at most
    one dimension row matches each fact. ``how="left"`` keeps facts
    with no valid version (NULL attributes)."""
    keys = list(key_cols)
    cond = None
    for k in keys:
        c = facts[k] == dim[k]
        cond = c if cond is None else (cond & c)
    cond = (cond
            & (dim["valid_from"] <= facts[ts_col])
            & (dim["valid_to"].isNull()
               | (dim["valid_to"] > facts[ts_col])))
    joined = facts.join(dim, cond, how)
    # drop the DIMENSION's bookkeeping columns specifically — a bare
    # .drop("is_current") would hit (or ambiguously match) a fact
    # column of the same name and corrupt the fact side
    return joined.drop(*[dim[k] for k in keys]).drop(dim["is_current"])
