"""Driver-checked composite-pipeline analogues (SURVEY.md §2.11) on
the star schema: the reference's Q1–Q8 pipeline *shapes* re-phrased
over ``events``/``lineitem`` so the driver's oracle can grade them
(the NFL-shaped originals run on fixture tables under pytest —
pipelines.nfl). Plus the scalar-surface (F1–F7) and multimodal
(mapInPandas) coverage.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..multimodal import decode_media, extract_features, media_from_documents
from ..operators.aggregates import pivot_sum
from ..registry import query
from ._util import EVENTS_CTE, load_table, r6


@query(
    "qpipe_session_bounds",
    f"""{EVENTS_CTE}
        SELECT v.user_id,
               v.first_view,
               p.last_purchase
        FROM (SELECT user_id, MIN(ts) AS first_view FROM ev
              WHERE event_type = 'view' GROUP BY user_id) v
        JOIN (SELECT user_id, MAX(ts) AS last_purchase FROM ev
              WHERE event_type = 'purchase' GROUP BY user_id) p
          ON v.user_id = p.user_id""",
)
def qpipe_session_bounds(spark, sf_dir):
    """Q2 ``play_bounds`` analogue: per-entity start/end markers from
    an event vocabulary (ball_snap → pass_forward becomes first view →
    last purchase), then joined — filter → distinct-agg → rename →
    join, the exact MBE:21-30 shape."""
    ev = load_table(spark, sf_dir, "events")
    start = (ev.filter(F.col("event_type") == "view")
             .groupBy("user_id").agg(F.min("ts").alias("first_view")))
    end = (ev.filter(F.col("event_type") == "purchase")
           .groupBy("user_id").agg(F.max("ts").alias("last_purchase")))
    return start.join(end, ["user_id"])


@query(
    "qpipe_drop_detection",
    f"""{EVENTS_CTE},
        seq AS (
          SELECT user_id, event_id, value,
                 value - LAG(value) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id) AS delta,
                 ROW_NUMBER() OVER
                     (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM ev)
        SELECT user_id, MIN(event_id) AS first_drop_event
        FROM seq
        WHERE delta < -100.0 AND rn >= 3
        GROUP BY user_id""",
)
def qpipe_drop_detection(spark, sf_dir):
    """Q3 ``qb_set_point`` analogue: the peak-velocity detector shape
    (MBE:47-52) — ordered lag delta, positional guard, first trigger
    per group via grouped MIN."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (ev.withColumn("delta", F.col("value") - F.lag("value").over(w))
             .withColumn("rn", F.row_number().over(w)))
    return (seq.filter((F.col("delta") < -100.0) & (F.col("rn") >= 3))
               .groupBy("user_id")
               .agg(F.min("event_id").alias("first_drop_event")))


@query(
    "qpipe_pivot_metric",
    f"""{EVENTS_CTE},
        wide AS (
          SELECT user_id,
                 SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS purchase,
                 SUM(CASE WHEN event_type = 'click' THEN value ELSE 0 END) AS click,
                 SUM(CASE WHEN event_type = 'view' THEN value ELSE 0 END) AS view
          FROM ev GROUP BY user_id)
        SELECT user_id,
               ROUND(purchase / (click + view + 1.0), 6) AS conversion_value
        FROM wide
        WHERE purchase > 0""",
)
def qpipe_pivot_metric(spark, sf_dir):
    """Q4 ``pressure_metric`` analogue: pivot to wide statuses then a
    guarded ratio metric (MBE:94-104) — pivot_sum + conditional
    division + positivity filter."""
    ev = load_table(spark, sf_dir, "events")
    wide = pivot_sum(ev.select("user_id", "event_type", "value"),
                     ["user_id"], "event_type",
                     ["purchase", "click", "view"], "value")
    metric = F.col("purchase") / (F.col("click") + F.col("view") + F.lit(1.0))
    return (wide.filter(F.col("purchase") > 0)
                .select("user_id", r6(metric).alias("conversion_value")))


@query(
    "qpipe_rankings",
    f"""{EVENTS_CTE}
        SELECT user_id,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 3)
                   AS sum_value,
               COUNT(*) AS n_events,
               ROUND(MEDIAN(value), 3) AS median_value
        FROM ev GROUP BY user_id
        HAVING COUNT(*) >= 60""",
)
def qpipe_rankings(spark, sf_dir):
    """Q8 ``rankings`` analogue (MO:17-21): sum + count + exact median
    per entity, HAVING attempt threshold, round(3) outputs."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .agg(F.round(F.sum(F.col("value").cast("decimal(18,2)"))
                          .cast("double"), 3).alias("sum_value"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.round(F.median("value"), 3).alias("median_value"))
            .filter(F.col("n_events") >= 60))


@query(
    "qpipe_exclusion_cleanup",
    f"""{EVENTS_CTE}
        SELECT e.user_id, COUNT(*) AS n_ok_events
        FROM ev e
        WHERE NOT EXISTS (
            SELECT 1 FROM ev x
            WHERE x.user_id = e.user_id
              AND x.event_type = 'error' AND x.value > 400.0)
        GROUP BY e.user_id""",
)
def qpipe_exclusion_cleanup(spark, sf_dir):
    """Q1 cleanup analogue (DLC:40-47): derive an exclusion key set
    from a predicate, anti-join it away, then aggregate."""
    ev = load_table(spark, sf_dir, "events")
    bad = (ev.filter((F.col("event_type") == "error")
                     & (F.col("value") > 400.0))
           .select("user_id").distinct())
    return (ev.join(bad, ["user_id"], "left_anti")
              .groupBy("user_id")
              .agg(F.count(F.lit(1)).alias("n_ok_events")))


@query(
    "qpipe_epa_comparison",
    """WITH per_order AS (
          SELECT l_orderkey,
                 CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
                     / COUNT(*) AS disc_rate
          FROM lineitem GROUP BY l_orderkey),
        ext AS (
          SELECT o_orderkey, o_orderpriority, o_totalprice
          FROM orders
          WHERE o_orderstatus = 'F' AND o_custkey IS NOT NULL)
        SELECT o_orderpriority,
               ROUND(MEDIAN(disc_rate), 6) AS median_disc_rate,
               ROUND(MEDIAN(o_totalprice), 6) AS median_totalprice
        FROM ext JOIN per_order ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority""",
)
def qpipe_epa_comparison(spark, sf_dir):
    """Q9 ``epa_comparison`` analogue (EPA_Comparison.R:1-15): the
    external-table comparison shape — filter+rename the external
    feed (REG-season pass plays becomes finished orders), aggregate
    the fact table to entity grain (per-play mean %PZ/s becomes
    per-order mean discount), join on the entity key, then per-group
    medians of BOTH metrics (defteam medians of PZs and epa becomes
    priority-class medians of discount rate and total price).

    Float policy: the per-order mean goes through an exact decimal
    sum divided by the exact count, so the doubles entering MEDIAN
    are bit-identical across engines; medians round(6)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    per_order = (li.groupBy("l_orderkey")
                 .agg((F.sum(F.col("l_discount").cast("decimal(18,6)"))
                        .cast("double")
                       / F.count(F.lit(1))).alias("disc_rate")))     # EPA:10
    ext = (orders
           .filter((F.col("o_orderstatus") == "F")
                   & F.col("o_custkey").isNotNull())                 # EPA:4-5
           .select("o_orderkey", "o_orderpriority", "o_totalprice"))  # EPA:7-8
    joined = ext.join(per_order,
                      ext.o_orderkey == per_order.l_orderkey)        # EPA:11
    return (joined.groupBy("o_orderpriority")
            .agg(F.round(F.median("disc_rate"), 6)
                  .alias("median_disc_rate"),
                 F.round(F.median("o_totalprice"), 6)
                  .alias("median_totalprice")))                      # EPA:15


@query(
    "qpipe_time_to_throw",
    f"""{EVENTS_CTE}
        SELECT user_id,
               MIN(ts) AS first_ts,
               MAX(ts) AS last_ts,
               CAST(epoch(date_trunc('second', MAX(ts)))
                    - epoch(date_trunc('second', MIN(ts))) AS BIGINT)
                   AS seconds_active,
               MAX(value) AS peak_value
        FROM ev
        WHERE event_type IN ('view', 'purchase') AND value > 0.0
        GROUP BY user_id""",
)
def qpipe_time_to_throw(spark, sf_dir):
    """Q10 ``time_to_throw`` analogue (WIP.R:73-77): event-vocabulary
    filter plus attribute guards (ball_snap/pass_forward + QB +
    completion becomes view/purchase + positive value), grouped
    min/max of the ordering field as start/end, a carried max metric
    (playResult yards becomes peak value), and the derived duration.

    ``unix_timestamp`` floors to whole seconds; the oracle mirrors
    that with epoch(date_trunc('second', ...)) — DuckDB's bare
    epoch() returns fractional DOUBLE seconds, whose difference
    truncates differently than Spark's floor-then-subtract."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.filter(F.col("event_type").isin(["view", "purchase"])
                  & (F.col("value") > 0.0))                        # WIP:73-74
    out = (t.groupBy("user_id")
           .agg(F.min("ts").alias("first_ts"),
                F.max("ts").alias("last_ts"),
                F.max("value").alias("peak_value")))               # WIP:75-76
    return (out.withColumn(
                "seconds_active",
                F.unix_timestamp("last_ts")
                - F.unix_timestamp("first_ts"))                    # WIP:77
            .select("user_id", "first_ts", "last_ts",
                    "seconds_active", "peak_value"))


# ----------------------------------------------------- scalar surface

# Registry curation (round 2): f7_conditional_sentinel folded into
# f1_math_surface — the sentinel ifelse chain is one more projected
# column over the same scan, and both keep driver-checked values.

@query(
    "f1_math_surface",
    """SELECT l_orderkey, l_linenumber,
              ABS(l_discount - l_tax) AS abs_diff,
              GREATEST(l_discount, l_tax) AS gmax,
              LEAST(l_discount, l_tax) AS gmin,
              ROUND(l_extendedprice / 100.0, 4) AS price_hundreds,
              CASE WHEN l_returnflag = 'R' THEN -999.0
                   WHEN l_quantity <= 10.0 THEN l_quantity * 2.0
                   WHEN l_quantity <= 30.0 THEN l_quantity + 5.0
                   ELSE l_quantity END AS adjusted_qty
       FROM lineitem WHERE l_quantity < 3.0""",
)
def f1_math_surface(spark, sf_dir):
    """F1–F4 + F7/P5: abs / pmax / pmin / round / arithmetic
    (MBE:52, 77; MO:20) plus the nested vectorized conditional with a
    sentinel branch — the MBE:45 ``-999`` idiom and 3-deep ifelse
    chains (MBE:81-82, 100-103). Rounding scale 4 = identity for
    2-decimal money / 100 — rounding at a coarser digit would sit
    exactly on half-boundaries, where Spark (HALF_UP on the decimal
    string) and DuckDB (binary nearest-even) legitimately disagree."""
    li = load_table(spark, sf_dir, "lineitem")
    d, t, q = F.col("l_discount"), F.col("l_tax"), F.col("l_quantity")
    return (li.filter(q < 3.0)
            .select("l_orderkey", "l_linenumber",
                    F.abs(d - t).alias("abs_diff"),
                    F.greatest(d, t).alias("gmax"),
                    F.least(d, t).alias("gmin"),
                    F.round(F.col("l_extendedprice") / 100.0, 4)
                     .alias("price_hundreds"),
                    F.when(F.col("l_returnflag") == "R", F.lit(-999.0))
                     .when(q <= 10.0, q * 2.0)
                     .when(q <= 30.0, q + 5.0)
                     .otherwise(q).alias("adjusted_qty")))


# --------------------------------------------------------- multimodal

# Registry curation (round 2): the standalone decode query folded
# into mm_extract_features — the features query drives the same
# decode → mapInPandas plumbing end-to-end; decode determinism stays
# pytest-verified.

def _mm_oracle() -> str:
    """The stub decode + feature arithmetic restated in SQL: the stub
    derives every output from md5/sha256 of the payload bytes, and
    DuckDB's md5/sha256 hash the same bytes — so even this mapInPandas
    pipeline has an exact oracle. Hex-pair → byte via digit strpos."""
    from ..multimodal.binary_ops import FEATURE_DIM

    def byte(h: str, j: int) -> str:
        def p(i: int) -> str:
            return (f"(strpos('0123456789abcdef', "
                    f"substr({h}, {i}, 1)) - 1)")
        return f"(16 * {p(2 * j + 1)} + {p(2 * j + 2)})"

    return f"""WITH meta AS (
          SELECT doc_id AS media_id, 'image' AS modality,
                 md5(text) AS mh, sha256(text) AS sh
          FROM documents)
        SELECT media_id, modality,
               CAST(16 + {byte('mh', 0)} % 240 AS INT) AS width,
               CAST(16 + {byte('mh', 1)} % 240 AS INT) AS height,
               CAST(1 + {byte('mh', 2)} % 3 AS INT) AS n_channels,
               'stub' AS decoder,
               CAST(t.i AS INT) AS dim_idx,
               CASE t.i {" ".join(
                   f"WHEN {j} THEN {byte('sh', j)} / 255.0"
                   for j in range(FEATURE_DIM))} END AS feature
        FROM meta CROSS JOIN range(0, {FEATURE_DIM}) t(i)"""


@query("mm_extract_features", _mm_oracle())
def mm_extract_features(spark, sf_dir):
    """Multimodal pipeline: documents.text bytes stand in for image
    blobs → decode pass → Arrow-batched feature extraction, exploded
    to one row per (media, dim) so every value is scalar-hashable.
    The mapInPandas Arrow plumbing is the product; the stub codec is
    hash-derived and deterministic, which makes even this Python
    stage fully oracle-checked (the oracle recomputes the md5/sha256
    arithmetic in SQL). Swapping in a real codec changes only
    ``_decode_one`` / the feature body — and moves the query to
    rows-only, as a real model forward pass should be."""
    docs = load_table(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    meta = decode_media(media)
    feats = extract_features(media)
    exploded = feats.select(
        "media_id",
        F.posexplode("features").alias("dim_idx", "feature"))
    return (meta.select("media_id", "modality", "width", "height",
                        "n_channels", "decoder")
            .join(exploded, "media_id"))


@query(
    "qpipe_blocker_counts",
    """WITH disc AS (
          SELECT l_orderkey, COUNT(*) AS n_disc_suppliers FROM (
            SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
            WHERE l_discount >= 0.05) GROUP BY l_orderkey),
        alls AS (
          SELECT l_orderkey, COUNT(*) AS n_all_suppliers FROM (
            SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
          GROUP BY l_orderkey)
        SELECT o.o_orderkey,
               COALESCE(d.n_disc_suppliers, 0) AS n_disc_suppliers,
               COALESCE(a.n_all_suppliers, 0) AS n_all_suppliers,
               o.o_totalprice
        FROM orders o
        LEFT JOIN disc d ON d.l_orderkey = o.o_orderkey
        LEFT JOIN alls a ON a.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem WHERE l_quantity >= 30)""",
)
def qpipe_blocker_counts(spark, sf_dir):
    """Q5 ``blocker_counts`` analogue (MBE:120-141): two filtered
    dedup-count aggregates over the same fact table (OL blockers /
    all blockers becomes discounted suppliers / all suppliers per
    order), attached to the entity grain with left-join + zero fill,
    then the reference's dedup-then-merge existence filter as a
    semi-join (rushers blocked by >=1 OL becomes orders with >=1
    heavy line). Exercises the real engine operators
    (joins.left_join_fill / joins.semi_join), not inlined joins."""
    from ..operators import joins as jn

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def supplier_count(filtered, alias):
        return (filtered.select("l_orderkey", "l_suppkey").distinct()
                .groupBy("l_orderkey")
                .agg(F.count(F.lit(1)).alias(alias))
                .withColumnRenamed("l_orderkey", "o_orderkey"))

    disc = supplier_count(
        li.filter(F.col("l_discount") >= 0.05), "n_disc_suppliers")
    alls = supplier_count(li, "n_all_suppliers")
    heavy = (li.filter(F.col("l_quantity") >= 30)
             .select(F.col("l_orderkey").alias("o_orderkey")))
    out = orders.select("o_orderkey", "o_totalprice")
    out = jn.left_join_fill(out, disc, ["o_orderkey"],
                            fill={"n_disc_suppliers": 0})
    out = jn.left_join_fill(out, alls, ["o_orderkey"],
                            fill={"n_all_suppliers": 0})
    out = jn.semi_join(out, heavy, ["o_orderkey"])
    return out.select("o_orderkey", "n_disc_suppliers",
                      "n_all_suppliers", "o_totalprice")
