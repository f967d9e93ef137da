"""Winnowing document fingerprints + cross-document overlap pairs.

The exact-substring dedup approximation for corpus curation: local
document fingerprinting by winnowing (Schleimer, Wilkerson, Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03).
Per document, hash every k-gram of tokens, slide a window of w
consecutive k-grams, and select each window's minimum hash; the
guarantee is that any token run of length ≥ w + k - 1 shared by two
documents yields at least one SHARED selected fingerprint — so long
verbatim overlaps (boilerplate, licenses, copied passages: the target
of exact-substring dedup in LLM corpus curation) are detected from
fingerprint sets a factor ~w/2 smaller than the full k-gram set.

Everything is codegen (split / transform / window min / joins): no
Python in the hot path, and the selection rule is deterministic
(lexicographic min of md5-hex, position tiebreak), so a DuckDB oracle
reproduces the fingerprint sets bit-for-bit (tests/test_winnow.py).

Shuffle profile at scale: one window shuffle keyed by doc_id for
selection (partition-local sort), one fingerprint-keyed self-join for
overlaps — the same bounded-candidates shape as MinHash banding, with
the identical hot-key guards (``max_doc_freq`` drops ubiquitous
fingerprints the way ngram.py drops stopword shingles).

Reference scope note: the reference repo has no corpus operators —
this module is a north-star extension (SURVEY.md §2 extensions,
inventory E56).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_POS_PAD = 12


def kgram_hashes(df: DataFrame, k: int = 3, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pos, kh): md5 of each token k-gram, 1-based pos.

    The k-gram table is built by a single ``transform(sequence(...))``
    over the token array — no explode-then-self-join, so a document
    never leaves its row until the one posexplode."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(F.col("_toks")) - F.lit(k - 1)),
        lambda i: F.array_join(F.slice(F.col("_toks"), i, k), " "))
    return (df
            .filter(F.size(toks) >= k)
            .withColumn("_toks", toks)
            .select(F.col(id_col).alias("doc_id"),
                    F.posexplode(grams).alias("pos0", "gram"))
            .select("doc_id",
                    (F.col("pos0") + 1).alias("pos"),
                    F.md5(F.encode(F.col("gram"), "UTF-8")).alias("kh")))


def winnow_fingerprints(df: DataFrame, k: int = 3, w: int = 4,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp_pos, fp) — the winnowed fingerprint set.

    Selection: for every full window of w consecutive k-grams, keep
    the minimum of ``md5hex || ':' || lpad(pos)`` — lexicographic hash
    min with position tiebreak, so repeated k-grams (ties on hash) are
    resolved deterministically and the DuckDB oracle agrees exactly.
    One window shuffle per doc; output ~2/(w+1) of the k-gram rows."""
    kg = kgram_hashes(df, k, text_col, id_col)
    key = F.concat(F.col("kh"), F.lit(":"),
                   F.lpad(F.col("pos").cast("string"), _POS_PAD, "0"))
    win = (Window.partitionBy("doc_id").orderBy("pos")
           .rowsBetween(Window.currentRow, w - 1))
    n = Window.partitionBy("doc_id")
    sel = (kg
           .withColumn("wmin", F.min(key).over(win))
           .withColumn("n_kg", F.count(F.lit(1)).over(n))
           # only FULL windows define selections
           .filter(F.col("pos") <= F.col("n_kg") - F.lit(w - 1))
           .select("doc_id", F.col("wmin").alias("sel"))
           .distinct())
    return sel.select(
        "doc_id",
        F.substring("sel", 34, _POS_PAD).cast("long").alias("fp_pos"),
        F.substring("sel", 1, 32).alias("fp"))


def fingerprint_overlap_pairs(df: DataFrame, k: int = 3, w: int = 4,
                              min_shared: int = 1,
                              max_doc_freq: int | None = None,
                              text_col: str = "text",
                              id_col: str = "doc_id") -> DataFrame:
    """(doc_a, doc_b, shared): pairs sharing ≥ min_shared distinct
    winnowed fingerprints — the verbatim-overlap candidate set.

    Guarantee (SIGMOD'03): any shared token run of length
    ≥ w + k - 1 produces ≥ 1 shared fingerprint, so min_shared=1
    never misses a long verbatim overlap. ``max_doc_freq`` drops
    fingerprints present in more documents than the cap before the
    pair join (boilerplate present in thousands of docs would
    otherwise contribute d² pairs — the ngram.py stopword-shingle
    guard applied to fingerprints)."""
    from ..session import pin

    # The fingerprint set is consumed by up to four subtrees (the
    # doc-frequency count, its join-back, and BOTH sides of the pair
    # self-join) — unpinned, each consumption re-ran the k-gram
    # explode + winnowing window over the full corpus (the sf0.1
    # plan held 8 scans of pure re-derivation). The pinned table is
    # (id, 32-hex) rows at ~2/(w+1) of the k-gram count — the
    # lightweight proxy the guide's worked example materializes
    # (guide §8): fingerprint once, decide pairs from the pin.
    fp = pin(winnow_fingerprints(df, k, w, text_col, id_col)
             .select("doc_id", "fp").distinct())
    # doc-frequency pass: ALWAYS computed now (r17) because df >= 2
    # prunes every pair-sterile fingerprint — a fingerprint in one
    # document contributes zero pairs but used to flow through both
    # self-join sides; on real corpora most fingerprints are unique,
    # so this shrinks both join inputs at the cost of a count the
    # capped path already paid. Output is unchanged by construction
    # (pairs need two docs).
    freq = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    cap = (F.col("df") <= max_doc_freq) if max_doc_freq is not None \
        else F.lit(True)
    elig = freq.filter((F.col("df") >= 2) & cap)
    if max_doc_freq is not None:
        # CAPPED path (r17): eligible groups are <= max_doc_freq docs
        # BY CONSTRUCTION, so the pair join collapses into one
        # groupBy(fp) + a map-side combination explode — the
        # fp-keyed exchange happens once instead of once per
        # self-join side, and the (bounded) doc lists never exceed
        # the cap that already guards the d² blowup. The join-back
        # reuses freq's fp partitioning, so groupBy(fp) adds no new
        # exchange.
        grouped = (fp.join(elig.select("fp"), "fp")
                   .groupBy("fp")
                   .agg(F.sort_array(F.collect_list("doc_id"))
                        .alias("ids")))
        exploded = grouped.select(
            F.col("ids"), F.posexplode("ids").alias("__i", "doc_a"))
        pairs = exploded.select(
            "doc_a",
            F.explode(F.slice(
                F.col("ids"), F.col("__i") + 2,
                F.size("ids") - F.col("__i") - 1)).alias("doc_b"))
    else:
        # UNCAPPED: a hot fingerprint's group is unbounded, so the
        # doc list must never materialize on one worker — keep the
        # self-join shape (AQE splits skewed fp partitions; the df>=2
        # prune above still removes the sterile singletons).
        sel = (fp.join(elig.select("fp"), "fp")
               .select("doc_id", "fp"))
        a = sel.select(F.col("doc_id").alias("doc_a"), "fp")
        b = sel.select(F.col("doc_id").alias("doc_b"), "fp")
        pairs = (a.join(b, "fp")
                 .filter(F.col("doc_a") < F.col("doc_b"))
                 .select("doc_a", "doc_b"))
    return (pairs
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("shared"))
            .filter(F.col("shared") >= min_shared))
