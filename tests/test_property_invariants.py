"""Property-based invariants (hypothesis) for the round-4 operators.

Each property is checked over randomized small inputs — the goal is
edge-case coverage (empty docs, all-duplicate corpora, equal
timestamps, single-user streams) that hand fixtures miss. Example
counts are kept low: every example pays a Spark job, so these assert
LOGICAL invariants, not throughput.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_bowl___2023_spark.dedup.lines import remove_repeated_lines
from big_data_bowl___2023_spark.operators.sampling import cap_per_group
from big_data_bowl___2023_spark.operators.sessions import sessionize

SETTINGS = dict(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

WORDS = ["alpha", "beta", "gamma", "delta", "shared",
         "boilerplate", "unique"]

line_st = st.lists(st.sampled_from(WORDS), min_size=0, max_size=6) \
    .map(" ".join)
doc_st = st.lists(line_st, min_size=0, max_size=5).map("\n".join)


@given(texts=st.lists(doc_st, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_line_dedup_output_lines_subset_and_ordered(spark, texts):
    """Every output doc's lines are a subsequence of its input lines
    (nothing invented, order preserved), and eligible repeated lines
    appear at most once corpus-wide under keep='first'."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    out = {r.doc_id: r.text for r in
           remove_repeated_lines(docs, min_chars=10).collect()}
    seen = {}
    for i, t in enumerate(texts):
        out_lines = out[i].split("\n") if out[i] else []
        in_lines = t.split("\n")
        it = iter(in_lines)
        for line in out_lines:          # subsequence check
            for cand in it:
                if cand == line:
                    break
            else:
                raise AssertionError(
                    f"line {line!r} not in order in doc {i}: {in_lines}")
        for line in out_lines:
            key = line.strip()
            if len(key) >= 10:
                seen[key] = seen.get(key, 0) + 1
    assert all(v == 1 for v in seen.values()), seen


@given(events=st.lists(
    st.tuples(st.integers(0, 3),            # user
              st.integers(0, 5000)),        # minutes offset
    min_size=1, max_size=25))
@settings(**SETTINGS)
def test_sessionize_partition_and_gap_invariants(spark, events):
    """Sessions partition each user's events; within a session every
    consecutive gap is <= the threshold; across session boundaries
    the gap is > the threshold."""
    gap_min = 30
    base = datetime(2024, 1, 1)
    rows = [(i, base + timedelta(minutes=m), u)
            for i, (u, m) in enumerate(events)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    got = sorted(((r.user_id, r.ts, r.event_id, r.session_idx)
                  for r in sessionize(df, gap_min).collect()))
    by_user: dict = {}
    for u, ts, eid, sidx in got:
        by_user.setdefault(u, []).append((ts, eid, sidx))
    for u, seq in by_user.items():
        assert seq[0][2] == 1                    # sessions start at 1
        for (t0, _, s0), (t1, _, s1) in zip(seq, seq[1:]):
            gap = (t1 - t0).total_seconds()
            if s1 == s0:
                assert gap <= gap_min * 60
            else:
                assert s1 == s0 + 1              # contiguous indices
                assert gap > gap_min * 60


@given(rows=st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              st.floats(0, 100, allow_nan=False)),
    min_size=1, max_size=20),
    cap=st.integers(1, 5))
@settings(**SETTINGS)
def test_cap_per_group_invariants(spark, rows, cap):
    """Never more than cap rows per group; with a priority column the
    kept rows are exactly a top-slice by score (no kept row scores
    below a dropped row of the same group)."""
    df = spark.createDataFrame(
        [(i, g, s) for i, (g, s) in enumerate(rows)],
        ["doc_id", "source", "score"])
    kept = cap_per_group(df, ["source"], cap,
                         priority_col="score").collect()
    by_group: dict = {}
    for r in kept:
        by_group.setdefault(r.source, []).append(r)
    all_by_group: dict = {}
    for i, (g, s) in enumerate(rows):
        all_by_group.setdefault(g, []).append((s, i))
    for g, members in all_by_group.items():
        kept_g = by_group.get(g, [])
        assert len(kept_g) == min(cap, len(members))
        if len(members) > cap:
            kept_min = min(r.score for r in kept_g)
            kept_ids = {r.doc_id for r in kept_g}
            dropped_max = max(s for s, i in members
                              if i not in kept_ids)
            assert kept_min >= dropped_max - 1e-9


# ---------------------------------------------------------- MG merge

@given(stream=st.lists(st.integers(min_value=0, max_value=30),
                       min_size=1, max_size=400),
       capacity=st.integers(min_value=1, max_value=12),
       n_chunks=st.integers(min_value=1, max_value=5))
@settings(max_examples=200, deadline=None)
def test_mg_merge_undercount_and_candidate_bounds(stream, capacity,
                                                  n_chunks):
    """Pure-python Misra-Gries invariants (no Spark): after merging a
    stream in arbitrary chunkings, (1) state size <= capacity,
    (2) every tracked count lower-bounds the true count,
    (3) total undercount of any key <= n/(capacity+1) — so every key
    with true count > n/(capacity+1) is present: the union-candidate
    guarantee heavy_hitters and streaming_heavy_hitters build on,
    under ANY batch split (batch boundaries must not matter)."""
    import collections

    from big_data_bowl___2023_spark.operators.heavy import _mg_merge

    exact = collections.Counter(stream)
    n = len(stream)
    state: dict = {}
    step = max(1, len(stream) // n_chunks)
    for i in range(0, len(stream), step):
        chunk = collections.Counter(stream[i:i + step])
        _mg_merge(state, chunk, capacity)

    assert len(state) <= capacity
    bound = n / (capacity + 1)
    for k, c in state.items():
        assert 0 < c <= exact[k]
    for k, true_c in exact.items():
        tracked = state.get(k, 0)
        assert true_c - tracked <= bound
        if true_c > bound:
            assert k in state


# ------------------------------------------------------------- SCD2

@given(n1=st.integers(min_value=0, max_value=12),
       n2=st.integers(min_value=1, max_value=12),
       data=st.data())
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
def test_scd2_random_streams_match_replay(spark, n1, n2, data):
    """Random two-phase update streams (init batch + apply batch,
    unique (key, ts) by construction) always equal the python replay
    of the documented semantics, and always satisfy the structural
    invariants."""
    from datetime import datetime

    from big_data_bowl___2023_spark.operators.scd import (
        scd2_apply,
        scd2_init,
    )

    keys = ["a", "b"]
    attrs = ["x", "y", "z"]
    # unique (key, ts): sample distinct ts slots per key, split into
    # init (earlier) and apply (later) halves
    events = []
    for k in keys:
        n_ts = data.draw(st.integers(min_value=0,
                                     max_value=n1 + n2))
        ts_list = sorted(data.draw(st.lists(
            st.integers(min_value=1, max_value=40),
            min_size=n_ts, max_size=n_ts, unique=True)))
        for t in ts_list:
            events.append((k, data.draw(st.sampled_from(attrs)),
                           datetime(2026, 1, 1, 0, t)))
    if not events:
        return
    events.sort(key=lambda e: (e[0], e[2]))
    cut = datetime(2026, 1, 1, 0, 20)
    first = [e for e in events if e[2] < cut]
    second = [e for e in events if e[2] >= cut]
    if not first or not second:
        return

    def replay(seq):
        state: dict = {}
        for k, a, t in seq:
            vers = state.setdefault(k, [])
            if vers and vers[-1][0] == a:
                continue
            if vers:
                vers[-1] = (vers[-1][0], vers[-1][1], t)
            vers.append((a, t, None))
        return {(k, a, vf, vt, vt is None)
                for k, vers in state.items() for a, vf, vt in vers}

    dim = scd2_init(spark.createDataFrame(
        first, ["k", "attr", "effective_ts"]), ["k"])
    out = scd2_apply(dim, spark.createDataFrame(
        second, ["k", "attr", "effective_ts"]), ["k"]).collect()
    got = {(r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
           for r in out}
    assert got == replay(events)
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    for vers in by_key.values():
        assert sum(1 for v in vers if v.is_current) == 1
        vs = sorted(vers, key=lambda v: v.valid_from)
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from


@given(n_upd=st.integers(min_value=1, max_value=14), data=st.data())
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
def test_scd2_quarantine_accounting(spark, n_upd, data):
    """Random out-of-order apply batches: the quarantine is EXACTLY
    the deduped updates at or before their key's open valid_from, and
    the result dimension equals applying only the admissible rest —
    no update is lost or double-applied."""
    from datetime import datetime

    from big_data_bowl___2023_spark.operators.scd import (
        scd2_apply,
        scd2_apply_with_quarantine,
        scd2_init,
    )

    T = lambda t: datetime(2026, 1, 1, 0, t)
    keys = ["a", "b"]
    # dim: each key bootstrapped with one version at a drawn ts
    init_rows = [(k, "v0", T(data.draw(st.integers(5, 15),
                                       label=f"init_{k}")))
                 for k in keys]
    dim = scd2_init(spark.createDataFrame(
        init_rows, ["k", "attr", "effective_ts"]), ["k"]) \
        .localCheckpoint()
    open_vf = {k: t for k, _, t in init_rows}

    # updates: arbitrary ts 1..30 (before OR after the open version),
    # duplicates allowed (deduped deterministically)
    ups = [(data.draw(st.sampled_from(keys), label=f"k{i}"),
            data.draw(st.sampled_from(["p", "q", "r"]),
                      label=f"a{i}"),
            T(data.draw(st.integers(1, 30), label=f"t{i}")))
           for i in range(n_upd)]
    updf = spark.createDataFrame(ups, ["k", "attr", "effective_ts"])

    # python dedupe mirror: per (key, ts) keep smallest attr tuple
    best: dict = {}
    for k, a, t in ups:
        if (k, t) not in best or a < best[(k, t)]:
            best[(k, t)] = a
    deduped = [(k, a, t) for (k, t), a in best.items()]
    want_late = {(k, a, t) for k, a, t in deduped
                 if t <= open_vf[k]}
    admissible = [u for u in deduped
                  if (u[0], u[1], u[2]) not in want_late]

    new_dim, quar = scd2_apply_with_quarantine(dim, updf, ["k"])
    got_late = {(r.k, r.attr, r.effective_ts)
                for r in quar.collect()}
    assert got_late == want_late

    if admissible:
        want_dim = scd2_apply(
            dim, spark.createDataFrame(
                admissible, ["k", "attr", "effective_ts"]), ["k"])
    else:
        want_dim = dim        # everything quarantined: no-op apply
    got = {(r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
           for r in new_dim.collect()}
    want = {(r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
            for r in want_dim.collect()}
    assert got == want
