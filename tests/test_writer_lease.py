"""Writer-epoch lease (sources/lease.py — verdict r10 #2): the
one-writer maintenance rule as a mechanism.

Contracts under test:
* two writers on the same root: the second REFUSES loudly with
  `WriterLeaseConflict` naming the holder;
* a crashed holder's stale lease (past TTL) is taken over;
* re-entrancy: composed maintenance in one process re-enters the
  lease it holds (apply_snapshot_diff drives ingest batches under
  its own lease) and the file survives until the OUTERMOST release;
* release is owner-checked: a takeover victim's late release cannot
  kill the new holder's lease;
* the real entry points (append/compact/vacuum/delete/clear/
  snapshot-apply/compact_curated/ingest batch) all hold the lease —
  pinned by observing the conflict from a foreign holder;
* readers (searches, read_curated, stats) never touch the lease.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.similarity import (
    ann_index_search,
    append_to_index,
    build_ann_index,
    clear_index_deletes,
    delete_from_index,
    index_cell_stats,
)
from big_data_bowl___2023_spark.sources.io import load_table
from big_data_bowl___2023_spark.sources.lease import (
    _HELD,
    WriterLeaseConflict,
    acquire_writer_lease,
    break_writer_lease,
    release_writer_lease,
    renew_writer_lease,
    writer_lease,
)


def _foreign_lease(root, what="foreign_compact"):
    """Plant a lease file as if ANOTHER process held it (bypassing
    this process's re-entrancy registry). Drops any stale Hadoop
    LocalFileSystem ``.crc`` sidecar a prior fs.create left behind —
    writing through plain Python would otherwise leave a checksum
    mismatch that makes the engine's read return {} (a pure
    test-harness artifact: real foreign writers go through the same
    Hadoop FS and keep the CRC in step)."""
    payload = {"owner": "elsewhere", "what": what, "pid": 99999,
               "acquired_unix": 0.0, "ttl_s": 3600.0, "epoch": 7}
    path = root.rstrip("/") + "__lease"
    with open(path, "w") as f:
        f.write(json.dumps(payload))
    crc = os.path.join(os.path.dirname(path),
                       "." + os.path.basename(path) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_conflict_refuses_loudly(spark, tmp_path):
    root = str(tmp_path / "idx")
    os.makedirs(root)
    _foreign_lease(root)
    with pytest.raises(WriterLeaseConflict, match="foreign_compact"):
        acquire_writer_lease(spark, root, "append")
    # the holder's file is untouched by the refusal
    assert os.path.exists(root + "__lease")


def test_stale_lease_taken_over(spark, tmp_path):
    root = str(tmp_path / "idx")
    os.makedirs(root)
    _foreign_lease(root)
    lease_path = root + "__lease"
    # age the file past its TTL
    os.utime(lease_path, (0, 0))
    with writer_lease(spark, root, "takeover") as token:
        holder = json.load(open(lease_path))
        assert holder["owner"] == token
        assert holder["what"] == "takeover"
    assert not os.path.exists(lease_path)


def test_reentrant_and_owner_checked_release(spark, tmp_path):
    root = str(tmp_path / "idx")
    os.makedirs(root)
    t1 = acquire_writer_lease(spark, root, "outer")
    t2 = acquire_writer_lease(spark, root, "inner")
    assert t1 == t2                       # re-entered, same token
    release_writer_lease(spark, root, t2)
    assert os.path.exists(root + "__lease")   # outer still holds
    # a stranger's token is a no-op
    release_writer_lease(spark, root, "stranger-token")
    assert os.path.exists(root + "__lease")
    release_writer_lease(spark, root, t1)
    assert not os.path.exists(root + "__lease")
    assert os.path.abspath(root) not in _HELD


def test_epoch_is_monotonic(spark, tmp_path):
    root = str(tmp_path / "idx")
    os.makedirs(root)
    epochs = []
    for what in ("a", "b", "c"):
        with writer_lease(spark, root, what):
            epochs.append(json.load(open(root + "__lease"))["epoch"])
    assert epochs == sorted(epochs) and len(set(epochs)) == 3


def test_break_writer_lease(spark, tmp_path):
    root = str(tmp_path / "idx")
    os.makedirs(root)
    _foreign_lease(root)
    assert break_writer_lease(spark, root) is True
    with writer_lease(spark, root, "after-break"):
        pass


def test_index_maintenance_holds_lease(spark, sf_dir, tmp_path):
    """Every index maintenance entry point refuses under a foreign
    lease; searches and stats run fine under it."""
    from big_data_bowl___2023_spark.streaming.ann_index_stream import (
        compact_index,
        vacuum_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    idx = str(tmp_path / "idx")
    build_ann_index(emb, idx)
    delete_from_index(spark, idx, [1])
    _foreign_lease(idx)
    for op in (
        lambda: build_ann_index(emb, idx),
        lambda: append_to_index(emb.limit(5), idx),
        lambda: delete_from_index(spark, idx, [2]),
        lambda: clear_index_deletes(spark, idx),
        lambda: compact_index(spark, idx),
        lambda: vacuum_index(spark, idx),
    ):
        with pytest.raises(WriterLeaseConflict):
            op()
    # readers are lease-free
    assert ann_index_search(spark, idx, queries, 5).count() > 0
    assert index_cell_stats(spark, idx)["n_rows"] == emb.count()
    break_writer_lease(spark, idx)
    append_to_index(emb.limit(5), idx)    # works again


def test_curation_maintenance_holds_lease(spark, tmp_path):
    from big_data_bowl___2023_spark.streaming import (
        apply_snapshot_diff,
        compact_curated,
        make_curation_ingest_batch_fn,
        read_curated,
    )

    def _doc(i):
        return (i, "src", " ".join(
            f"w{i}tok{j} common filler text segment"
            for j in range(13)))

    out = str(tmp_path / "curated")
    fp_idx = str(tmp_path / "fp_idx")
    old = spark.createDataFrame(
        [_doc(1), _doc(2)], "doc_id long, source string, text string")
    fn = make_curation_ingest_batch_fn(out, fp_idx, min_words=10)
    fn(old, 0)
    _foreign_lease(out)
    snap2 = spark.createDataFrame(
        [_doc(2)], "doc_id long, source string, text string")
    for op in (
        lambda: fn(snap2, 1),
        lambda: apply_snapshot_diff(spark, old, snap2, out, fp_idx,
                                    batch_id=1, min_words=10),
        lambda: compact_curated(spark, out),
    ):
        with pytest.raises(WriterLeaseConflict):
            op()
    # readers are lease-free
    assert read_curated(spark, out).count() == 2
    break_writer_lease(spark, out)
    # snapshot apply composes: it drives ingest batches that re-enter
    # its lease rather than deadlocking, and releases at exit
    apply_snapshot_diff(spark, old, snap2, out, fp_idx, batch_id=1,
                        min_words=10)
    assert {r.doc_id for r in read_curated(spark, out).collect()} \
        == {2}
    assert not os.path.exists(out + "__lease")


def test_second_thread_conflicts_not_reenters(spark, tmp_path):
    """Review r11: re-entrancy is per THREAD — a different driver
    thread (a second streaming query, a scheduler compaction) must
    conflict, never silently share the lease."""
    import threading

    root = str(tmp_path / "idx")
    os.makedirs(root)
    result = {}

    def other_thread():
        try:
            acquire_writer_lease(spark, root, "thread-b")
            result["outcome"] = "acquired"
        except WriterLeaseConflict:
            result["outcome"] = "conflict"

    with writer_lease(spark, root, "thread-a"):
        t = threading.Thread(target=other_thread)
        t.start()
        t.join()
    assert result["outcome"] == "conflict"
    # after release, another thread acquires fine
    result.clear()
    t = threading.Thread(target=other_thread)
    t.start()
    t.join()
    assert result["outcome"] == "acquired"
    break_writer_lease(spark, root)


def test_fresh_unreadable_lease_not_stolen(spark, tmp_path):
    """Review r11: a lease whose payload is empty/unreadable (a
    racing acquirer mid create-to-write) is NOT stealable while its
    mtime is fresh — staleness is age alone."""
    root = str(tmp_path / "idx")
    os.makedirs(root)
    open(root + "__lease", "w").close()       # fresh, empty payload
    with pytest.raises(WriterLeaseConflict):
        acquire_writer_lease(spark, root, "thief")
    # once aged past the TTL it is ordinary stale takeover
    os.utime(root + "__lease", (0, 0))
    with writer_lease(spark, root, "after-ttl"):
        pass


def test_renew_refreshes_and_detects_takeover(spark, tmp_path):
    """Review r11: renew_writer_lease is the long-op heartbeat — it
    refreshes the file mtime under the holder's token, and returns
    False after a takeover so the old holder aborts instead of
    racing the new owner."""
    import time as _t

    root = str(tmp_path / "idx")
    os.makedirs(root)
    token = acquire_writer_lease(spark, root, "long-compaction")
    # age it WITHIN the TTL (an on-time heartbeat refreshes)
    aged = _t.time() - 100
    os.utime(root + "__lease", (aged, aged))
    assert renew_writer_lease(spark, root, token) is True
    assert os.path.getmtime(root + "__lease") > aged + 50
    holder = json.load(open(root + "__lease"))
    assert holder["owner"] == token and "renewed_unix" in holder
    # a lease ALREADY past its TTL refuses to renew — a taker may be
    # mid-takeover; the holder must abort (review r11)
    os.utime(root + "__lease", (0, 0))
    assert renew_writer_lease(spark, root, token) is False
    release_writer_lease(spark, root, token)
    token = acquire_writer_lease(spark, root, "again")

    # simulate a takeover: someone replaced the lease file
    _foreign_lease(root)
    assert renew_writer_lease(spark, root, token) is False
    release_writer_lease(spark, root, token)  # owner-checked no-op
    assert json.load(open(root + "__lease"))["owner"] == "elsewhere"
    break_writer_lease(spark, root)


def test_writer_lease_status_readonly_view(spark, tmp_path):
    from big_data_bowl___2023_spark.sources.lease import (
        writer_lease_status,
    )

    root = str(tmp_path / "idx")
    os.makedirs(root)
    st = writer_lease_status(spark, root)
    assert st == {"held": False, "stale": False, "age_s": None,
                  "owner": None, "what": None, "pid": None,
                  "epoch": None, "epoch_unverified": False,
                  "ttl_s": None}
    with writer_lease(spark, root, "compact") as token:
        st = writer_lease_status(spark, root)
        assert st["held"] is True and st["stale"] is False
        assert st["owner"] == token and st["what"] == "compact"
        assert st["epoch"] == 1 and st["age_s"] is not None
        assert st["epoch_unverified"] is False
        # status is read-only: the lease file is untouched
        assert json.load(open(root + "__lease"))["owner"] == token
    st = writer_lease_status(spark, root)
    assert st["held"] is False and st["epoch"] == 1   # epoch persists
    _foreign_lease(root)
    os.utime(root + "__lease", (0, 0))
    assert writer_lease_status(spark, root)["stale"] is True
    break_writer_lease(spark, root)


def test_status_flags_unverified_epoch(spark, tmp_path,
                                       monkeypatch):
    """A holder that acquired through an epoch-counter FS blip
    carries the typed epoch=-1 — status must surface it as
    ``epoch_unverified: True`` so a takeover audit knows the trail
    is unreliable there (verdict r12 #5)."""
    from big_data_bowl___2023_spark.sources import lease as lease_mod
    from big_data_bowl___2023_spark.sources.lease import (
        writer_lease_status,
    )

    root = str(tmp_path / "idx")
    os.makedirs(root)

    def _blip(*a, **k):
        raise RuntimeError("simulated epoch FS blip")

    monkeypatch.setattr(lease_mod, "_bump_epoch", _blip)
    with writer_lease(spark, root, "compact"):
        st = writer_lease_status(spark, root)
        assert st["held"] is True
        assert st["epoch"] == -1
        assert st["epoch_unverified"] is True
    # released: the flag clears with the holder
    assert writer_lease_status(spark, root)["epoch_unverified"] \
        is False


def test_compaction_aborts_on_lost_lease(spark, sf_dir, tmp_path,
                                         monkeypatch):
    """Review r11: compact_index renews at its commit point — when
    the lease was taken over mid-rewrite, it discards the staged
    version and refuses to publish instead of racing the new
    writer."""
    import big_data_bowl___2023_spark.streaming.ann_index_stream \
        as stream_mod
    from big_data_bowl___2023_spark.sources import lease as lease_mod
    from big_data_bowl___2023_spark.streaming.ann_index_stream import (
        compact_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "idx")
    build_ann_index(emb.limit(100), idx)

    monkeypatch.setattr(lease_mod, "renew_writer_lease",
                        lambda *a, **k: False)
    with pytest.raises(WriterLeaseConflict, match="aborting before "
                                                  "publish"):
        compact_index(spark, idx)
    # nothing published, no staged residue
    from big_data_bowl___2023_spark.similarity import index_versions
    assert index_versions(spark, idx) == [1]
    assert not [p for p in os.listdir(f"{idx}/cells")
                if p.startswith("__publish_tmp")]
    assert not os.path.exists(idx + "__lease")   # released on exit
    # with a healthy lease the same compaction publishes v=2
    monkeypatch.undo()
    assert compact_index(spark, idx)["version"] == 2


def test_heartbeat_keeps_lease_fresh(spark, tmp_path):
    """Review r11 (third pass): the background heartbeat (on by
    default at ttl/6; explicit here for speed) renews the lease
    while the context is held — an op longer than the TTL no longer
    fails its commit-point renew just because acquisition was the
    last mtime refresh. Only STAT calls race the in-place rewrite
    (review r11 fourth pass: payload reads inside the loop flaked on
    the truncate-to-write window), and the post-exit absence also
    pins that the beat thread is JOINED before release — an
    in-flight renew after release would resurrect the file."""
    import time as _t

    root = str(tmp_path / "idx")
    os.makedirs(root)
    lease_path = root + "__lease"
    with writer_lease(spark, root, "long-op", ttl_s=3600.0,
                      heartbeat_s=0.5):
        # age the file as if acquisition were long past; a beat must
        # refresh it (stat-only polling — no payload reads mid-beat)
        aged = _t.time() - 1000
        os.utime(lease_path, (aged, aged))
        deadline = _t.time() + 15
        while True:
            try:
                if os.path.getmtime(lease_path) > aged + 500:
                    break
            except OSError:
                pass
            assert _t.time() < deadline, "heartbeat never renewed"
            _t.sleep(0.2)
    assert not os.path.exists(lease_path)
