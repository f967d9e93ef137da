"""The bench/anchor contract: every benched query has a committed
quiet-run anchor, and the anchors file stays in sync with the bench
set — a renamed or added bench query can't silently detach from the
contention-retry gate."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _anchor_names():
    with open(os.path.join(REPO, "BASELINE_anchors.json")) as fh:
        payload = json.load(fh)
    return payload["anchors"]


def test_anchors_cover_every_benched_query():
    import bench

    anchors = _anchor_names()
    benched = set(bench.HEADLINE) | set(bench._extra_ops())
    missing = benched - set(anchors)
    assert not missing, (
        f"benched queries without a quiet-run anchor: {sorted(missing)}"
        " — add them to BASELINE_anchors.json (and note the source run"
        " in BASELINE.md) so the contention retry covers them")


def test_anchors_have_no_stale_entries():
    import bench

    anchors = _anchor_names()
    benched = set(bench.HEADLINE) | set(bench._extra_ops())
    stale = set(anchors) - benched
    assert not stale, (
        f"anchors for queries no longer benched: {sorted(stale)}")


def test_anchor_values_sane():
    for name, v in _anchor_names().items():
        assert isinstance(v, (int, float)) and 0 < v < 300, (name, v)
