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


def test_media_profile_extra_attribution(spark):
    """The media_profile bench extra (r15 #6) must keep its exact
    per-tier attribution: a late-round walker regression that
    silently re-routes a tier to the stub would otherwise only move
    the timing, which drift could mask."""
    import bench

    fn = bench._extra_ops()["media_profile"]
    rows = fn(spark, "/root/testdata/sf0.001").collect()
    got = {(r["modality"], r["decoder"]): r["n_media"] for r in rows}
    k = bench._MEDIA_BENCH_COPIES
    expect = {
        ("image", "png"): k, ("image", "bmp"): k,
        ("image", "jpeg"): 2 * k,            # baseline + progressive
        ("image", "jpeg-dims"): k,           # arithmetic → dims tier
        ("image", "gif"): k, ("image", "gif-dims"): k,
        ("image", "tiff-dims"): k,
        ("image", "heif-dims"): k, ("image", "avif-dims"): k,
        ("audio", "wav"): k, ("audio", "mp3-dims"): k,
        ("audio", "flac-dims"): k, ("audio", "ogg-dims"): k,
        ("audio", "mp4-dims"): k,            # M4A
        ("video", "y4m"): k, ("video", "mp4-dims"): k,
        ("video", "avi-dims"): k, ("video", "mkv-dims"): k,
        ("unknown", "pdf-meta"): k, ("unknown", "zip-meta"): k,
        ("unknown", "gzip-meta"): k, ("unknown", "tar-meta"): k,
        ("unknown", "unknown-stub"): k,
    }
    assert got == expect
