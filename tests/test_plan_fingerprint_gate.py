"""The tree-wide plan-fingerprint gate (round-8 task 4): pure-logic
tests of tools/verify_local.check_plan_fingerprints — regressions
(more Exchanges, more BNL joins, a new cartesian) fail; improvements
and unbaselined queries don't; fingerprints live in per-pin-mode
slots (a durable-mode sweep keeps the lineage localCheckpoint
truncates, so its plans legitimately differ — and a durable-mode
re-baseline must never clobber the default-mode baseline); a sweep
at a different sf never judges fingerprints recorded elsewhere. The
committed PLAN_FINGERPRINTS.json itself must cover every registry
query in default mode."""

from __future__ import annotations

import json
import os

import pytest

from big_data_bowl___2023_spark.session import durable_pins
from tools import verify_local as VL

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE = {"n_scans": 2, "scans_with_pushed_filters": 2,
        "n_exchanges": 3, "n_broadcast_joins": 1,
        "n_sortmerge_joins": 0, "n_bnl_joins": 0,
        "has_cartesian": False}


@pytest.fixture()
def baseline(tmp_path, monkeypatch):
    path = str(tmp_path / "PLAN_FINGERPRINTS.json")
    with open(path, "w") as fh:
        json.dump({"sf_dir": "/sf",
                   "modes": {"default": {"q": BASE}}}, fh)
    monkeypatch.setattr(VL, "FINGERPRINT_PATH", path)
    return path


def test_gate_passes_on_identical_and_improved(baseline, capsys):
    with durable_pins(False):
        assert VL.check_plan_fingerprints({"q": dict(BASE)}, "/sf",
                                          False) == 0
        better = dict(BASE, n_exchanges=1)
        assert VL.check_plan_fingerprints({"q": better}, "/sf",
                                          False) == 0
    assert "improved" in capsys.readouterr().out


@pytest.mark.parametrize("delta", [
    {"n_exchanges": 4},
    {"n_bnl_joins": 1},
    {"has_cartesian": True},
])
def test_gate_fails_on_new_shuffle_bnl_cartesian(baseline, delta,
                                                 capsys):
    got = {"q": dict(BASE, **delta)}
    with durable_pins(False):
        assert VL.check_plan_fingerprints(got, "/sf", False) == 1
    assert "PLAN-REGRESS q" in capsys.readouterr().out


def test_gate_skips_other_sf_and_unbaselined(baseline, capsys):
    worse = {"q": dict(BASE, has_cartesian=True)}
    with durable_pins(False):
        assert VL.check_plan_fingerprints(worse, "/other-sf",
                                          False) == 0
        assert VL.check_plan_fingerprints(
            {"new_q": dict(BASE, has_cartesian=True)}, "/sf",
            False) == 0
    out = capsys.readouterr().out
    assert "skipping" in out and "unbaselined" in out


def test_gate_skips_unbaselined_pin_mode(baseline, capsys):
    """A durable sweep with no durable slot committed prints a note
    and never judges (or fails against) the default-mode plans."""
    worse = {"q": dict(BASE, n_exchanges=99, has_cartesian=True)}
    with durable_pins(True):
        assert VL.check_plan_fingerprints(worse, "/sf", False) == 0
    assert "no committed fingerprints for durable mode" \
        in capsys.readouterr().out


def test_gate_update_is_per_mode_slot(tmp_path, monkeypatch):
    """--update-plans writes into the CURRENT mode's slot and leaves
    the other mode's baseline intact — a durable re-baseline must
    not disable the always-on default gate."""
    path = str(tmp_path / "fp.json")
    monkeypatch.setattr(VL, "FINGERPRINT_PATH", path)
    with durable_pins(False):
        assert VL.check_plan_fingerprints({"q": BASE}, "/sf",
                                          True) == 0
    durable_rep = dict(BASE, n_exchanges=9)
    with durable_pins(True):
        assert VL.check_plan_fingerprints({"q": durable_rep}, "/sf",
                                          True) == 0
    with open(path) as fh:
        data = json.load(fh)
    assert data == {"sf_dir": "/sf",
                    "modes": {"default": {"q": BASE},
                              "durable": {"q": durable_rep}}}
    # and each mode still compares against ITS OWN slot
    with durable_pins(False):
        assert VL.check_plan_fingerprints({"q": BASE}, "/sf",
                                          False) == 0
    with durable_pins(True):
        assert VL.check_plan_fingerprints({"q": durable_rep}, "/sf",
                                          False) == 0
        assert VL.check_plan_fingerprints(
            {"q": dict(durable_rep, n_exchanges=10)}, "/sf",
            False) == 1


def test_gate_update_merges_subset_sweeps(tmp_path, monkeypatch):
    """A registry-only re-baseline must keep the bench-extra entries
    (and vice versa); names that left the query universe entirely are
    pruned. Round-9 task 7: the bench headliners are fingerprinted by
    --extras sweeps, which don't run on every update."""
    path = str(tmp_path / "fp.json")
    monkeypatch.setattr(VL, "FINGERPRINT_PATH", path)
    monkeypatch.setattr(VL, "_query_universe",
                        lambda: {"q", "curation_e2e"})
    bench_rep = dict(BASE, n_exchanges=7)
    with durable_pins(False):
        # full sweep with extras (+ one name later removed)
        VL.check_plan_fingerprints(
            {"q": BASE, "curation_e2e": bench_rep,
             "retired_query": BASE}, "/sf", True)
        # registry-only re-baseline: must not drop curation_e2e,
        # must prune retired_query
        VL.check_plan_fingerprints({"q": dict(BASE, n_exchanges=2)},
                                   "/sf", True)
    with open(path) as fh:
        fps = json.load(fh)["modes"]["default"]
    assert fps["curation_e2e"] == bench_rep
    assert fps["q"]["n_exchanges"] == 2
    assert "retired_query" not in fps
    # and a bench-extra regression trips the gate like any other
    with durable_pins(False):
        assert VL.check_plan_fingerprints(
            {"curation_e2e": dict(bench_rep, n_exchanges=8)},
            "/sf", False) == 1


def test_committed_fingerprints_cover_bench_extras():
    """The committed baseline carries the bench-only headliner
    compositions (curation_e2e, dedup_semantic_pairs, ...) so a plan
    regression there fails the --extras sweep instead of waiting for
    a bench-number diff."""
    path = os.path.join(REPO, "PLAN_FINGERPRINTS.json")
    with open(path) as fh:
        fps = json.load(fh)["modes"]["default"]
    import bench
    missing = set(bench._extra_ops()) - set(fps)
    assert not missing, (
        f"unfingerprinted bench extras: {missing} — run "
        "`python tools/verify_local.py <sf0.01> --extras "
        "--update-plans`")


def test_committed_fingerprints_cover_registry():
    path = os.path.join(REPO, "PLAN_FINGERPRINTS.json")
    assert os.path.exists(path), (
        "PLAN_FINGERPRINTS.json missing: run "
        "`python tools/verify_local.py <sf0.01> --update-plans`")
    with open(path) as fh:
        data = json.load(fh)
    from big_data_bowl___2023_spark import registry
    fps = data["modes"]["default"]
    missing = set(registry.all_queries()) - set(fps)
    assert not missing, f"unfingerprinted registry queries: {missing}"
    # the two GEMM-blocked kernels join their BOUNDED per-block
    # aggregates on blk_a <= blk_b — a deliberate nested-loop over
    # n_blocks² tiny rows, not a corpus-scale NLJ (the gate still
    # fails if the count ever grows); hybrid_index_topk inherits
    # bm25_topk's two ONE-ROW corpus-scalar attaches (avgdl/N
    # broadcast cross joins compile to BNLJ Inner BuildRight with a
    # single-row build side — the standard scalar-attach shape, cost
    # bounded by construction)
    bounded_bnl_ok = {"dedup_embedding_cosine", "sim_topk_cosine",
                      "hybrid_index_topk"}
    for name, rep in fps.items():
        assert not rep["has_cartesian"], name
        assert rep["n_bnl_joins"] == 0 or name in bounded_bnl_ok, name
