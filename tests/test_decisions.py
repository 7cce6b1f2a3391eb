"""Measurement-driven feature decisions (``core/decisions.py``).

Gated optimizations resolve their defaults through committed decision
artifacts written by the device validation / A/B scripts, so an
unattended tunnel-recovery backlog resolves the gates without a human
editing code.  Precedence: env var > artifact > off.

Round-4 resolution: of the three original gates, MFCD_PIPELINE measured
1.104x and remains (default on via docs/decisions/pipeline.json);
multiepoch and fuse_label measured no win and their code paths were
DELETED — their artifacts remain as the recorded evidence.
"""

import json

import pytest

from mfcd_tpu.core import decisions


@pytest.fixture()
def decision_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(decisions, "DECISION_DIR", str(tmp_path))
    monkeypatch.setattr(decisions, "_cache", {})
    return tmp_path


def test_env_var_overrides_artifact(decision_dir, monkeypatch):
    (decision_dir / "pipeline.json").write_text(
        json.dumps({"enable": True}))
    monkeypatch.setenv("MFCD_PIPELINE", "0")
    assert decisions.flag_enabled("MFCD_PIPELINE", "pipeline") is False
    monkeypatch.setenv("MFCD_PIPELINE", "1")
    assert decisions.flag_enabled("MFCD_PIPELINE", "pipeline") is True


def test_artifact_used_when_env_unset(decision_dir, monkeypatch):
    monkeypatch.delenv("MFCD_PIPELINE", raising=False)
    (decision_dir / "pipeline.json").write_text(
        json.dumps({"enable": True, "evidence": {"speedup": 1.1}}))
    assert decisions.flag_enabled("MFCD_PIPELINE", "pipeline") is True
    decisions._cache.clear()
    (decision_dir / "pipeline.json").write_text(
        json.dumps({"enable": False}))
    assert decisions.flag_enabled("MFCD_PIPELINE", "pipeline") is False


def test_missing_or_malformed_artifact_falls_back(decision_dir, monkeypatch):
    monkeypatch.delenv("MFCD_PIPELINE", raising=False)
    assert decisions.flag_enabled("MFCD_PIPELINE", "pipeline") is False
    assert decisions.flag_enabled("MFCD_PIPELINE", "pipeline",
                                  default=True) is True
    decisions._cache.clear()
    (decision_dir / "pipeline.json").write_text("{not json")
    assert decisions.flag_enabled("MFCD_PIPELINE", "pipeline") is False
    decisions._cache.clear()
    (decision_dir / "pipeline.json").write_text(json.dumps({"enable": "yes"}))
    assert decisions.flag_enabled("MFCD_PIPELINE", "pipeline") is False


def test_record_decision_refused_on_cpu(decision_dir, monkeypatch):
    monkeypatch.setattr(decisions, "_backend", lambda: "cpu")
    assert decisions.record_decision("pipeline", True, {"x": 1}) is None
    assert not (decision_dir / "pipeline.json").exists()


def test_record_decision_persists_with_provenance(decision_dir, monkeypatch):
    monkeypatch.setattr(decisions, "_backend", lambda: "tpu")
    path = decisions.record_decision(
        "some_feature", False, {"speedup": 1.01, "rule": "r"})
    rec = json.load(open(path))
    assert rec["enable"] is False
    assert rec["evidence"]["speedup"] == 1.01
    assert rec["platform"] == "tpu"
    assert "recorded_at_utc" in rec and "commit" in rec
    # The freshly recorded decision is visible without a cache clear.
    monkeypatch.delenv("MFCD_SOME_FEATURE", raising=False)
    assert decisions.flag_enabled("MFCD_SOME_FEATURE", "some_feature",
                                  default=True) is False


def test_gates_resolve_through_decisions(decision_dir, monkeypatch):
    """The surviving production gate (pipeline) actually consults the
    module, in both directions."""
    monkeypatch.setattr(decisions, "_backend", lambda: "tpu")
    monkeypatch.delenv("MFCD_PIPELINE", raising=False)
    decisions.record_decision("pipeline", True, {})
    from mfcd_tpu.sweep.batched import pipeline_enabled

    assert pipeline_enabled() is True
    decisions._cache.clear()
    (decision_dir / "pipeline.json").write_text(
        json.dumps({"enable": False}))
    assert pipeline_enabled() is False
