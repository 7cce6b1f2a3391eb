"""Persistent-cache hygiene: poisoned-cache detection and self-healing.

Round-2 incident (NOTES_ROUND2): after a TPU worker restart, cached
executables serialized by the old worker fail to *load* with a bare
FAILED_PRECONDITION at the first dispatch while fresh compiles work.
``mfcd_tpu.cache.ensure_cache_healthy`` automates the differential
diagnosis + purge that was previously a manual ``rm -rf .jax_cache``.
"""

import os

import pytest

from mfcd_tpu.cache import _purge, ensure_cache_healthy


class FakeFP(Exception):
    def __str__(self):
        return "FAILED_PRECONDITION: TPU backend error"


def test_healthy_cache_returns_true(tmp_path):
    assert ensure_cache_healthy(str(tmp_path)) is True


def test_purge_removes_only_cache_entries(tmp_path):
    (tmp_path / "jit__f-abc-cache").write_bytes(b"x")
    (tmp_path / "jit__g-def-cache").write_bytes(b"x")
    (tmp_path / "notes.txt").write_text("keep me")
    assert _purge(str(tmp_path)) == 2
    assert sorted(os.listdir(tmp_path)) == ["notes.txt"]


def test_poisoned_cache_is_purged_and_retried(tmp_path, capsys):
    (tmp_path / "jit__f-abc-cache").write_bytes(b"x")
    calls = {"canary": 0, "fresh": 0}

    def canary():
        calls["canary"] += 1
        if calls["canary"] == 1:
            raise FakeFP()

    def fresh_probe():
        calls["fresh"] += 1

    ok = ensure_cache_healthy(
        str(tmp_path), _canary=canary, _fresh_probe=fresh_probe)
    assert ok is False
    assert calls == {"canary": 2, "fresh": 1}
    assert os.listdir(tmp_path) == []  # entry purged
    assert "poisoned persistent compile cache" in capsys.readouterr().err


def test_backend_down_reraises_without_purging(tmp_path):
    (tmp_path / "jit__f-abc-cache").write_bytes(b"x")

    def canary():
        raise FakeFP()

    def fresh_probe():
        raise FakeFP()  # fresh compile fails too -> backend down

    with pytest.raises(FakeFP):
        ensure_cache_healthy(
            str(tmp_path), _canary=canary, _fresh_probe=fresh_probe)
    assert os.listdir(tmp_path) == ["jit__f-abc-cache"]  # untouched


def test_non_precondition_errors_propagate(tmp_path):
    def canary():
        raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")

    with pytest.raises(RuntimeError):
        ensure_cache_healthy(str(tmp_path), _canary=canary)
