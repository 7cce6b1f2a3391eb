"""Measurement-driven feature decisions (committed autotuning records).

Each gated optimization in this framework ships with a device
validation / A/B script (currently ``scripts/profile_pipeline_ab.py``;
the multiepoch and fuse_label scripts were removed with their code
paths after their round-4 on-device measurements rejected them — the
artifacts under ``docs/decisions/`` remain as the recorded evidence).
Historically those scripts only *printed* their verdicts, leaving the
runtime defaults frozen at "off" until a human read the logs and edited
code — which stalls whenever measurements land while no builder session
is active (e.g. an unattended tunnel-recovery backlog).

This module closes that loop mechanically, the same way an XLA
autotuning cache does but at feature granularity: the device script
writes a small JSON *decision artifact* under ``docs/decisions/`` (with
the measurement, commit, platform, and timestamp as provenance), the
artifact is committed with the repo, and runtime defaults read it.

Precedence, most specific wins:

1. an explicit env var (``MFCD_PIPELINE=1`` / ``=0``) — user override;
2. a committed decision artifact (``docs/decisions/<name>.json``);
3. the conservative built-in default (off).

Decisions are only recorded from real-device runs: a CPU measurement
must never flip a production default (mirrors ``bench.py``'s last-good
persistence rule).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
DECISION_DIR = os.path.join(_REPO, "docs", "decisions")

_cache: Dict[str, Optional[dict]] = {}


def decision_path(name: str) -> str:
    return os.path.join(DECISION_DIR, f"{name}.json")


def load_decision(name: str) -> Optional[dict]:
    """The decision record for ``name``, or None (missing/malformed).

    Cached per process: artifacts change only via the device scripts,
    which run in their own interpreter, and the flag gates sit close to
    hot per-bucket paths.
    """
    if name not in _cache:
        try:
            with open(decision_path(name)) as f:
                rec = json.load(f)
            _cache[name] = rec if isinstance(rec.get("enable"), bool) \
                else None
        except (OSError, ValueError, AttributeError):
            _cache[name] = None
    return _cache[name]


def flag_enabled(env_var: str, decision_name: str,
                 default: bool = False) -> bool:
    """Resolve a gated-feature flag: env var > decision artifact > default."""
    v = os.environ.get(env_var)
    if v is not None and v != "":
        return v != "0"
    rec = load_decision(decision_name)
    if rec is not None:
        return rec["enable"]
    return default


def _backend() -> str:
    import jax

    return jax.default_backend()


def record_decision(name: str, enable: bool,
                    evidence: Dict[str, Any]) -> Optional[str]:
    """Persist a device-measured decision; returns the path, or None if
    refused (CPU backend — a CPU measurement must not flip production
    defaults)."""
    backend = _backend()
    if backend == "cpu":
        return None
    import datetime
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, timeout=10, cwd=_REPO).stdout.strip() or "unknown"
    except Exception:  # noqa: BLE001 — provenance stamp is best-effort
        commit = "unknown"
    rec = {
        "enable": bool(enable),
        "evidence": evidence,
        "platform": backend,
        "commit": commit,
        "recorded_at_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
    }
    os.makedirs(DECISION_DIR, exist_ok=True)
    path = decision_path(name)
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    _cache[name] = rec
    return path
