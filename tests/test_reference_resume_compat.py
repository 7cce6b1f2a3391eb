"""Migration resume: the framework continues a REFERENCE-produced pickle.

A reference user's half-finished sweep (``structure.py::parameter_scan``
with ``save_path``) can be handed to ``mfcd_tpu.parameter_scan(...,
resume=True)`` unchanged: completed configs are recognized from the
reference's own params dicts (``utils/io.py::completed_param_sets``),
only the missing ones run, and the merged pickle stays schema-valid —
the practical payoff of byte-compatible persistence
(reference ``structure.py:160-171`` delete-then-append protocol).
"""

import os
import pickle
import sys

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mirror not mounted"
)


def test_framework_resumes_reference_pickle(tmp_path):
    torch = pytest.importorskip("torch")  # noqa: F841 — reference needs it
    sys.path.insert(0, REF)
    try:
        import structure
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REF)

    path = str(tmp_path / "sweep.pkl")
    # The reference runs HALF the sweep (s=2.0) and persists its pickle.
    structure.parameter_scan(n=50, m=60, d=3, p=0.3, s=[2.0], num_epochs=3,
                             reps=2, device="cpu",
                             save_path=path, save_every=1)
    ref_entries = pickle.load(open(path, "rb"))
    assert len(ref_entries) == 1

    import mfcd_tpu
    from mfcd_tpu.core.results import validate_schema

    mfcd_tpu.parameter_scan(n=50, m=60, d=3, p=0.3, s=[2.0, 5.0],
                            num_epochs=3, reps=2,
                            save_path=path, save_every=1, resume=True)
    merged = pickle.load(open(path, "rb"))
    assert [e["params"]["s"] for e in merged] == [2.0, 5.0]
    # The reference's own entry was left in place (resume did not re-run
    # or rewrite it) and both entries satisfy the shared schema.
    ref_accs = ref_entries[0]["results"]["accuracy"]
    assert merged[0]["results"]["accuracy"] == ref_accs
    assert all(not validate_schema(e["results"]) for e in merged)
