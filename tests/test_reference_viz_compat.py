"""Cross-consumer schema proof: the REFERENCE's own visualization layer
consumes framework-produced pickles unchanged.

PARITY.md / MIGRATION.md claim the results schema is byte-compatible —
"existing pickles and plotting habits keep working".  The viz suite
proves our plots accept reference-shaped results; this test proves the
converse direction on the reference's actual code
(`/root/reference/visualization.py::plot_metrics_vs_param` /
`get_best_params`, the two consumer entry points of `Plots.ipynb`).

Environment shims (the reference assumes a notebook kernel):
- plotly is not installed here (only `generate_preference_data_plotly`
  uses it) — stubbed at import;
- the reference enables LaTeX text rendering globally at import
  (`visualization.py` rcParams) and latex is not installed — disabled
  post-import (the framework made that opt-in for exactly this reason,
  `mfcd_tpu/viz/plots.py::enable_latex`).
"""

import os
import sys
import types

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mirror not mounted"
)


@pytest.fixture(scope="module")
def ref_viz():
    for name in ("plotly", "plotly.express", "plotly.graph_objects",
                 "plotly.io"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.path.insert(0, REF)
    try:
        import visualization  # noqa: F401
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference viz import failed: {e}")
    finally:
        sys.path.remove(REF)
    import matplotlib

    matplotlib.rcParams["text.usetex"] = False
    return visualization


@pytest.fixture(scope="module")
def our_pickle(tmp_path_factory):
    import pickle

    import mfcd_tpu

    path = tmp_path_factory.mktemp("refviz") / "scan.pkl"
    # The warmed compile bucket (see .claude/skills/verify): same shapes
    # as the engine tests, so this costs one cached-program run.
    mfcd_tpu.parameter_scan(
        n=50, m=60, d=3, p=0.3, s=[2.0, 5.0], num_epochs=3, reps=2,
        save_path=str(path), save_every=1)
    return pickle.load(open(path, "rb"))


def test_reference_plot_metrics_vs_param_accepts_our_results(
        ref_viz, our_pickle):
    import matplotlib.pyplot as plt

    ref_viz.plot_metrics_vs_param(
        our_pickle, "s", ["accuracy", "gt_accuracy"], show_plot=False)
    assert plt.get_fignums(), "reference plotting produced no figure"
    plt.close("all")


def test_reference_get_best_params_ranks_our_results(ref_viz, our_pickle):
    best = ref_viz.get_best_params(our_pickle, "accuracy")
    # The reference returns (params_dict, best_value) and the params must
    # be one of our swept configurations, all 16 keys present.
    params, index = best  # the reference returns (params_dict, list_index)
    assert params["s"] in (2.0, 5.0)
    assert {"n", "m", "d", "p", "strategy", "generation"} <= set(params)
    means = [
        float(sum(r["results"]["accuracy"]) / len(r["results"]["accuracy"]))
        for r in our_pickle
    ]
    assert index == means.index(max(means))
    assert params["s"] == our_pickle[index]["params"]["s"]
