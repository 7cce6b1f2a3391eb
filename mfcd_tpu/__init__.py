"""mfcd_tpu — TPU-native matrix factorization with comparison data.

A brand-new JAX/XLA/Pallas framework with the capabilities of the Indy-Lab
``Matrix-Factorization-With-Comparison-Data`` research codebase (reference at
``structure.py`` / ``generation_data.py`` / ``visualization.py``), re-designed
TPU-first:

- ground-truth matrix generators as pure ``(key, ...) -> X`` functions
  (reference: ``generation_data.py:341-715``),
- fixed-shape jittable triplet samplers with sort-based dedup
  (reference: ``generation_data.py:11-338``),
- BTL labeling / masked splits entirely on device
  (reference: ``structure.py:465-742``),
- a ``lax.scan`` training loop with torch-Adam-compatible optax updates and
  Pallas gather/scatter-add embedding kernels
  (reference: ``structure.py:746-878``),
- a fused on-device evaluation block producing the 22-key results schema
  (reference: ``structure.py:881-1127, 420-444``),
- a sweep engine with grid/linear expansion, incremental pickle persistence,
  vmap-over-reps and mesh-sharded execution
  (reference: ``structure.py:81-255``),
- a host-side visualization suite consuming the same results schema
  (reference: ``visualization.py``).
"""

__version__ = "0.1.0"

from mfcd_tpu import cache  # noqa: F401  (enables the persistent XLA cache)
from mfcd_tpu.core.config import RunConfig, SweepSpec  # noqa: F401
from mfcd_tpu.sweep.engine import parameter_scan, run_experiment  # noqa: F401
from mfcd_tpu.sweep.ground_truth import (  # noqa: F401
    evaluate_ground_truth,
    parameter_scan_ground_truth,
)
