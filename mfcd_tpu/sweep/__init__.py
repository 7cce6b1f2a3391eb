from mfcd_tpu.sweep.batched import parameter_scan_fast, run_bucket  # noqa: F401
from mfcd_tpu.sweep.engine import parameter_scan, run_experiment  # noqa: F401
from mfcd_tpu.sweep.ground_truth import (  # noqa: F401
    evaluate_ground_truth,
    parameter_scan_ground_truth,
)
