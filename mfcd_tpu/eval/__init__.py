from mfcd_tpu.eval.metrics import (  # noqa: F401
    compute_alignment_metrics,
    compute_all_metrics,
    compute_reconstruction_error,
    evaluate_split,
    ground_truth_metrics,
)
