from mfcd_tpu.models.mf import (  # noqa: F401
    MFParams,
    forward_logits,
    forward_prob,
    init_params,
)
