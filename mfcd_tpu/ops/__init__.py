from mfcd_tpu.ops.losses import (  # noqa: F401
    bce_with_logits,
    masked_batch_mean,
)
from mfcd_tpu.ops.optim import AdamState, adam_init, adam_update  # noqa: F401
