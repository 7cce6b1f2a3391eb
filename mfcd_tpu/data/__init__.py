from mfcd_tpu.data.btl import (  # noqa: F401
    LabeledSplit,
    btl_label,
    build_dataset,
)
