from mfcd_tpu.utils.io import (  # noqa: F401
    append_results,
    load_results,
    reset_save_path,
)
