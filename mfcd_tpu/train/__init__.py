from mfcd_tpu.train.trainer import train_model  # noqa: F401
