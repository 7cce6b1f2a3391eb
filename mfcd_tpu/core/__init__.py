from mfcd_tpu.core.config import RunConfig, SweepSpec, ShapeInfo  # noqa: F401
from mfcd_tpu.core import rng  # noqa: F401
