from mfcd_tpu.parallel.mesh import (  # noqa: F401
    factor_mesh,
    make_mesh,
    make_sharded_train_step,
    replicate_opt_state_for_grid,
)
