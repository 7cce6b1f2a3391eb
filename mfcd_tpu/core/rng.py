"""RNG discipline.

The reference mixes a fixed split seed (42, reference ``structure.py:710-713``)
with otherwise-global torch/numpy RNG state, so repetitions differ only through
global state mutation.  Here every random choice flows from an explicit
``jax.random`` key:

    base key --fold(config idx)--> config key --fold(rep)--> rep key
    rep key --split--> {x_gen, sampling, labels(train/val/test/extra),
                        init, epochs, sample_rows}

The *split permutation* uses its own constant-seed key, mirroring the
reference's deterministic seed-42 split: for a given triplet count the
train/val/test assignment is identical across reps and configs.
"""

from __future__ import annotations

import jax

# Deterministic split seed (reference ``structure.py:712``).
SPLIT_SEED = 42


def split_key() -> jax.Array:
    return jax.random.key(SPLIT_SEED)


def split_permutation(t: int):
    """Deterministic seed-42 permutation of [0, t), computed on host.

    Mirrors the reference's fixed-generator ``random_split``
    (``structure.py:710-713``): identical across reps and configs for a
    given triplet count.  Computed with numpy at trace time so no device
    sort is compiled (TPU sorts at this size cost minutes of compile).
    """
    import numpy as np

    return np.random.default_rng(SPLIT_SEED).permutation(t).astype(np.int32)


# Named streams drawn from one rep key.  Order is part of the protocol:
# changing it changes every downstream draw.
STREAMS = (
    "x_gen",          # ground-truth matrix generation
    "sampling",       # triplet sampler proposals
    "extra_sampling", # test-set top-up sampler
    "labels_train",
    "labels_val",
    "labels_test",
    "init",           # model parameter init
    "epochs",         # per-epoch shuffles (folded further by epoch index)
    "sample_rows",    # the 2 inspection rows (reference structure.py:388-392)
)


def rep_streams(rep_key: jax.Array) -> dict:
    keys = jax.random.split(rep_key, len(STREAMS))
    return dict(zip(STREAMS, keys))


def config_key(base_key: jax.Array, config_index: int) -> jax.Array:
    return jax.random.fold_in(base_key, config_index)


def rep_key(cfg_key: jax.Array, rep: int) -> jax.Array:
    return jax.random.fold_in(cfg_key, rep)


def rep_keys(cfg_key: jax.Array, reps: int) -> jax.Array:
    """Stacked keys for vmapping over repetitions."""
    return jax.vmap(lambda r: jax.random.fold_in(cfg_key, r))(
        jax.numpy.arange(reps)
    )
