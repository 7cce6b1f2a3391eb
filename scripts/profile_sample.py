"""Decompose the sample stage at the bench config (8 runs, n=m=1000).

Times generate_x / sample_triplets / split_triplets / init_params / the
full _sample_bucket, each as its own jit vmapped over the 8 rep keys,
with a forced host transfer per timing (block_until_ready is a no-op on
the axon backend).  Run standalone (single TPU process).
"""

from __future__ import annotations

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import mfcd_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from mfcd_tpu.core import rng
from mfcd_tpu.core.config import RunConfig
from mfcd_tpu.data.btl import sample_and_split
from mfcd_tpu.sampling import split_triplets
from mfcd_tpu.genx import generate_x
from mfcd_tpu.models.mf import init_params
from mfcd_tpu.sampling import sample_triplets
from mfcd_tpu.sweep import engine as E


def log(*a):
    print(*a, file=sys.stderr, flush=True)


R = 8
N = M = 1000
D = 2
T_CAP = 131072


def force(x):
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "ravel") and getattr(l, "size", 0)]
    np.asarray(jax.device_get(leaves[0].ravel()[:1]))


def bench(name, fn, *args):
    jfn = jax.jit(fn)
    force(jfn(*args))
    ts = []
    for _ in range(4):
        t0 = time.time()
        force(jfn(*args))
        ts.append(time.time() - t0)
    ms = min(ts) * 1000
    log(f"{name:26s} {ms:8.1f} ms/bucket  {ms / R:6.2f} ms/run")


def main():
    log(f"device: {jax.devices()[0]}")
    keys = jax.random.split(jax.random.key(0), R)
    rep_streams = jax.vmap(rng.rep_streams)(keys)

    # generate_x alone
    bench("generate_x(base)", jax.vmap(
        lambda st: generate_x(st["x_gen"], N, M, D, "base")), rep_streams)

    xs = jax.jit(jax.vmap(
        lambda st: generate_x(st["x_gen"], N, M, D, "base")))(rep_streams)

    # sampler alone (random strategy, static budget)
    bench("sample_triplets(random)", jax.vmap(
        lambda st, x: sample_triplets(
            st["sampling"], x, T_CAP, strategy="random")),
        rep_streams, xs)

    samples = jax.jit(jax.vmap(
        lambda st, x: sample_triplets(
            st["sampling"], x, T_CAP, strategy="random")))(rep_streams, xs)

    # split alone
    perm = jnp.asarray(rng.split_permutation(T_CAP))
    from mfcd_tpu.core.config import TRAIN_RATIO, VAL_RATIO
    train_cap = int(TRAIN_RATIO * T_CAP)
    val_cap = int(VAL_RATIO * T_CAP)
    bench("split_triplets", jax.vmap(
        lambda s: split_triplets(s, perm, train_cap=train_cap,
                                 val_cap=val_cap,
                                 test_cap=T_CAP - train_cap - val_cap)),
        samples)

    # init alone
    bench("init_params", jax.vmap(
        lambda st: init_params(st["init"], N, M, D)), rep_streams)

    # full sample_and_split
    bench("sample_and_split", jax.vmap(
        lambda st, x: sample_and_split(
            st, x, t_cap=T_CAP, extra_cap=0, strategy="random",
            popularity_method="zipf", alpha=1.5)),
        rep_streams, xs)

    # sampler internals: propose / winner selection / fused split
    from mfcd_tpu.sampling import first_occurrence_winners, propose_candidates
    from mfcd_tpu.sampling.dedup import winners_to_splits

    bench("propose_candidates", jax.vmap(
        lambda st, x: propose_candidates(
            st["sampling"], x, T_CAP, strategy="random",
            popularity_method="zipf", alpha=1.5)), rep_streams, xs)
    cands, cvalid = jax.jit(jax.vmap(
        lambda st, x: propose_candidates(
            st["sampling"], x, T_CAP, strategy="random",
            popularity_method="zipf", alpha=1.5)))(rep_streams, xs)
    bench("first_occurrence_winners", jax.vmap(
        lambda c, v: first_occurrence_winners(c, v, nm_shape=(N, M))),
        cands, cvalid)
    win = jax.jit(jax.vmap(
        lambda c, v: first_occurrence_winners(c, v, nm_shape=(N, M))))(
        cands, cvalid)
    bench("winners_to_splits", jax.vmap(
        lambda c, w: winners_to_splits(
            c, w, T_CAP, train_cap, val_cap, T_CAP - train_cap - val_cap,
            key=rng.split_key())), cands, win)

    # the real bucket (2 configs x 4 reps)
    cfg = RunConfig(n=N, m=M, d=D, p=0.2, s=5.0, lr=1e-3,
                    weight_decay=5e-6, num_epochs=30, reps=4, K=1)
    sk = E.SampleStatics(n=N, m=M, d=D, t_cap=T_CAP, extra_cap=0,
                         strategy="random", popularity_method="zipf",
                         alpha=1.5, generation="base")
    rep_keys2d = jax.random.split(jax.random.key(1), (2, 4))
    bench("_sample_bucket(static)",
          partial(E._sample_bucket, sk), rep_keys2d)


if __name__ == "__main__":
    main()
