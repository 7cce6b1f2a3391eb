"""End-to-end stage timing of run_bucket at the bench config.

Times each jitted engine stage (sample / label / pad / train / metrics /
host export) separately with a forced host sync between stages, at the
exact bench configuration (2 configs x 4 reps, n=m=1000, d=2, p=0.2, K=1).
Run standalone (single TPU process).
"""

from __future__ import annotations

import sys
import time

import numpy as np

import mfcd_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from mfcd_tpu.core.config import RunConfig
from mfcd_tpu.core import rng
from mfcd_tpu.sweep import engine as E


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    for l in jax.tree_util.tree_leaves(x):
        if hasattr(l, "addressable_data") and getattr(l, "size", 0):
            jax.device_get(l.ravel()[:1])
            return x  # one round-trip: device work is serialized anyway
    return x


def main():
    cfg = RunConfig(
        n=1000, m=1000, d=2, p=0.2, s=5.0, lr=1e-3, weight_decay=5e-6,
        num_epochs=30, reps=4, K=1, strategy="random", generation="base",
    )
    n_configs = 2
    s = np.asarray([5.0, 6.0], np.float32)
    lr = np.full(n_configs, 1e-3, np.float32)
    wd = np.full(n_configs, 5e-6, np.float32)
    seed = 321

    sh = cfg.shapes()
    caps = E.compile_caps(cfg)
    t_cap, extra_cap = caps
    budgets = np.full((n_configs,), sh.num_triplets, np.int32)
    extra_budgets = np.full((n_configs,), sh.extra_test_triplets, np.int32)
    if (np.all(budgets == t_cap) and np.all(extra_budgets == extra_cap)):
        budgets = extra_budgets = None

    cfg_keys = jax.vmap(
        lambda i: rng.config_key(jax.random.key(seed), i)
    )(jnp.arange(n_configs))
    rep_keys2d = jax.vmap(lambda ck: rng.rep_keys(ck, cfg.reps))(cfg_keys)

    sk = E.SampleStatics(
        n=cfg.n, m=cfg.m, d=cfg.d, t_cap=t_cap, extra_cap=extra_cap,
        strategy=cfg.strategy, popularity_method=cfg.popularity_method,
        alpha=cfg.alpha, generation=cfg.generation,
    )
    log(f"device: {jax.devices()[0]}; caps={caps}")

    def stage(name, fn, iters=3):
        out = sync(fn())  # compile + warm
        ts = []
        for _ in range(iters):
            t0 = time.time()
            sync(fn())
            ts.append(time.time() - t0)
        log(f"{name:10s} {min(ts)*1000:8.1f} ms/bucket "
            f"({min(ts)*1000/(n_configs*cfg.reps):6.1f} ms/run)")
        return out

    x = params = splits = streams = None
    out1 = stage("sample", lambda: E._sample_bucket(
        sk, rep_keys2d, budgets, extra_budgets))
    x, params, splits, streams = out1
    out2 = stage("label", lambda: E._label_bucket(
        x, splits, streams, jnp.asarray(s), K=cfg.K,
        soft_label=cfg.soft_label))
    train, val, test = out2
    train_p = E._pad_rows(train, E._next_pow2(train.u.shape[-1]))
    val_p = E._pad_rows(val, E._next_pow2(val.u.shape[-1]))
    test_p = E._pad_rows(test, E._next_pow2(test.u.shape[-1]))

    out3 = stage("train", lambda: E._train_bucket_pallas(
        params, train_p, val_p, streams["epochs"], jnp.asarray(lr),
        jnp.asarray(wd), batch_size=cfg.batch_size,
        num_epochs=cfg.num_epochs, label_denom=1))
    params_t, tl, vl = out3

    out4 = stage("metrics", lambda: E._metrics_bucket(
        params_t, x, jnp.asarray(s), test_p, streams["sample_rows"],
        splits.sample.count, tl, vl, batch_size=cfg.batch_size))

    t0 = time.time()
    host = jax.device_get(out4)
    log(f"{'export':10s} {(time.time()-t0)*1000:8.1f} ms/bucket")
    log(f"keys: {sorted(host.keys())[:5]}...")


if __name__ == "__main__":
    main()
