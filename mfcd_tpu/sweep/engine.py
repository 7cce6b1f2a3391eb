"""Experiment engine — ``run_experiment`` / ``parameter_scan``.

Capability match for the reference engine (``structure.py:81-450``), with the
execution model inverted for TPUs: instead of a sequential Python loop over
repetitions of eager per-batch steps, each configuration compiles to ONE XLA
program (generate X -> sample -> label -> train -> all 22 metrics) that is
``vmap``-ed over repetitions.  Hyperparameters that don't change array shapes
(s, lr, weight_decay) are *traced*, so an entire s x wd sweep reuses a single
compiled executable; only shape-changing parameters (n, m, d, p, K, epochs,
strategy, ...) trigger recompilation, once per shape bucket.

The ``{'params', 'results'}`` schema, grid/linear expansion, and incremental
pickle persistence follow the reference exactly (``structure.py:120-255``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from mfcd_tpu.core import rng
from mfcd_tpu.core.config import RunConfig, SweepSpec
from mfcd_tpu.core.results import export_results
from mfcd_tpu.data.btl import build_dataset
from mfcd_tpu.eval.metrics import compute_all_metrics
from mfcd_tpu.genx import generate_x
from mfcd_tpu.models.mf import init_params
from mfcd_tpu.train.trainer import train_model
from mfcd_tpu.utils.io import append_results, reset_save_path

DEFAULT_SEED = 0


def _shape_only(cfg: RunConfig) -> RunConfig:
    """Strip traced hyperparameters so jit caching keys only on shapes."""
    return dataclasses.replace(cfg, s=0.0, lr=0.0, weight_decay=0.0)


def _single_rep(rep_key, s, lr, weight_decay, cfg: RunConfig) -> Dict:
    """One repetition, fully on device (reference ``structure.py:348-417``)."""
    streams = rng.rep_streams(rep_key)
    x = generate_x(streams["x_gen"], cfg.n, cfg.m, cfg.d, cfg.generation)
    ds = build_dataset(streams, x, cfg, s=s)
    params = init_params(streams["init"], cfg.n, cfg.m, cfg.d)
    params, train_losses, val_losses = train_model(
        params, ds.train, ds.val, streams["epochs"], lr, weight_decay,
        batch_size=cfg.batch_size, num_epochs=cfg.num_epochs,
    )
    metrics = compute_all_metrics(
        params, x, s, ds.test, streams["sample_rows"],
        batch_size=cfg.batch_size,
    )
    metrics["train_losses"] = train_losses
    metrics["val_losses"] = val_losses
    metrics["sample_count"] = ds.sample.count  # shortfall diagnostic
    return metrics


@partial(jax.jit, static_argnames=("cfg",))
def _run_config(cfg: RunConfig, cfg_key, s, lr, weight_decay) -> Dict:
    """All repetitions of one configuration as a single vmapped program."""
    keys = rng.rep_keys(cfg_key, cfg.reps)
    return jax.vmap(
        lambda k: _single_rep(k, s, lr, weight_decay, cfg)
    )(keys)


def run_config(cfg: RunConfig, seed: int = DEFAULT_SEED,
               config_index: int = 0) -> Dict[str, Any]:
    """Run one RunConfig; returns the reference 22-key results dict."""
    cfg_key = rng.config_key(jax.random.key(seed), config_index)
    device_out = _run_config(
        _shape_only(cfg), cfg_key,
        np.float32(cfg.s), np.float32(cfg.lr), np.float32(cfg.weight_decay),
    )
    counts = np.asarray(device_out.pop("sample_count"))
    target = cfg.num_triplets
    for rep, c in enumerate(counts):
        if int(c) < target:
            print(
                f"⚠️ Only {int(c)} triplets generated for strategy: "
                f"{cfg.strategy} (target={target})"
            )
    return export_results(device_out)


def run_experiment(
    n, m, d, p, s, device=None, lr=1e-3, weight_decay=1e-5, reps=5,
    num_epochs=100, open_browser=False, K=1, d1=None, strategy="random",
    popularity_method="zipf", alpha=1.5, soft_label=False, generation="base",
    seed: int = DEFAULT_SEED, batch_size: int = 64, config_index: int = 0,
) -> Dict[str, Any]:
    """Signature-compatible entry point (reference ``structure.py:306``).

    ``device`` and ``open_browser`` are accepted for drop-in compatibility
    and ignored (placement is JAX's job; TensorBoard was dead code in the
    reference, ``structure.py:831-834``).
    """
    cfg = RunConfig(
        n=int(n), m=int(m), d=int(d), p=float(p), s=float(s), lr=float(lr),
        weight_decay=float(weight_decay), num_epochs=int(num_epochs),
        reps=int(reps), K=int(K), d1=d1, strategy=strategy,
        popularity_method=popularity_method, alpha=float(alpha),
        soft_label=bool(soft_label), generation=generation,
        batch_size=int(batch_size),
    )
    return run_config(cfg, seed=seed, config_index=config_index)


def parameter_scan(
    n=1000, m=1000, d=2, p=0.5, s=1.0, device=None,
    lr=1e-3, weight_decay=1e-5, num_epochs=30, reps=1, strategy="random",
    open_browser=False, linear=False, K=1, d1=None,
    save_path: Optional[str] = None, save_every: Optional[int] = None,
    popularity_method="zipf", alpha=1.5, soft_label=False, generation="base",
    seed: int = DEFAULT_SEED, batch_size: int = 64,
) -> List[Dict[str, Any]]:
    """Grid / linear hyperparameter scan (reference ``structure.py:81-255``).

    Every parameter may be a scalar or a list; ``linear=True`` zips
    equal-length lists instead of taking the Cartesian product.  Results are
    ``[{'params': ..., 'results': ...}]`` and are incrementally pickled every
    ``save_every`` experiments; a pre-existing ``save_path`` is removed at
    scan start, and (reference quirk preserved) the returned list is empty
    when everything was flushed to disk.
    """
    spec = SweepSpec(
        params={
            "n": n, "m": m, "d": d, "p": p, "lr": lr,
            "weight_decay": weight_decay, "num_epochs": num_epochs,
            "reps": reps, "s": s, "K": K, "d1": d1, "strategy": strategy,
            "popularity_method": popularity_method, "alpha": alpha,
            "soft_label": soft_label, "generation": generation,
        },
        linear=linear,
        batch_size=batch_size,
    )
    if linear and not spec.linear_possible():
        raise ValueError(
            "The linear scan is not possible because the parameters are "
            "not synchronized."
        )

    if save_path:
        reset_save_path(save_path)

    all_results: List[Dict[str, Any]] = []
    for experiment_index, param_set in enumerate(spec.expand()):
        print(f"\nRunning experiment with parameters: {param_set}")
        cfg = RunConfig(batch_size=batch_size, **param_set)
        results = run_config(cfg, seed=seed, config_index=experiment_index)
        all_results.append({"params": param_set, "results": results})

        if save_path and save_every and len(all_results) >= save_every:
            append_results(save_path, all_results)
            all_results = []

    if save_path and all_results:
        append_results(save_path, all_results)
        all_results = []

    return all_results
