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
import jax.numpy as jnp
import numpy as np

from mfcd_tpu.core import rng
from mfcd_tpu.core.config import RunConfig, SweepSpec
from mfcd_tpu.core.results import export_results
from mfcd_tpu.data.btl import LabeledSplit, build_dataset
from mfcd_tpu.sampling.dedup import _next_pow2
from mfcd_tpu.eval.metrics import compute_all_metrics
from mfcd_tpu.genx import generate_x
from mfcd_tpu.models.mf import init_params
from mfcd_tpu.train.trainer import train_model
from mfcd_tpu.utils.io import append_results, reset_save_path

DEFAULT_SEED = 0


def _shape_only(cfg: RunConfig) -> RunConfig:
    """Strip traced hyperparameters so jit caching keys only on shapes."""
    return dataclasses.replace(cfg, s=0.0, lr=0.0, weight_decay=0.0)


def _build_rep(rep_key, s, cfg: RunConfig):
    """Per-rep data + init (reference ``structure.py:352-364``)."""
    streams = rng.rep_streams(rep_key)
    x = generate_x(streams["x_gen"], cfg.n, cfg.m, cfg.d, cfg.generation)
    ds = build_dataset(streams, x, cfg, s=s)
    params = init_params(streams["init"], cfg.n, cfg.m, cfg.d)
    return x, ds, params, streams


def _metrics_rep(params, x, s, ds, streams, cfg, train_losses, val_losses):
    metrics = compute_all_metrics(
        params, x, s, ds.test, streams["sample_rows"],
        batch_size=cfg.batch_size,
    )
    metrics["train_losses"] = train_losses
    metrics["val_losses"] = val_losses
    metrics["sample_count"] = ds.sample.count  # shortfall diagnostic
    return metrics


@partial(jax.jit, static_argnames=("cfg",))
def _build_bucket(cfg: RunConfig, rep_keys2d, s):
    """Stage 1: data + init for [B, R] runs.

    Compile key: the data-shaping fields of ``cfg`` (n, m, d, p, K,
    strategy, popularity_method, soft_label, generation, reps).
    """
    return jax.vmap(
        lambda krow, s_i: jax.vmap(lambda k: _build_rep(k, s_i, cfg))(krow)
    )(rep_keys2d, s)


@partial(jax.jit, static_argnames=("batch_size", "num_epochs"))
def _train_bucket_jnp(params, train, val, ekeys, lr, wd,
                      batch_size: int, num_epochs: int):
    """Stage 2 (jnp scan trainer): [B, R] runs.

    Compile key: only (row counts, n, m, d, batch_size, num_epochs) — the
    same executable serves every strategy and generation scheme.
    """
    def one_config(p_row, tr_row, va_row, ek_row, lr_i, wd_i):
        return jax.vmap(
            lambda p, tr, va, ek: train_model(
                p, tr, va, ek, lr_i, wd_i,
                batch_size=batch_size, num_epochs=num_epochs)
        )(p_row, tr_row, va_row, ek_row)

    return jax.vmap(one_config)(params, train, val, ekeys, lr, wd)


@partial(jax.jit, static_argnames=("batch_size", "num_epochs"))
def _train_bucket_pallas(params, train, val, ekeys, lr, wd,
                         batch_size: int, num_epochs: int):
    """Stage 2 (Pallas fused-epoch trainer): flatten [B, R] -> [B*R] runs."""
    from mfcd_tpu.train.pallas_trainer import train_runs_pallas

    b, r = lr.shape[0], params.U.shape[1]
    flat = lambda t: jax.tree.map(
        lambda a: a.reshape((b * r,) + a.shape[2:]), t)
    params_out, tl, vl = train_runs_pallas(
        flat(params), flat(train), flat(val), flat(ekeys),
        jnp.repeat(lr.astype(jnp.float32), r),
        jnp.repeat(wd.astype(jnp.float32), r),
        batch_size=batch_size, num_epochs=num_epochs,
    )
    unflat = lambda t: jax.tree.map(
        lambda a: a.reshape((b, r) + a.shape[1:]), t)
    return unflat(params_out), tl.reshape(b, r, -1), vl.reshape(b, r, -1)


@partial(jax.jit, static_argnames=("batch_size",))
def _metrics_bucket(params, x, s, test, rows_keys, sample_counts,
                    tl, vl, batch_size: int):
    """Stage 3: the fused metric block for [B, R] runs.

    Compile key: (n, m, d, test rows, batch_size) — shared across
    strategies and generation schemes.
    """
    def one_config(p_row, x_row, s_i, te_row, rk_row, sc_row, tl_row, vl_row):
        def one_rep(p, xx, te, rk, sc, t_, v_):
            metrics = compute_all_metrics(p, xx, s_i, te, rk,
                                          batch_size=batch_size)
            metrics["train_losses"] = t_
            metrics["val_losses"] = v_
            metrics["sample_count"] = sc
            return metrics

        return jax.vmap(one_rep)(
            p_row, x_row, te_row, rk_row, sc_row, tl_row, vl_row)

    return jax.vmap(one_config)(
        params, x, s, test, rows_keys, sample_counts, tl, vl)


@partial(jax.jit, static_argnames=("rows",))
def _pad_rows(split: LabeledSplit, rows: int) -> LabeledSplit:
    """Pad a split's row axis (last dim) to ``rows``; counts unchanged.

    Rows are padded to powers of two at stage boundaries so one trainer /
    metrics executable serves every sparsity value in a sweep; the dynamic
    batch trip counts make padding free at runtime.
    """
    pad = rows - split.u.shape[-1]
    if pad == 0:
        return split
    grow = lambda a, fill: jnp.pad(
        a, [(0, 0)] * (a.ndim - 1) + [(0, pad)], constant_values=fill)
    return LabeledSplit(
        u=grow(split.u, 0), i=grow(split.i, 0), j=grow(split.j, 0),
        z=grow(split.z, 0.0), valid=grow(split.valid, False),
        count=split.count,
    )


def _run_bucket_device(cfg: RunConfig, cfg_keys, s, lr, weight_decay,
                       use_pallas: bool = False) -> Dict:
    """[B] configs x [reps] repetitions via three jitted stages.

    The stages are jitted separately so the persistent compile cache is
    compositional: training and metrics executables are keyed only on
    (power-of-two-padded) shapes and are reused across every strategy /
    generation / sparsity sweep; only the data-build stage recompiles per
    (strategy, triplet budget).  Intermediates stay on device (shardings
    propagate between stages).
    """
    r = cfg.reps
    rep_keys2d = jax.vmap(lambda ck: rng.rep_keys(ck, r))(cfg_keys)

    x, ds, params, streams = _build_bucket(_shape_only(cfg), rep_keys2d, s)

    train = _pad_rows(ds.train, _next_pow2(ds.train.u.shape[-1]))
    val = _pad_rows(ds.val, _next_pow2(ds.val.u.shape[-1]))
    test = _pad_rows(ds.test, _next_pow2(ds.test.u.shape[-1]))

    train_fn = _train_bucket_pallas if use_pallas else _train_bucket_jnp
    params, tl, vl = train_fn(
        params, train, val, streams["epochs"], lr, weight_decay,
        batch_size=cfg.batch_size, num_epochs=cfg.num_epochs,
    )

    return _metrics_bucket(
        params, x, s, test, streams["sample_rows"], ds.sample.count,
        tl, vl, batch_size=cfg.batch_size,
    )


def default_use_pallas(cfg: RunConfig, platform: Optional[str] = None) -> bool:
    """Pallas fused-epoch trainer on TPU-like backends when state fits VMEM.

    ``platform`` should be the platform of the devices the program will
    actually run on (e.g. the mesh's devices) — the Pallas kernel only
    compiles for TPU backends.
    """
    import os

    from mfcd_tpu.ops.kernels import pallas_epoch_supported

    env = os.environ.get("MFCD_PALLAS")
    if env == "0":
        return False
    shapes = cfg.shapes()
    supported = pallas_epoch_supported(
        cfg.n, cfg.m, cfg.d, shapes.train_batches, cfg.batch_size
    )
    if env == "1":
        return supported
    if platform is None:
        platform = jax.devices()[0].platform
    return supported and platform != "cpu"


def run_config(cfg: RunConfig, seed: int = DEFAULT_SEED,
               config_index: int = 0,
               use_pallas: Optional[bool] = None) -> Dict[str, Any]:
    """Run one RunConfig; returns the reference results dict."""
    if use_pallas is None:
        use_pallas = default_use_pallas(cfg)
    cfg_key = rng.config_key(jax.random.key(seed), config_index)
    device_out = _run_bucket_device(
        _shape_only(cfg), cfg_key[None],
        np.asarray([cfg.s], np.float32), np.asarray([cfg.lr], np.float32),
        np.asarray([cfg.weight_decay], np.float32),
        use_pallas=use_pallas,
    )
    device_out = {k: v[0] for k, v in device_out.items()}
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
    seed: int = DEFAULT_SEED, batch_size: int = 64, resume: bool = False,
) -> List[Dict[str, Any]]:
    """Grid / linear hyperparameter scan (reference ``structure.py:81-255``).

    Every parameter may be a scalar or a list; ``linear=True`` zips
    equal-length lists instead of taking the Cartesian product.  Results are
    ``[{'params': ..., 'results': ...}]`` and are incrementally pickled every
    ``save_every`` experiments; a pre-existing ``save_path`` is removed at
    scan start, and (reference quirk preserved) the returned list is empty
    when everything was flushed to disk.

    ``resume=True`` (extension; SURVEY §5.3 preemption recovery) keeps the
    existing file and skips configurations already recorded in it.
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

    done: List[Dict[str, Any]] = []
    if save_path:
        if resume:
            from mfcd_tpu.utils.io import completed_param_sets

            done = completed_param_sets(save_path)
            if done:
                print(f"🔁 Resuming: {len(done)} experiments already in "
                      f"{save_path}")
        else:
            reset_save_path(save_path)

    all_results: List[Dict[str, Any]] = []
    for experiment_index, param_set in enumerate(spec.expand()):
        if param_set in done:
            continue
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
