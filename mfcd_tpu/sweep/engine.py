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
import os
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mfcd_tpu.core import rng
from mfcd_tpu.core.config import (
    TRAIN_RATIO,
    UNCAPPED_STRATEGIES,
    RunConfig,
    SweepSpec,
)
from mfcd_tpu.core.results import export_results
from mfcd_tpu.data.btl import (
    LabeledSplit,
    TripletSet,
    label_splits,
    sample_and_split,
)
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


@dataclasses.dataclass(frozen=True)
class SampleStatics:
    """Static (hashable) compile key of the sample stage.

    Deliberately excludes K / soft_label / num_epochs: the expensive
    generate-sample-split program is shared across every labeling scheme,
    and — via capacity bucketing (``compile_caps``) — across every
    sparsity value whose triplet budget rounds up to the same ``t_cap``.
    """

    n: int
    m: int
    d: int
    t_cap: int
    extra_cap: int
    strategy: str
    popularity_method: str
    alpha: float
    generation: str


def compile_caps(cfg: RunConfig) -> tuple:
    """(t_cap, extra_cap): power-of-two capacity bucket for a config.

    Rounding the triplet budget up to a power of two collapses a linear
    p-scan's per-p build compiles (~16s each on this host) to one per
    octave; the exact budget flows through the program as a traced scalar
    (VERDICT r2 item 2; replaces the sequential loop the reference runs at
    ``structure.py:160-171``).  Runtime cost is near-zero: the trainer's
    batch trip counts are dynamic in the valid count.

    ``svd`` and ``user_similarity`` always get exact capacities
    (``UNCAPPED_STRATEGIES``): their samplers derive *static* distribution
    parameters (projection rank; neighbor/top-set sizes) from the budget,
    which capping would silently shift away from the reference's.
    """
    sh = cfg.shapes()
    if cfg.strategy in UNCAPPED_STRATEGIES:
        return sh.num_triplets, sh.extra_test_triplets
    t_cap = _next_pow2(sh.num_triplets)
    extra_cap = (
        _next_pow2(sh.extra_test_triplets)
        if sh.extra_test_triplets > 0 else 0
    )
    return t_cap, extra_cap


def _sample_rep(rep_key, sk: SampleStatics, budget, extra_budget):
    """Per-rep X + triplet splits + init (reference ``structure.py:352-364``).

    The full triplet draw is trimmed to its count before crossing the jit
    boundary (the [t_cap, 3] sample array is only needed in-stage)."""
    streams = rng.rep_streams(rep_key)
    x = generate_x(streams["x_gen"], sk.n, sk.m, sk.d, sk.generation)
    splits = sample_and_split(
        streams, x,
        t_cap=sk.t_cap, extra_cap=sk.extra_cap,
        strategy=sk.strategy,
        popularity_method=sk.popularity_method,
        alpha=sk.alpha,
        budget=budget, extra_budget=extra_budget,
    )
    splits = splits._replace(
        sample=TripletSet(splits.sample.triplets[:0], splits.sample.count)
    )
    params = init_params(streams["init"], sk.n, sk.m, sk.d)
    return x, params, splits, streams


@partial(jax.jit, static_argnames=("sk",))
def _sample_bucket(sk: SampleStatics, rep_keys2d, budgets=None,
                   extra_budgets=None):
    """Stage 1a: X generation + triplet sampling/splitting for [B, R] runs.

    Compile key: ``sk`` only — shared across K, soft_label, epochs, and
    (through capacity bucketing) sparsity values.  ``budgets`` /
    ``extra_budgets`` are the per-config traced exact targets; ``None``
    compiles the fully static exact-capacity program (used when every
    budget equals its capacity — identical semantics, simpler program).
    """
    if budgets is None:
        return jax.vmap(
            lambda krow: jax.vmap(
                lambda k: _sample_rep(k, sk, None, None))(krow)
        )(rep_keys2d)
    return jax.vmap(
        lambda krow, b_i, eb_i: jax.vmap(
            lambda k: _sample_rep(k, sk, b_i, eb_i))(krow)
    )(rep_keys2d, budgets, extra_budgets)


@partial(jax.jit, static_argnames=("K", "soft_label"))
def _label_bucket(x, splits, streams, s, K: int, soft_label: bool):
    """Stage 1b: BTL labeling for [B, R] runs (cheap compile).

    Compile key: (K, soft_label, capacity shapes)."""
    def one_config(x_row, sp_row, st_row, s_i):
        return jax.vmap(
            lambda xx, sp, st: label_splits(st, xx, sp, s_i, K, soft_label)
        )(x_row, sp_row, st_row)

    return jax.vmap(one_config)(x, splits, streams, s)


@partial(jax.jit,
         static_argnames=("batch_size", "num_epochs", "reshuffle_period"))
def _train_bucket_jnp(params, train, val, ekeys, lr, wd,
                      batch_size: int, num_epochs: int,
                      reshuffle_period: int):
    """Stage 2 (jnp scan trainer): [B, R] runs.

    Compile key: only (row counts, n, m, d, batch_size, num_epochs,
    reshuffle_period) — the same executable serves every strategy and
    generation scheme.
    """
    def one_config(p_row, tr_row, va_row, ek_row, lr_i, wd_i):
        return jax.vmap(
            lambda p, tr, va, ek: train_model(
                p, tr, va, ek, lr_i, wd_i,
                batch_size=batch_size, num_epochs=num_epochs,
                reshuffle_period=reshuffle_period)
        )(p_row, tr_row, va_row, ek_row)

    return jax.vmap(one_config)(params, train, val, ekeys, lr, wd)


@partial(jax.jit, static_argnames=("batch_size", "num_epochs", "label_denom",
                                   "reshuffle_period"))
def _train_bucket_pallas(params, train, val, ekeys, lr, wd,
                         batch_size: int, num_epochs: int,
                         label_denom: int = 1,
                         reshuffle_period: int = 4):
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
        label_denom=label_denom, reshuffle_period=reshuffle_period,
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
                       use_pallas: bool = False,
                       caps=None, budgets=None, extra_budgets=None) -> Dict:
    """[B] configs x [reps] repetitions via four jitted stages.

    The stages are jitted separately so the persistent compile cache is
    compositional: training and metrics executables are keyed only on
    (power-of-two-padded) shapes and are reused across every strategy /
    generation / sparsity sweep; the sample stage is keyed on the
    capacity bucket (``caps``) and shared across K / soft_label / exact
    sparsity (whose budget is traced via ``budgets``); only the tiny
    label stage recompiles per (capacity, K, soft_label).  Intermediates
    stay on device (shardings propagate between stages).
    """
    r = cfg.reps
    rep_keys2d = jax.vmap(lambda ck: rng.rep_keys(ck, r))(cfg_keys)

    sh = cfg.shapes()
    if caps is None:
        caps = (sh.num_triplets, sh.extra_test_triplets)
    t_cap, extra_cap = caps
    b = int(np.shape(s)[0])
    if budgets is None:
        budgets = np.full((b,), sh.num_triplets, np.int32)
    if extra_budgets is None:
        extra_budgets = np.full((b,), sh.extra_test_triplets, np.int32)
    # When every budget equals its capacity the traced scalars are dead
    # weight — compile the fully static program instead (also keeps
    # budget-derived traced numerics like the svd rank mask out of
    # uncapped strategies entirely).
    if (np.all(np.asarray(budgets) == t_cap)
            and np.all(np.asarray(extra_budgets) == extra_cap)):
        budgets = extra_budgets = None

    sk = SampleStatics(
        n=cfg.n, m=cfg.m, d=cfg.d, t_cap=t_cap, extra_cap=extra_cap,
        strategy=cfg.strategy, popularity_method=cfg.popularity_method,
        alpha=cfg.alpha, generation=cfg.generation,
    )
    x, params, splits, streams = _sample_bucket(
        sk, rep_keys2d, budgets, extra_budgets)

    # Resolved here — in plain Python, per call — so MFCD_RESHUFFLE_PERIOD
    # is always part of the train stage's static compile key.
    from mfcd_tpu.ops.shuffle import default_reshuffle_period

    period = default_reshuffle_period()

    # Label/pad/train stay SEPARATE jits on purpose: a fused
    # label->pad->train program was built and A/B-measured on-device in
    # round 4 (0.987x — no steady-state win, plus trainer-compile
    # fragmentation across capacity buckets) and removed;
    # `docs/decisions/fuse_label.json` records the measurement.
    train, val, test = _label_bucket(
        x, splits, streams, s, K=cfg.K, soft_label=cfg.soft_label)

    train = _pad_rows(train, _next_pow2(train.u.shape[-1]))
    val = _pad_rows(val, _next_pow2(val.u.shape[-1]))
    test = _pad_rows(test, _next_pow2(test.u.shape[-1]))

    if use_pallas:
        params, tl, vl = _train_bucket_pallas(
            params, train, val, streams["epochs"], lr, weight_decay,
            batch_size=cfg.batch_size, num_epochs=cfg.num_epochs,
            label_denom=cfg.K if cfg.soft_label else 1,
            reshuffle_period=period,
        )
    else:
        params, tl, vl = _train_bucket_jnp(
            params, train, val, streams["epochs"], lr, weight_decay,
            batch_size=cfg.batch_size, num_epochs=cfg.num_epochs,
            reshuffle_period=period,
        )

    return _metrics_bucket(
        params, x, s, test, streams["sample_rows"], splits.sample.count,
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
               use_pallas: Optional[bool] = None,
               pad_compiles: bool = True) -> Dict[str, Any]:
    """Run one RunConfig; returns the reference results dict.

    ``pad_compiles=True`` (default) rounds array capacities up to
    power-of-two buckets (``compile_caps``) so sequential scans over
    sparsity reuse compiled executables; the exact triplet budget is
    honored via traced scalars.  Results are distribution-identical to
    the unpadded path (and bit-identical when the budget is already a
    power of two).
    """
    if use_pallas is None:
        use_pallas = default_use_pallas(cfg)
    sh = cfg.shapes()
    caps = compile_caps(cfg) if pad_compiles else None
    cfg_key = rng.config_key(jax.random.key(seed), config_index)
    device_out = _run_bucket_device(
        _shape_only(cfg), cfg_key[None],
        np.asarray([cfg.s], np.float32), np.asarray([cfg.lr], np.float32),
        np.asarray([cfg.weight_decay], np.float32),
        use_pallas=use_pallas,
        caps=caps,
        budgets=np.asarray([sh.num_triplets], np.int32),
        extra_budgets=np.asarray([sh.extra_test_triplets], np.int32),
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
    pad_compiles: bool = True,
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
        results = run_config(cfg, seed=seed, config_index=experiment_index,
                             pad_compiles=pad_compiles)
        all_results.append({"params": param_set, "results": results})

        if save_path and save_every and len(all_results) >= save_every:
            append_results(save_path, all_results)
            all_results = []

    if save_path and all_results:
        append_results(save_path, all_results)
        all_results = []

    return all_results
