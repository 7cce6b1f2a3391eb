"""Batched, mesh-sharded sweep execution — the production fast path.

Where the reference runs its hyperparameter grid as a sequential python loop
(reference ``structure.py:160-171``), this module executes whole *shape
buckets* of configurations as single XLA programs:

    configs (same shapes) --vmap--> reps --vmap--> one fused run program
            |                                     (generate X -> sample ->
            +-- sharded over the device mesh       label -> train -> metrics)

Traced hyperparameters (s, lr, weight_decay) vary freely inside a bucket;
only shape-changing parameters split buckets.  On a TPU slice the bucket
axis is sharded across chips with ``jax.jit`` output shardings — the runs
are independent, so no collectives are emitted and scaling is linear
(SURVEY §2.9: experiment-level DP).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfcd_tpu.core.config import RunConfig, SweepSpec, bucket_by_shape
from mfcd_tpu.core.results import export_results
from mfcd_tpu.sweep.engine import (
    DEFAULT_SEED,
    _run_bucket_device,
    _shape_only,
    default_use_pallas,
)
from mfcd_tpu.utils.io import append_results, reset_save_path


class _SweepProf:
    """Opt-in (``MFCD_SWEEP_PROF=1``) wall-clock split of a sweep's phases.

    The whole-sweep throughput gap (VERDICT r4: faithful cell 3 at 8.7k
    runs/hr vs 55.4k steady) lives OUTSIDE the compiled programs; this
    accounts every host-side second of ``parameter_scan_fast`` into
    dispatch (tracing + compile + enqueue), wait (device execution +
    host transfer), export (schema assembly), and persist (pickle), so
    the gap can be attacked by measurement instead of guesswork.
    """

    enabled = os.environ.get("MFCD_SWEEP_PROF") == "1"
    times: Dict[str, float] = {}
    counts: Dict[str, int] = {}

    @classmethod
    def add(cls, phase: str, dt: float) -> None:
        cls.times[phase] = cls.times.get(phase, 0.0) + dt
        cls.counts[phase] = cls.counts.get(phase, 0) + 1

    @classmethod
    def report(cls, total_s: float, runs: int) -> None:
        if not cls.times:
            return
        print(f"[sweep-prof] total {total_s:.1f}s for {runs} runs "
              f"({1e3 * total_s / max(runs, 1):.1f} ms/run)", file=sys.stderr)
        accounted = 0.0
        for phase in sorted(cls.times, key=cls.times.get, reverse=True):
            t = cls.times[phase]
            accounted += t
            print(f"[sweep-prof]   {phase:10s} {t:8.1f}s "
                  f"({1e3 * t / max(runs, 1):7.1f} ms/run, "
                  f"{cls.counts[phase]} calls)", file=sys.stderr)
        print(f"[sweep-prof]   {'other':10s} {total_s - accounted:8.1f}s",
              file=sys.stderr)
        cls.times, cls.counts = {}, {}


def _is_oom(msg: str) -> bool:
    """Device or compile-time out-of-memory — deterministic for a given
    chunk size, so the right response is bisection, not retry.  Compile
    OOMs arrive as INTERNAL ("XLA:TPU compile permanent error. Ran out of
    memory..."), runtime ones as RESOURCE_EXHAUSTED."""
    return "RESOURCE_EXHAUSTED" in msg or "Ran out of memory" in msg


def pipeline_enabled() -> bool:
    """Whether the 1-deep bucket pipeline is active (``MFCD_PIPELINE``;
    default resolves through the committed on-device decision artifact
    ``docs/decisions/pipeline.json`` — measured 1.104x on the bench sweep
    grid, round 4)."""
    from mfcd_tpu.core.decisions import flag_enabled

    return flag_enabled("MFCD_PIPELINE", "pipeline", default=False)


def make_sweep_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A 1-D mesh over all (or n) devices for experiment-level DP."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("grid",))


def run_bucket_async(
    cfg: RunConfig,
    hyper_rows: Sequence[Dict[str, float]],
    config_indices: Sequence[int],
    seed: int = DEFAULT_SEED,
    mesh: Optional[Mesh] = None,
    use_pallas: Optional[bool] = None,
    caps=None,
    bucket_configs: Optional[Sequence[RunConfig]] = None,
) -> "BucketFuture":
    """Dispatch a same-shape bucket of configurations, optionally sharded.

    Returns a :class:`BucketFuture` whose ``collect()`` blocks on the host
    transfer and assembles results.  XLA dispatch is asynchronous, so the
    device starts executing this bucket immediately while the caller is
    free to post-process a PREVIOUS bucket — the 1-deep pipeline that
    hides host-side export/pickle time (``parameter_scan_fast``,
    ``MFCD_PIPELINE``).

    ``hyper_rows`` carries the traced values ``{'s', 'lr', 'weight_decay'}``
    per configuration; ``config_indices`` are global experiment indices for
    key folding (so results are identical with or without batching).

    With ``caps`` (a ``(t_cap, extra_cap)`` capacity bucket) and
    ``bucket_configs`` (the per-row RunConfigs), configurations differing
    only in sparsity share one program: each row's exact triplet budget is
    traced (VERDICT r2 item 2).
    """
    if use_pallas is None:
        platform = (
            mesh.devices.flat[0].platform if mesh is not None
            else jax.devices()[0].platform
        )
        use_pallas = default_use_pallas(cfg, platform=platform)
    b = len(hyper_rows)
    pad = 0
    if mesh is not None:
        n_dev = mesh.devices.size
        pad = (-b) % n_dev

    idx = list(config_indices) + [config_indices[-1]] * pad
    rows = list(hyper_rows) + [hyper_rows[-1]] * pad

    base = jax.random.key(seed)
    cfg_keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        np.asarray(idx, np.int32)
    )
    s = np.asarray([r["s"] for r in rows], np.float32)
    lr = np.asarray([r["lr"] for r in rows], np.float32)
    wd = np.asarray([r["weight_decay"] for r in rows], np.float32)

    if bucket_configs is not None:
        shs = [c.shapes() for c in bucket_configs]
    else:
        shs = [cfg.shapes()] * b
    shs = shs + [shs[-1]] * pad
    budgets = np.asarray([sh.num_triplets for sh in shs], np.int32)
    extra_budgets = np.asarray(
        [sh.extra_test_triplets for sh in shs], np.int32)
    targets = [sh.num_triplets for sh in shs[:b]]

    shape_cfg = _shape_only(cfg)
    if mesh is not None:
        sharding = NamedSharding(mesh, P("grid"))
        cfg_keys = jax.device_put(cfg_keys, sharding)
        s = jax.device_put(s, sharding)
        lr = jax.device_put(lr, sharding)
        wd = jax.device_put(wd, sharding)
        budgets = jax.device_put(budgets, sharding)
        extra_budgets = jax.device_put(extra_budgets, sharding)

    def dispatch():
        return _run_bucket_device(shape_cfg, cfg_keys, s, lr, wd,
                                  use_pallas=use_pallas,
                                  caps=caps, budgets=budgets,
                                  extra_budgets=extra_budgets)

    def postprocess(host):
        results = []
        for bi in range(b):
            per_cfg = {k: v[bi] for k, v in host.items()}
            counts = per_cfg.pop("sample_count")
            for c in counts:
                if int(c) < targets[bi]:
                    # Diagnostics go to stderr: bench.py and other
                    # stdout-JSON consumers drive this path.
                    print(
                        f"⚠️ Only {int(c)} triplets generated for strategy: "
                        f"{cfg.strategy} (target={targets[bi]})",
                        file=sys.stderr,
                    )
            results.append(export_results(per_cfg))
        return results

    return BucketFuture(dispatch, postprocess)


def run_bucket(
    cfg: RunConfig,
    hyper_rows: Sequence[Dict[str, float]],
    config_indices: Sequence[int],
    seed: int = DEFAULT_SEED,
    mesh: Optional[Mesh] = None,
    use_pallas: Optional[bool] = None,
    caps=None,
    bucket_configs: Optional[Sequence[RunConfig]] = None,
) -> List[Dict[str, Any]]:
    """Synchronous :func:`run_bucket_async` — dispatch, collect, assemble."""
    return run_bucket_async(
        cfg, hyper_rows, config_indices, seed=seed, mesh=mesh,
        use_pallas=use_pallas, caps=caps, bucket_configs=bucket_configs,
    ).collect()


class BucketFuture:
    """An in-flight bucket: async XLA dispatch now, ordered collect later.

    ``collect()`` owns the transient-failure recovery (SURVEY §5.3):
    remote compilation and the device transport can hiccup; it retries
    (re-dispatching as needed) with backoff before giving up so long
    sweeps survive infrastructure blips.  Errors therefore always surface
    at THIS bucket's collect — chunk attribution is unchanged from the
    sequential path even when a later bucket is already queued behind it.
    """

    def __init__(self, dispatch, postprocess):
        self._dispatch = dispatch
        self._post = postprocess
        self._out = None
        self._init_err = None
        # Dispatch errors (tracing/compile) are deferred into collect()'s
        # retry loop so a pipelined caller sees every failure in bucket
        # order, at the same call site, with the same classification —
        # in particular an OOM at dispatch must reach the caller's
        # bisector from collect(), not escape at the dispatch call site.
        t0 = time.time() if _SweepProf.enabled else 0.0
        try:
            self._out = dispatch()
        except (jax.errors.JaxRuntimeError, ValueError) as e:
            self._out = None
            self._init_err = e
        if _SweepProf.enabled:
            _SweepProf.add("dispatch", time.time() - t0)

    def collect(self) -> List[Dict[str, Any]]:
        host = self._collect_host()
        t0 = time.time() if _SweepProf.enabled else 0.0
        out = self._post(host)
        if _SweepProf.enabled:
            _SweepProf.add("export", time.time() - t0)
        return out

    def _collect_host(self):
        last_err = None
        attempts = 6
        fp_attempts = 0
        # A construction-time dispatch failure replays through the same
        # classification below (consuming attempt 0) WITHOUT a redundant
        # re-dispatch first: deterministic failures (OOM, INVALID_...)
        # must not pay a second multi-minute compile just to re-raise.
        pending_err, self._init_err = self._init_err, None
        for attempt in range(attempts):
            try:
                if pending_err is not None:
                    err, pending_err = pending_err, None
                    raise err
                if self._out is None:
                    self._out = self._dispatch()
                # Materialize inside the retry scope: dispatch is async, so
                # device failures surface at the host transfer.  One
                # device_get for the whole dict: it issues async host copies
                # for every leaf before blocking, so the ~25 result arrays
                # pay one tunnel round-trip instead of one each (~0.45s per
                # bucket on the axon transport).
                t0 = time.time() if _SweepProf.enabled else 0.0
                host = jax.device_get(dict(self._out))
                if _SweepProf.enabled:
                    _SweepProf.add("wait", time.time() - t0)
                return host
            except (jax.errors.JaxRuntimeError, ValueError) as e:
                # ValueError included: backend failures during tracing
                # (e.g. a FAILED_PRECONDITION surfacing from a traced
                # arange while the tunnel restarts) arrive as plain
                # ValueError, not JaxRuntimeError (observed killing a
                # resume pass).
                last_err = e
                msg = str(e)
                # Re-dispatch on the next attempt: the in-flight buffers
                # are dead after a device error.
                self._out = None
                if _is_oom(msg):
                    # Deterministic compile/runtime OOM: retrying the same
                    # shape is useless (and via remote_compile each retry
                    # is minutes) — let the chunk bisector handle it.
                    raise
                # NB: XLA wraps deterministic failures in INTERNAL too —
                # only retry statuses that are reliably infrastructure-side.
                is_fp = ("FAILED_PRECONDITION" in msg
                         or "FailedPrecondition" in msg)
                if is_fp:
                    # Axon-tunnel worker restarts surface as bare
                    # FAILED_PRECONDITION "TPU backend error" at the host
                    # transfer (observed killing a sweep at config 64/252)
                    # — retryable over the full multi-minute backoff
                    # budget.  But a poisoned persistent compile cache
                    # produces the SAME status deterministically, so after
                    # the second hit run the canary/fresh-compile
                    # differential inline: it purges a poisoned cache
                    # (making the next retry succeed) and is a no-op when
                    # the backend is merely restarting (ADVICE r2 +
                    # review r3).
                    fp_attempts += 1
                    if fp_attempts == 2:
                        from mfcd_tpu.cache import ensure_cache_healthy

                        try:
                            if not ensure_cache_healthy():
                                print("⚠️ purged poisoned compile cache; "
                                      "retrying", file=sys.stderr)
                        except Exception as probe_err:  # noqa: BLE001
                            # Backend down (fresh compile failed too) —
                            # keep backing off through the remaining
                            # attempts.
                            print(f"⚠️ backend still down during cache "
                                  f"probe: {str(probe_err)[:80]}",
                                  file=sys.stderr)
                transient = any(tok in msg for tok in
                                ("remote_compile", "UNAVAILABLE",
                                 "DEADLINE_EXCEEDED",
                                 "worker process crashed")) or is_fp
                if not transient or attempt == attempts - 1:
                    if is_fp:
                        print(
                            "⚠️ persistent FAILED_PRECONDITION: if a bare "
                            "fresh-compile probe works, the persistent "
                            "compile cache likely holds executables from a "
                            "restarted TPU worker — delete .jax_cache "
                            "(see CLAUDE.md).",
                            file=sys.stderr,
                        )
                    raise
                import time as _time

                print(f"⚠️ transient device error "
                      f"(attempt {attempt + 1}/{attempts}), "
                      f"retrying: {msg[:120]}", file=sys.stderr)
                _time.sleep(15 * (attempt + 1))
        raise last_err  # pragma: no cover — loop always returns or raises


def default_max_bucket(cfg: RunConfig, t_cap: Optional[int] = None) -> int:
    """Configs per program, bounded by a per-run device-memory estimate.

    ``t_cap`` sizes the estimate at the capacity bucket (arrays in a
    bucketed program are allocated at ``t_cap``, not the exact budget).

    Per run the program holds the n x m matrices (X and the metric-stage
    UV^T materializations), ~a dozen row-length arrays (train split,
    per-epoch gathered batch tensors; optimizer state is negligible), and
    the sampling stage's overdraw working set (proposal candidates + dedup
    hash table — dominant for constrained strategies like margin, whose
    overdraw is O(n*m) regardless of the triplet budget).  A ~2GB working
    budget stays under the observed OOM thresholds (K=1: ~320 runs
    crashed, 120 fine; margin at 108 runs RESOURCE_EXHAUSTED).
    """
    from mfcd_tpu.core.config import TRAIN_RATIO
    from mfcd_tpu.eval.metrics import _RANK_CUBE_ELEMS
    from mfcd_tpu.sampling.dedup import _next_pow2
    from mfcd_tpu.sampling.strategies import plan_overdraw
    from mfcd_tpu.train.trainer import _LOSS_BLOCK_BATCHES

    sh = cfg.shapes()
    t = sh.num_triplets if t_cap is None else t_cap
    train_rows = int(TRAIN_RATIO * t) * (1 if cfg.soft_label else cfg.K)
    # val + test rows at capacity (always hard-labeled, so x K); the
    # 500-label top-up keeps its exact size (it is never capacity-padded
    # beyond a pow-2 bucket of the same magnitude).
    eval_raw = (t - int(TRAIN_RATIO * t)) * cfg.K \
        + sh.extra_test_triplets * cfg.K
    rows_pad = _next_pow2(max(train_rows, 1))
    # The PRP fast paths change the sampler working set (shared gate
    # logic: sampling/prp.py::fast_path_kind): 'prefix' strategies build
    # NO candidate array at all (pure map over output slots), margin's
    # 'distinct' keeps its candidates + acceptance mask but drops the
    # hash table; only the full overdraw+dedup strategies pay the
    # 48 B/proposal (candidates + packed keys + table + winner passes).
    from mfcd_tpu.sampling.prp import fast_path_kind

    kind = fast_path_kind(cfg.strategy, cfg.n, cfg.m, t,
                          sh.extra_test_triplets)
    if kind == "prefix":
        sampler_bytes = 0
    else:
        m_draw = plan_overdraw(
            cfg.strategy, t, cfg.n, cfg.m,
            popularity_method=cfg.popularity_method, alpha=cfg.alpha,
        )
        sampler_bytes = m_draw * (20 if kind == "distinct" else 48)
    # The metrics stage's counting ranker streams [block, m, m] boolean
    # comparison cubes per vmapped run (mfcd_tpu/eval/metrics.py::_ranks);
    # ~2 cubes are live across the comparison + reduction.
    rank_cube_bytes = 2 * min(_RANK_CUBE_ELEMS, cfg.n * cfg.m * cfg.m)
    # Val/test splits carry hard labels even under soft_label (reference
    # structure.py:733-735), so their row storage scales with K; their
    # gathers stream in bounded blocks (trainer.map_batch_blocks), so only
    # the ~17B/row (u,i,j int32 + label f32 + valid) storage counts here,
    # plus one live lane-padded [block*bs, 128] gather triple.
    eval_rows = _next_pow2(max(eval_raw, 1))
    eval_bytes = (eval_rows * 17
                  + _LOSS_BLOCK_BATCHES * cfg.batch_size * 128 * 4 * 3)
    per_run_bytes = (cfg.n * cfg.m * 4 * 3 + rows_pad * 4 * 12
                     + sampler_bytes + rank_cube_bytes + eval_bytes)
    budget_runs = max(4, int(2e9 / per_run_bytes))
    return max(1, budget_runs // max(cfg.reps, 1))


def parameter_scan_fast(
    mesh: Optional[Mesh] = None,
    save_path: Optional[str] = None,
    save_every: Optional[int] = None,
    linear: bool = False,
    seed: int = DEFAULT_SEED,
    batch_size: int = 64,
    max_bucket: Optional[int] = None,
    resume: bool = False,
    pad_compiles: bool = True,
    **params,
) -> List[Dict[str, Any]]:
    """Mesh-parallel ``parameter_scan`` with identical semantics and schema.

    Groups the expanded grid into shape buckets, runs each bucket as one
    (sharded) XLA program, and re-assembles results in grid order so the
    output is interchangeable with the sequential scan.  ``max_bucket``
    bounds device-memory use per program (default: adaptive on
    runs-per-program, see :func:`default_max_bucket`).  ``resume=True``
    keeps an existing results file and skips configurations already in it.
    """
    spec = SweepSpec(params=params, linear=linear, batch_size=batch_size)
    param_sets = spec.expand()
    configs = [RunConfig(batch_size=batch_size, **ps) for ps in param_sets]
    buckets = bucket_by_shape(configs, capped=pad_compiles)

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

    slot_results: List[Optional[Dict]] = [None] * len(configs)
    t_scan0 = time.time()
    runs_executed = 0
    for _sig, indices in buckets.items():
        indices = [i for i in indices if param_sets[i] not in done]
        if not indices:
            continue
        rep_cfg = configs[indices[0]]
        caps = None
        if pad_compiles:
            from mfcd_tpu.sweep.engine import compile_caps

            caps = compile_caps(rep_cfg)
        bucket_cap = (max_bucket if max_bucket is not None
                      else default_max_bucket(
                          rep_cfg, t_cap=caps[0] if caps else None))
        def _dispatch_chunk(chunk) -> BucketFuture:
            rows = [
                {
                    "s": configs[i].s,
                    "lr": configs[i].lr,
                    "weight_decay": configs[i].weight_decay,
                }
                for i in chunk
            ]
            return run_bucket_async(
                rep_cfg, rows, chunk, seed=seed, mesh=mesh, caps=caps,
                bucket_configs=[configs[i] for i in chunk])

        def _collect_or_bisect(chunk, fut):
            """Collect a chunk; on device OOM, bisect it (the budget
            estimate is a heuristic — halving converges to a fitting
            size)."""
            try:
                return fut.collect()
            except (jax.errors.JaxRuntimeError, ValueError) as e:
                if not _is_oom(str(e)) or len(chunk) <= 1:
                    raise
                mid = len(chunk) // 2
                print(f"⚠️ device OOM on a {len(chunk)}-config chunk; "
                      f"bisecting", file=sys.stderr)
                return _run_chunk(chunk[:mid]) + _run_chunk(chunk[mid:])

        def _run_chunk(chunk):
            return _collect_or_bisect(chunk, _dispatch_chunk(chunk))

        def _store(chunk, outs):
            for i, res in zip(chunk, outs):
                slot_results[i] = res
            if save_path:
                # Crash-safe incremental persistence: each completed chunk
                # lands on disk immediately (bucket-traversal order — the
                # plotting layer keys off params, not file order).
                t0 = time.time() if _SweepProf.enabled else 0.0
                append_results(
                    save_path,
                    [{"params": param_sets[i], "results": res}
                     for i, res in zip(chunk, outs)],
                )
                if _SweepProf.enabled:
                    _SweepProf.add("persist", time.time() - t0)

        # MFCD_PIPELINE=1: 1-deep software pipeline — dispatch chunk k+1
        # (async XLA execution starts immediately) BEFORE collecting and
        # exporting chunk k, hiding host-side device_get/export/pickle
        # time (~7.7 ms/run at the bench bucket) behind device compute.
        # Two chunks in flight doubles peak working set (~2 GB each per
        # default_max_bucket); errors still surface in chunk order at
        # each chunk's collect.  If chunk k OOMs while k+1 is already in
        # flight, k+1 is DRAINED first so the bisection of k runs with a
        # single chunk's working set (co-resident bisection halves would
        # otherwise keep OOMing down to singletons); k's halves and then
        # k+1's results persist in chunk order.
        pipeline = pipeline_enabled()
        pending = None
        for lo in range(0, len(indices), bucket_cap):
            chunk = indices[lo:lo + bucket_cap]
            if not pipeline:
                _store(chunk, _run_chunk(chunk))
                continue
            try:
                fut = _dispatch_chunk(chunk)
            except Exception:
                # Eager dispatch-side failure (host work before the XLA
                # call, e.g. a device_put through a dying tunnel): the
                # PREVIOUS chunk has completed on device — persist it
                # before surfacing this chunk's error, exactly as the
                # sequential order would have.
                if pending is not None:
                    _store(pending[0], _collect_or_bisect(*pending))
                    pending = None
                raise
            if pending is None:
                pending = (chunk, fut)
            else:
                p_chunk, p_fut = pending
                pending = (chunk, fut)
                try:
                    outs = p_fut.collect()
                except (jax.errors.JaxRuntimeError, ValueError) as e:
                    if not _is_oom(str(e)) or len(p_chunk) <= 1:
                        raise
                    print(f"⚠️ device OOM on a pipelined {len(p_chunk)}"
                          f"-config chunk; draining the in-flight chunk, "
                          f"then bisecting", file=sys.stderr)
                    try:
                        next_outs = fut.collect()
                        next_err = None
                    except (jax.errors.JaxRuntimeError, ValueError) as ne:
                        next_outs, next_err = None, ne
                    mid = len(p_chunk) // 2
                    _store(p_chunk, _run_chunk(p_chunk[:mid])
                           + _run_chunk(p_chunk[mid:]))
                    if next_outs is not None:
                        _store(chunk, next_outs)
                    elif _is_oom(str(next_err)) and len(chunk) > 1:
                        _store(chunk, _run_chunk(chunk))
                    else:
                        raise next_err
                    pending = None
                    continue
                _store(p_chunk, outs)
        if pending is not None:
            _store(pending[0], _collect_or_bisect(*pending))
        runs_executed += sum(configs[i].reps for i in indices)

    if _SweepProf.enabled:
        _SweepProf.report(time.time() - t_scan0, runs_executed)
    if save_path:
        return []
    return [
        {"params": ps, "results": res}
        for ps, res in zip(param_sets, slot_results)
    ]
