"""Benchmark: full-training-run throughput on the canonical production config.

Measures end-to-end experiment throughput (generate X -> sample triplets ->
BTL labels -> 30-epoch Adam training -> full 23-metric evaluation -> host
export) on the reference's canonical 1000x1000, d=2 grid configuration
(reference ``Runs.ipynb`` cells 3-18, ``structure.py:356``), using the
framework's production path: one compiled XLA program vmapped over
(configs x reps).

Baseline (BASELINE.md): north-star >= 1000 full runs/hour on a v5e-8 slice
== 125 runs/hour/chip.  ``vs_baseline`` is measured runs/hour/chip / 125.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def bench_sweep():
    """--sweep: a production s x wd sweep through parameter_scan_fast.

    20 s-values x 2 weight decays x 3 reps = 120 full runs on the canonical
    1000x1000 d=2 p=0.2 grid, executed as shape-bucketed XLA programs —
    the BASELINE.json config-5 shape ("full grid, thousands of seeds").
    """
    import numpy as np

    from mfcd_tpu.sweep.batched import parameter_scan_fast

    s_values = list(np.logspace(-1, 1, 20))
    t0 = time.time()
    results = parameter_scan_fast(
        n=1000, m=1000, d=2, p=0.2, s=s_values,
        weight_decay=[5e-6, 5e-4], num_epochs=30, reps=3,
    )
    dt = time.time() - t0
    total_runs = len(results) * 3
    log(f"sweep: {len(results)} configs x 3 reps in {dt:.1f}s "
        f"(incl. any compile)")
    acc = [float(np.mean(r["results"]["accuracy"])) for r in results[:5]]
    log(f"accuracy head: {acc}")
    runs_per_hour = 3600.0 / dt * total_runs
    emit({
        "metric": "sweep_runs_per_hour_per_chip_1000x1000_sxwd",
        "value": round(runs_per_hour, 1),
        "unit": "runs/hour/chip",
        "vs_baseline": round(runs_per_hour / 125.0, 3),
    })


def time_kn_path(k: int, use_pallas: bool) -> float:
    """Seconds/run for the reference's heavy cell-5 configuration at label
    redundancy ``K=k`` (hard labels: the K-multiplied dataset of
    ``structure.py:516-518``, so K=10 is ~1M and K=50 ~4M padded train
    rows) on one training path — the hot loop ``structure.py:845-852``
    at its most demanding shapes."""
    from mfcd_tpu.core.config import RunConfig
    from mfcd_tpu.sweep.batched import run_bucket

    cfg = RunConfig(n=1000, m=1000, d=2, p=0.2, s=5.0, lr=1e-3,
                    weight_decay=5e-6, num_epochs=30, reps=2, K=k)
    rows = [{"s": 5.0, "lr": 1e-3, "weight_decay": 5e-6}]
    run_bucket(cfg, rows, [0], seed=123, use_pallas=use_pallas)  # compile
    t0 = time.time()
    out = run_bucket(cfg, rows, [0], seed=321, use_pallas=use_pallas)
    s_per_run = (time.time() - t0) / cfg.reps
    log(f"K={k} use_pallas={use_pallas}: {s_per_run:.2f}s/run "
        f"acc={[round(float(a), 3) for a in out[0]['accuracy']]}")
    return s_per_run


def time_kn(k: int):
    """(runs_per_hour_pallas, speedup_vs_jnp) with both paths inline."""
    t_pallas = time_kn_path(k, True)
    t_jnp = time_kn_path(k, False)
    return 3600.0 / t_pallas, t_jnp / t_pallas


def _jnp_s_per_run_subprocess(k: int, timeout_s: int = 2400):
    """The jnp-fallback timing in a bounded child, or None.

    At K=50 shapes the jnp gather path crashes the TPU *worker*
    (UNAVAILABLE "TPU worker process crashed", deterministic across 6
    retries, observed 2026-08-19) — so the comparison runs in a child
    that inherits the parent's session lock, and its failure costs the
    graded metric only the optional speedup field, never the headline."""
    import os
    import subprocess

    env = dict(os.environ, MFCD_TPU_LOCK_HELD="1")
    try:
        r = subprocess.run(
            [sys.executable, __file__, "--_kn-jnp", str(k)],
            capture_output=True, text=True, timeout=timeout_s, env=env)
    except subprocess.TimeoutExpired:
        log(f"K={k} jnp-path child timed out after {timeout_s}s")
        return None
    sys.stderr.write(r.stderr[-2000:])
    if r.returncode == 0:
        try:
            return float(r.stdout.strip().splitlines()[-1])
        except (ValueError, IndexError):
            pass
    log(f"K={k} jnp-path child failed rc={r.returncode} "
        f"(speedup field omitted)")
    return None


def time_k10():
    return time_kn(10)


def bench_k10():
    """--k10: the K=10 Pallas-vs-jnp timing as its own headline metric."""
    runs_per_hour, speedup = time_k10()
    emit({
        "metric": "k10_full_training_runs_per_hour_per_chip_pallas",
        "value": round(runs_per_hour, 1),
        "unit": "runs/hour/chip",
        "vs_baseline": round(runs_per_hour / 125.0, 3),
        "pallas_speedup_vs_jnp": round(speedup, 2),
    })


def bench_k50():
    """--k50: cell 5's heaviest bucket (K=50 vote expansion, ~4M padded
    train rows + 50x-expanded streamed eval; reference ``Runs.ipynb``
    cell 5, ``structure.py:516-518``) as its own graded metric.

    The Pallas headline is measured inline first; the jnp comparison
    runs afterwards in a bounded child because at these shapes it
    crashes the TPU worker (see ``_jnp_s_per_run_subprocess``)."""
    import os

    t_pallas = time_kn_path(50, True)
    runs_per_hour = 3600.0 / t_pallas
    payload = {
        "metric": "k50_full_training_runs_per_hour_per_chip_pallas",
        "value": round(runs_per_hour, 1),
        "unit": "runs/hour/chip",
        "vs_baseline": round(runs_per_hour / 125.0, 3),
    }
    if os.environ.get("MFCD_K50_JNP", "1") == "0":
        # Session scripting hook: the jnp comparison has crashed the TPU
        # *worker* at K=50 shapes (observed deterministic, 2026-08-19),
        # which can poison every .jax_cache entry written earlier in the
        # same worker lifetime — so interactive device sessions defer it
        # to their last step.  The field is carried from the last-good
        # record when one exists rather than silently dropped.
        prior = _load_last_good().get(payload["metric"], {})
        if "pallas_speedup_vs_jnp" in prior:
            payload["pallas_speedup_vs_jnp"] = prior["pallas_speedup_vs_jnp"]
            payload["jnp_path"] = "speedup carried from last-good record"
        else:
            payload["jnp_path"] = "comparison deferred (MFCD_K50_JNP=0)"
        emit(payload)
        return
    t_jnp = _jnp_s_per_run_subprocess(50)
    if t_jnp is not None:
        payload["pallas_speedup_vs_jnp"] = round(t_jnp / t_pallas, 2)
    else:
        payload["jnp_path"] = ("unavailable: crashes the TPU worker at "
                               "K=50 shapes (UNAVAILABLE, deterministic)")
    emit(payload)


def _probe_once(timeout_s: int) -> bool:
    """One bounded device probe: can the environment finish ONE tiny op?

    The axon tunnel's observed outage mode is a hang (or a signal-kill
    with no traceback) at the first dispatch — a hung bench would leave
    the round with NO artifact at all.  The probe runs in a subprocess
    so the bound is enforceable regardless of where the client blocks;
    a fresh tiny program keeps the legitimate first-dispatch cost
    (executable upload through the tunnel) well inside the budget.

    Concurrency note: probing the tunnel IS this subprocess's job, and
    the parent does no device work while it waits (its only tunnel
    contact was the unavoidable sitecustomize registration at interpreter
    start), so at most one process actively uses the TPU at any time.
    The child is killed only on timeout, i.e. when the tunnel is already
    unresponsive — never mid-compile on a healthy backend.
    """
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(int(jax.numpy.arange(4).sum()))"],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        log(f"device probe timed out after {timeout_s}s")
        return False
    ok = r.returncode == 0 and r.stdout.strip().endswith("6")
    if not ok:
        log(f"device probe failed rc={r.returncode}: {r.stderr[-500:]}")
    return ok


#: Staged probe schedule: (probe timeout, sleep after failure).  Three
#: bounded attempts ride out short tunnel blips and worker restarts
#: instead of betting the round's artifact on one window (round 3 lost
#: its headline number to exactly that).  Worst-case time to the
#: degraded JSON line: 2100 s (~35 min) when every probe HANGS to its
#: timeout (the observed outage mode), ~17 min when probes fail fast.
#: A healthy first dispatch of the tiny probe program is seconds even
#: with the executable upload, so the 300 s first window kills the
#: child only when the tunnel is already unresponsive — not mid-compile
#: on a healthy backend (the CLAUDE.md wedge mode).
PROBE_SCHEDULE = ((300, 240), (540, 420), (600, 0))


def device_reachable() -> bool:
    for i, (timeout_s, sleep_s) in enumerate(PROBE_SCHEDULE):
        if _probe_once(timeout_s):
            return True
        if sleep_s:
            log(f"probe {i + 1}/{len(PROBE_SCHEDULE)} failed; "
                f"retrying in {sleep_s}s")
            time.sleep(sleep_s)
    return False


LAST_GOOD_PATH = "BENCH_LAST_GOOD.json"

#: Advisory lock serializing TPU-touching sessions.  Two concurrent
#: tunnel users (e.g. the driver's graded bench colliding with the
#: recovery backlog `scripts/device_session_r4.sh`, or with the tunnel
#: watcher's probe) is the documented wedge mode (CLAUDE.md: "Never run
#: two TPU-touching processes concurrently") — the exact failure that
#: cost round 3 its headline artifact.
TPU_LOCK_PATH = ".tpu_session.lock"

_tpu_lock_fd = None  # held for process lifetime once acquired


def _acquire_tpu_lock(max_wait_s: float = 5700.0) -> bool:
    """Hold the repo-level TPU session flock before any device contact.

    Returns True when the lock is held or not needed: a parent that
    already holds it exports MFCD_TPU_LOCK_HELD=1 (flock is not
    reentrant across processes), and CPU runs (the test suite's
    subprocess smoke sets JAX_PLATFORMS=cpu) touch no tunnel.

    The wait is a BLOCKING flock bounded by a SIGALRM timer, not a
    non-blocking poll: the recovery backlog re-grabs the lock
    milliseconds after releasing it between steps, so a poller would
    essentially never win the handoff — a blocked waiter acquires the
    instant the current holder releases.  ``max_wait_s`` outlasts the
    largest single backlog step bound (5400 s + 30 s kill grace in
    scripts/device_session_r4.sh); on timeout the caller still gets its
    one degraded JSON line.
    """
    global _tpu_lock_fd
    import fcntl
    import os
    import signal

    if os.environ.get("MFCD_TPU_LOCK_HELD") == "1":
        return True
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # The env var alone does not guarantee a cpu backend under the
        # naked environment: the axon PJRT plugin overrides the
        # jax_platforms CONFIG during `import jax`.  Pin the config so
        # the lock bypass is honest — a cpu-declared run must actually
        # be incapable of dialing the tunnel.
        import jax

        jax.config.update("jax_platforms", "cpu")
        return True
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        TPU_LOCK_PATH)
    _tpu_lock_fd = open(path, "a")
    try:
        fcntl.flock(_tpu_lock_fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        return True
    except OSError:
        log(f"TPU session lock busy (recovery backlog active?); "
            f"blocking up to {max_wait_s:.0f}s for the handoff")

    def _timeout(signum, frame):
        raise TimeoutError("TPU session lock wait expired")

    old_handler = signal.signal(signal.SIGALRM, _timeout)
    signal.setitimer(signal.ITIMER_REAL, max_wait_s)
    try:
        fcntl.flock(_tpu_lock_fd, fcntl.LOCK_EX)
        return True
    except (TimeoutError, InterruptedError, OSError):
        return False
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0.0)
        signal.signal(signal.SIGALRM, old_handler)


def _git_head() -> str:
    import subprocess

    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, timeout=10).stdout.strip()
        return out or "unknown"
    except Exception:  # noqa: BLE001 — commit stamp is best-effort
        return "unknown"


def _last_good_file() -> str:
    import os

    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        LAST_GOOD_PATH)


def _load_last_good() -> dict:
    """The persisted store, keyed by metric name.

    Accepts the legacy flat single-record layout (a dict with a 'metric'
    key at top level) by lifting it into {metric: record}."""
    try:
        with open(_last_good_file()) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}
    if "metric" in data:
        return {data["metric"]: data}
    return data


def _active_backend() -> str:
    """Platform the measurement actually ran on (monkeypatchable)."""
    import jax

    return jax.default_backend()


def emit(payload: dict) -> None:
    """Print the one graded JSON line; persist successful measurements.

    A successful on-device measurement is written to BENCH_LAST_GOOD.json
    (with timestamp + commit) so a later degraded run can cite the last
    real number instead of reporting only 0.0.  CPU runs (the test suite
    invokes ``bench.py --quick`` on CPU in a subprocess) must NOT be
    persisted: a CPU throughput masquerading as the last on-device
    number would corrupt the degraded citation.
    """
    print(json.dumps(payload))
    if payload.get("value", 0.0) > 0.0 and "error" not in payload:
        backend = _active_backend()
        if backend == "cpu":
            log("not persisting last-good: measurement ran on cpu")
            return
        import datetime

        record = dict(payload)
        record["platform"] = backend
        record["measured_at_utc"] = datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds")
        record["commit"] = _git_head()
        # Keyed by metric: a quick/sweep/k10 measurement must never
        # masquerade as the last full-training number (and vice versa)
        # when a later degraded run cites its own metric's record.
        store = _load_last_good()
        store[record["metric"]] = record
        try:
            with open(_last_good_file(), "w") as f:
                json.dump(store, f, indent=1)
                f.write("\n")
        except OSError as e:
            log(f"could not persist last-good measurement: {e}")


def _degraded_payload(metric: str) -> dict:
    """Parseable failure record, citing the last on-device success for
    THIS metric if any (never a different benchmark's number)."""
    payload = {
        "metric": metric,
        "value": 0.0,
        "unit": "runs/hour/chip",
        "vs_baseline": 0.0,
        "error": "device unreachable (axon tunnel down); see stderr",
    }
    record = _load_last_good().get(metric)
    if record is not None:
        payload["last_good"] = record
    # Tunnel-independent evidence: the same-single-CPU-core comparison
    # against the torch reference survives any outage
    # (scripts/bench_cpu_vs_reference.py); the K=10 benchmark cites the
    # matching vote-expansion regime.
    import os

    cmp_name = ("CPU_VS_REFERENCE_K10.json" if metric.startswith("k10")
                else "CPU_VS_REFERENCE.json")
    cmp_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "docs", cmp_name)
    try:
        with open(cmp_path) as f:
            cmp_rec = json.load(f)
        payload["cpu_same_core_speedup_vs_reference"] = cmp_rec[
            "speedup_steady_state"]
    except (OSError, ValueError, KeyError):
        pass
    return payload


def main():
    if "--_kn-jnp" in sys.argv:
        # Child mode for the bounded jnp-path comparison: the parent
        # already holds the session lock (MFCD_TPU_LOCK_HELD=1) and has
        # probed the device.  Prints ONE float (s/run) on stdout.
        k = int(sys.argv[sys.argv.index("--_kn-jnp") + 1])
        print(time_kn_path(k, False))
        return
    quick = "--quick" in sys.argv
    if "--sweep" in sys.argv:
        metric = "sweep_runs_per_hour_per_chip_1000x1000_sxwd"
    elif "--k10" in sys.argv:
        metric = "k10_full_training_runs_per_hour_per_chip_pallas"
    elif "--k50" in sys.argv:
        metric = "k50_full_training_runs_per_hour_per_chip_pallas"
    elif quick:
        metric = "quick_smoke_runs_per_hour_per_chip_100x100"
    else:
        metric = "full_training_runs_per_hour_per_chip_1000x1000_d2_p0.2"
    import os

    on_cpu = os.environ.get("JAX_PLATFORMS", "").strip() == "cpu"
    if not _acquire_tpu_lock():
        # Another TPU session (the recovery backlog) is mid-flight and
        # outlasted our wait; probing the tunnel under it risks wedging
        # both.  Degrade — the backlog's own bench step persists a fresh
        # last-good record this payload cites.
        payload = _degraded_payload(metric)
        payload["error"] = ("TPU session lock busy (concurrent device "
                            "session); see stderr")
        print(json.dumps(payload))
        return
    if not on_cpu and not device_reachable():
        # Degraded-but-parseable record instead of a hang: the driver
        # still gets its one JSON line, with the failure explicit and
        # the metric name matching the requested mode.  A cpu-declared
        # run skips the probe entirely: its backend is pinned to cpu by
        # the lock bypass above, and the probe subprocess would dial
        # the tunnel the run is explicitly avoiding.
        print(json.dumps(_degraded_payload(metric)))
        return
    try:
        _run_mode(metric, quick)
    except Exception as e:  # noqa: BLE001 — the driver must ALWAYS get
        # its one parseable JSON line; a mid-measurement device loss
        # (e.g. a TPU worker crash outlasting the retry budget) degrades
        # to the last-good citation instead of rc!=0 with no artifact.
        import traceback

        traceback.print_exc(file=sys.stderr)
        payload = _degraded_payload(metric)
        payload["error"] = (f"bench failed mid-measurement: "
                            f"{type(e).__name__}: {str(e)[:200]}")
        print(json.dumps(payload))


def _run_mode(metric: str, quick: bool) -> None:
    if "--sweep" in sys.argv:
        bench_sweep()
        return
    if "--k10" in sys.argv:
        bench_k10()
        return
    if "--k50" in sys.argv:
        bench_k50()
        return

    import jax

    from mfcd_tpu.core.config import RunConfig
    from mfcd_tpu.sweep.batched import run_bucket

    # Self-heal a poisoned persistent compile cache (stale executables from
    # a restarted TPU worker fail to load with FAILED_PRECONDITION) before
    # the graded timing starts.
    try:
        from mfcd_tpu.cache import ensure_cache_healthy

        ensure_cache_healthy()
    except Exception as e:  # noqa: BLE001 — bench must still attempt the run
        log(f"cache health check failed (continuing): {e}")

    if quick:
        cfg = RunConfig(n=100, m=100, d=2, p=0.2, num_epochs=5, reps=2)
        n_configs = 2
    else:
        # Canonical production config: n=m=1000, d=2, 30 epochs, p=0.2
        # (100k triplets -> 80k train rows -> 1250 steps/epoch at batch 64).
        cfg = RunConfig(
            n=1000, m=1000, d=2, p=0.2, s=5.0, lr=1e-3, weight_decay=5e-6,
            num_epochs=30, reps=4, K=1, strategy="random", generation="base",
        )
        n_configs = 2

    rows = [
        {"s": 5.0 + k, "lr": 1e-3, "weight_decay": 5e-6}
        for k in range(n_configs)
    ]
    total_runs = n_configs * cfg.reps
    shapes = cfg.shapes()
    steps_per_run = shapes.train_batches * cfg.num_epochs
    rows_per_run = shapes.train_rows * cfg.num_epochs

    log(f"device: {jax.devices()[0]}")
    log(f"config: n={cfg.n} m={cfg.m} d={cfg.d} p={cfg.p} K={cfg.K} "
        f"epochs={cfg.num_epochs}; {total_runs} runs "
        f"({n_configs} configs x {cfg.reps} reps); "
        f"{steps_per_run} Adam steps/run")

    t0 = time.time()
    run_bucket(cfg, rows, list(range(n_configs)), seed=123)
    log(f"warmup (incl. compile): {time.time() - t0:.1f}s")

    t0 = time.time()
    out = run_bucket(cfg, rows, list(range(n_configs)), seed=321)
    dt = time.time() - t0
    log(f"steady-state: {dt:.2f}s for {total_runs} full runs "
        f"({dt / total_runs:.3f}s/run)")
    log(f"accuracy sample: {out[0]['accuracy']}")

    runs_per_hour_per_chip = 3600.0 / dt * total_runs
    grads_per_sec = rows_per_run * total_runs / dt
    log(f"triplet-grads/sec: {grads_per_sec:,.0f}")

    payload = {
        "metric": metric,
        "value": round(runs_per_hour_per_chip, 1),
        "unit": "runs/hour/chip",
        "vs_baseline": round(runs_per_hour_per_chip / 125.0, 3),
    }

    if not quick:
        # Also surface the fused-epoch Pallas kernel's payoff regime
        # (reference cell 5's heavy K=10 shape, hot loop
        # ``structure.py:845-852``) in the same single JSON line: the K=1
        # headline doesn't exercise it (VERDICT r2 item 7).
        try:
            runs_per_hour_k10, speedup = time_k10()
            payload["k10_pallas_runs_per_hour"] = round(runs_per_hour_k10, 1)
            payload["k10_pallas_speedup_vs_jnp"] = round(speedup, 2)
        except Exception as e:  # noqa: BLE001 — keep the headline metric
            log(f"K=10 pallas timing failed (headline unaffected): {e}")

    emit(payload)


if __name__ == "__main__":
    main()
