#!/bin/bash
# Round-5 device session (second half): the on-chip evidence items of
# VERDICT r4 — fresh-cache warmup (item 1 done-condition), the K=50
# graded mode (item 5), cold-vs-warm sweep bench and the profiled
# faithful cell-3 grid (item 2).  Serial on purpose: never two
# TPU-touching processes (CLAUDE.md).  Each step is bounded; the K=50
# jnp comparison is deferred to the end of the session (worker-crash +
# cache-poison risk, see bench.py::bench_k50).
set -u
cd "$(dirname "$0")/.."
LOG=docs/device_r5
mkdir -p "$LOG"

run_step() {
  local name=$1 bound=$2; shift 2
  echo "=== $name: $* (bound ${bound}s) $(date -u +%H:%M:%SZ)" | tee -a "$LOG/session_r5b.log"
  local t0=$SECONDS
  timeout "$bound" "$@" > "$LOG/${name}.out" 2> "$LOG/${name}.err"
  local rc=$?
  echo "=== $name done rc=$rc in $((SECONDS - t0))s" | tee -a "$LOG/session_r5b.log"
}

# 0. Preflight: wait for the tunnel to answer ONE tiny op before paying
#    any step's full probe schedule against a dead tunnel (the 06:34Z
#    outage cost bench_fresh 2x ~9 min of staged probes).  A 60 s bound
#    is generous for a healthy first dispatch; a killed probe child was
#    hung pre-compile, the same trade bench.py's own probes make.
echo "=== preflight: waiting for tunnel $(date -u +%H:%M:%SZ)" | tee -a "$LOG/session_r5b.log"
for i in $(seq 1 20); do
  if timeout 60 python -c "import jax; print(int(jax.numpy.arange(4).sum()))" \
      >/dev/null 2>&1; then
    echo "=== preflight: tunnel healthy after attempt $i $(date -u +%H:%M:%SZ)" | tee -a "$LOG/session_r5b.log"
    break
  fi
  echo "    preflight attempt $i failed $(date -u +%H:%M:%SZ)" >> "$LOG/session_r5b.log"
  [ "$i" = 20 ] && { echo "=== preflight: tunnel still down; aborting" | tee -a "$LOG/session_r5b.log"; exit 1; }
  sleep 150
done

# 1. Graded default bench on a genuinely fresh cache (this machine has no
#    .jax_cache): the warmup line IS the item-1 measurement, and the run
#    repopulates the cache for the driver's end-of-round bench.
run_step bench_fresh 3000 python bench.py

# 2. K=50 graded mode, Pallas headline only (jnp child deferred).
MFCD_K50_JNP=0 run_step bench_k50 3000 env MFCD_K50_JNP=0 python bench.py --k50

# 3+4. Sweep bench: first run cold for its compile keys, second warm.
run_step bench_sweep_cold 1800 python bench.py --sweep
run_step bench_sweep_warm 1200 python bench.py --sweep

# 5. Faithful cell-3 grid (1,980 runs) with the host-side phase profiler.
run_step cell3_prof 3000 env MFCD_SWEEP_PROF=1 python -m experiments.runs \
  s_p_sweep --fast --out /tmp/cell3_r5.pkl

echo "=== session complete $(date -u +%H:%M:%SZ)" | tee -a "$LOG/session_r5b.log"
