#!/bin/bash
# Round-4 device backlog, run when the axon tunnel recovers.  Ordered to
# secure the graded bench number FIRST (VERDICT r3 item 1: round 3 lost
# its headline artifact to the outage), then stage profiles, then a second bench pass so the round ends
# with a fresh number even if the tunnel drops again.  Logs persist
# under docs/device_r4/ INSIDE the repo so the measurements survive and
# get committed even if no builder session is active at recovery time.
# A step failure does not stop later steps.  NEVER run two of these
# concurrently, and never run another TPU process while one is active.
set -u
cd /root/repo
LOGDIR=docs/device_r4
mkdir -p "$LOGDIR"
ln -sfn /root/repo/$LOGDIR /tmp/devlog 2>/dev/null || true

# Each step is bounded: the tunnel's observed outage mode is an
# indefinite hang at the first dispatch, and an unbounded hung step
# would starve every later step (including bench_final, the round's
# safety net).  Bounds are several x the expected step time, so the
# kill fires only when the tunnel is genuinely wedged — not mid-compile
# on a healthy backend (the CLAUDE.md wedge mode).
run_step() {
  local secs="$1" name="$2"; shift 2
  echo "=== $name: $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/driver.log"
  # Each step holds the repo-level TPU session flock so a concurrently
  # launched graded bench (driver round-end) serializes against us
  # instead of wedging the tunnel; MFCD_TPU_LOCK_HELD tells our own
  # bench.py child not to re-acquire (flock is not reentrant).
  timeout -k 30 "$secs" \
    flock /root/repo/.tpu_session.lock \
    env MFCD_TPU_LOCK_HELD=1 "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "=== $name done rc=$rc $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/driver.log"
  return $rc
}

run_step 1800 canary python -c "import mfcd_tpu; from mfcd_tpu.cache import ensure_cache_healthy; ensure_cache_healthy(); import jax; print(jax.devices())"
run_step 5400 bench python bench.py
run_step 2700 sample_prof python scripts/profile_sample.py
run_step 5400 pipeline_ab python scripts/profile_pipeline_ab.py
run_step 3600 bench_sweep python bench.py --sweep
run_step 5400 bench_final python bench.py

# One judge-readable summary even if no builder session is active at
# recovery: the graded JSON lines plus each decision script's verdict
# tail.  The driver commits docs/device_r4/ at round end.
{
  echo "# Device session r4 — measurement summary ($(date -u +%FT%TZ))"
  echo
  for f in bench bench_sweep bench_final; do
    echo "## $f (JSON line)"
    [ -f "$LOGDIR/$f.log" ] && tail -n 1 "$LOGDIR/$f.log" || echo "(missing)"
    echo
  done
  for f in canary sample_prof pipeline_ab; do
    echo "## $f (tail)"
    [ -f "$LOGDIR/$f.log" ] && tail -n 12 "$LOGDIR/$f.log" || echo "(missing)"
    echo
  done
} > "$LOGDIR/SUMMARY.md"
echo "ALL DONE $(date -u +%H:%M:%S)" | tee -a "$LOGDIR/driver.log"
