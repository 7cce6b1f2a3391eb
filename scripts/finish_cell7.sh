#!/bin/bash
# Round-3 completion pipeline for Runs.ipynb cell 7 (VERDICT r2 item 1):
# resume the p*K-constant grid to 252/252 configs, audit the pickle, and
# regenerate the pxK figure set.  Idempotent — every step resumes/skips
# what already exists; safe to re-run after any failure.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
LOG=${LOG:-/tmp/cell7.log}
PKL=Data_final/scan_pK_constant_Final_s_wd_sweep.pkl

run_step() {
  # Up to 5 process-level attempts: a FAILED_PRECONDITION tunnel wedge is
  # sticky per process but clears for a fresh one after a few minutes;
  # ensure_cache_healthy() inside experiments.runs self-heals a poisoned
  # persistent cache at process start.
  local name="$1"; shift
  local attempt
  for attempt in 1 2 3 4 5; do
    echo "=== STEP $name start (attempt $attempt) $(date +%H:%M:%S) ===" >> "$LOG"
    if "$@" >> "$LOG" 2>&1; then
      echo "=== STEP $name OK $(date +%H:%M:%S) ===" >> "$LOG"
      return 0
    fi
    echo "=== STEP $name attempt $attempt failed rc=$? $(date +%H:%M:%S) ===" >> "$LOG"
    [ "$attempt" -lt 5 ] && sleep 180
  done
  echo "=== STEP $name FAILED $(date +%H:%M:%S) ===" >> "$LOG"
  return 1
}

run_step cell7 python -m experiments.runs pk_const_sweep --fast --resume \
  --out "$PKL" || exit 1

# Corruption audit (dying-worker signature: chance accuracy + ln2 loss
# while the config's own GT oracle is high).
run_step audit python scripts/audit_sweep.py "$PKL" || exit 1

# Count check: 252 configs expected.
python - <<EOF >> "$LOG" 2>&1 || exit 1
import pickle
res = pickle.load(open("$PKL", "rb"))
print("cell7 configs:", len(res))
assert len(res) == 252, len(res)
assert all("pxK" in e["params"] for e in res)
EOF

# Figures: Plots.ipynb cells 17-19 equivalents (accuracy/error vs pxK).
# Figures are numpy/matplotlib only — strip the axon sitecustomize so a
# wedged tunnel can't hang the plotting step, and pin the CPU backend.
run_step figures env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
  python -m experiments.plots \
  p_sweep_figures --pickle "$PKL" --derived pxK --tag _pxK_const

echo "=== CELL 7 PIPELINE COMPLETE $(date +%H:%M:%S) ===" >> "$LOG"
