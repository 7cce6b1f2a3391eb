#!/bin/bash
# Follow-up TPU work chained after scripts/run_all_sweeps.sh: waits for the
# pipeline process to exit, then runs the extended non-base generator sweep
# (modes with existing pickles are skipped by the sweep itself) and
# regenerates figures.  Single TPU process at a time throughout.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
LOG=${LOG:-/tmp/followup_sweeps.log}
WAIT_PID=${WAIT_PID:-}

if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID to exit..." >> "$LOG"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

run_step() {
  local name="$1"; shift
  echo "=== STEP $name start $(date +%H:%M:%S) ===" >> "$LOG"
  if "$@" >> "$LOG" 2>&1; then
    echo "=== STEP $name OK $(date +%H:%M:%S) ===" >> "$LOG"
  else
    echo "=== STEP $name FAILED rc=$? $(date +%H:%M:%S) ===" >> "$LOG"
  fi
}

# Cell 7 died mid-sweep on a transient tunnel error (64/252 configs on
# disk); --resume completes the remainder and re-applies the pxK
# enrichment.
run_step cell7_resume python -m experiments.runs pk_const_sweep --fast \
  --resume --out Data_final/scan_pK_constant_Final_s_wd_sweep.pkl

# Cell 5 is the multi-hour heavyweight; a resume pass is a no-op when the
# main pipeline finished it and completes the remainder if it was cut
# short by a transient failure.
run_step cell5_resume python -m experiments.runs s_k_sweep --fast \
  --resume --out "Data_final/scan_K_logspaceS_wdScan_p0.2_centered_soft_label_True_2.pkl"

run_step generation_all python -m experiments.runs generation_s_sweep --fast \
  --out Data_generation/run_vs_s_K1_generation

run_step figures bash scripts/make_all_figures.sh

echo "=== FOLLOWUP DONE $(date +%H:%M:%S) ===" >> "$LOG"
