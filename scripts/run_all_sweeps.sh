#!/bin/bash
# Sequential execution of the faithful Runs.ipynb grids on the real chip.
# One TPU process at a time (CLAUDE.md rule); each step is independent and
# logs its own outcome, so a failure doesn't cascade.  Pickles land in the
# reference's own directory layout (Data_final/, Data_strategies/).
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
LOG=${LOG:-/tmp/all_sweeps.log}

run_step() {
  # Up to 3 process-level attempts: a FAILED_PRECONDITION tunnel wedge is
  # sticky for the process that hit it but clears for a fresh process
  # after a few minutes (observed round 2).  Every sweep runs --resume,
  # so re-attempts only redo what is missing.
  local name="$1"; shift
  local attempt
  for attempt in 1 2 3; do
    echo "=== STEP $name start (attempt $attempt) $(date +%H:%M:%S) ===" >> "$LOG"
    if "$@" >> "$LOG" 2>&1; then
      echo "=== STEP $name OK $(date +%H:%M:%S) ===" >> "$LOG"
      return 0
    fi
    echo "=== STEP $name attempt $attempt failed rc=$? $(date +%H:%M:%S) ===" >> "$LOG"
    [ "$attempt" -lt 3 ] && sleep 180
  done
  echo "=== STEP $name FAILED $(date +%H:%M:%S) ===" >> "$LOG"
}

mkdir -p Data_final Data_strategies Data_generation

# Non-base generators at production scale (VERDICT item 4b).  All steps
# run with --resume: completed configurations are skipped, partial pickles
# are finished rather than trusted, so the pipeline is idempotent and
# survives transient tunnel failures.
run_step generation_s python -m experiments.runs generation_s_sweep --fast \
  --resume --out Data_generation/run_vs_s_K1_generation

# Cell 18: strategies x p, soft labels.
run_step cell18 python -m experiments.runs strategies_p_sweep --fast --resume \
  --out Data_strategies/run_vs_p

# Cell 3: s x p x wd grid (faithful p list), soft labels.
run_step cell3 python -m experiments.runs s_p_sweep --fast --resume \
  --out Data_final/scan_K1_fixedLR_varS_varP_full_4.pkl

# Cells 21 + 23: ground-truth-only scans.
run_step cell21 python -m experiments.runs gt_p_k_sweep \
  --out Data_final/gt_scan_s5_Ksweep_pSweep_n1000.pkl
run_step cell23 python -m experiments.runs gt_d_s_sweep \
  --out Data_final/scan_d_s_gt.pkl

# Cell 9: p x K at s=5, soft labels.
run_step cell9 python -m experiments.runs p_k_sweep --fast --resume \
  --out Data_final/scan_pK_Final.pkl

# Cell 7: p*K constants (linear), soft labels, pxK enrichment.
run_step cell7 python -m experiments.runs pk_const_sweep --fast --resume \
  --out Data_final/scan_pK_constant_Final_s_wd_sweep.pkl

# Cell 11: p*s constants (linear), soft labels.
run_step cell11 python -m experiments.runs ps_const_sweep --fast --resume \
  --out Data_final/scan_ps_constant_Final.pkl

# Cell 13: p x d.
run_step cell13 python -m experiments.runs p_d_sweep --fast --resume \
  --out Data_final/p_d_1.pkl

# Cell 16: strategies x s.
run_step cell16 python -m experiments.runs strategies_s_sweep --fast \
  --resume --out Data_strategies/run_vs_s_K1

# Cell 5 last (the heavyweight: K up to 50, ~4M-row buckets).
run_step cell5 python -m experiments.runs s_k_sweep --fast --resume \
  --out Data_final/scan_K_logspaceS_wdScan_p0.2_centered_soft_label_True_2.pkl

# Corruption audit: cross-check every result row against its own GT
# oracle (catches silently-zeroed training data from a sick worker).
run_step audit env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
  python scripts/audit_sweep.py 'Data_final/*.pkl' 'Data_strategies/*.pkl' \
  'Data_generation/*.pkl'

# Regenerate every report figure from the pickles now on disk (CPU-only).
run_step figures bash scripts/make_all_figures.sh

echo "=== ALL STEPS DONE $(date +%H:%M:%S) ===" >> "$LOG"
