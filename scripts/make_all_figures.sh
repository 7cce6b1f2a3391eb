#!/bin/bash
# Regenerate every report figure from whichever sweep pickles are present.
# CPU-only (matplotlib/numpy); safe to run while a TPU sweep is in flight.
set -u
cd /root/repo
RUN="env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python -m experiments.plots"

fig() {
  local kind="$1" pkl="$2"; shift 2
  # strategy_figures / generation_figures take a glob; test the expansion.
  if compgen -G "$pkl" > /dev/null; then
    echo ">> $kind  $pkl"
    $RUN "$kind" --pickle "$pkl" "$@" || echo "!! $kind failed on $pkl"
  fi
}

fig s_sweep_figures      Data_final/scan_K1_fixedLR_varS_varP_full_4.pkl
fig per_row_diagnostics  Data_final/scan_K1_fixedLR_varS_varP_full_4.pkl
fig heatmaps             Data_final/scan_K1_fixedLR_varS_varP_full_4.pkl
fig loss_curves          Data_final/scan_K1_fixedLR_varS_varP_full_4.pkl
fig s_sweep_figures      "Data_final/scan_K_logspaceS_wdScan_p0.2_centered_soft_label_True_2.pkl"
fig p_sweep_figures      Data_final/scan_pK_Final.pkl
fig p_sweep_figures      Data_final/scan_pK_constant_Final_s_wd_sweep.pkl \
                         --derived pxK --tag pk_const
fig p_sweep_figures      Data_final/scan_ps_constant_Final.pkl \
                         --derived 'p*s' --tag ps_const
fig heatmaps             Data_final/p_d_1.pkl --param-x p --param-y d
fig strategy_figures     "Data_strategies/run_vs_s_K1_*.pkl"
fig strategy_figures     "Data_strategies/run_vs_p_*.pkl"
fig generation_figures   "Data_generation/run_vs_s_K1_generation_*.pkl"
fig gt_figures           Data_final/gt_scan_s5_Ksweep_pSweep_n1000.pkl
fig gt_figures           Data_final/scan_d_s_gt.pkl
