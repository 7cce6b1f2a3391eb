#!/bin/bash
# One-shot driver for the round-3 device backlog, run when the axon
# tunnel recovers.  Steps are ordered cheapest-first so an early wedge
# loses the least; each logs to /tmp/devlog/<step>.log and a step
# failure does not stop the later ones (the tunnel can drop transient
# errors between steps).  NEVER run two of these concurrently.
#
#   1. canary       — cache health probe (mfcd_tpu.cache.ensure_cache_healthy)
#   2. smoke        — multi-epoch window kernel compiled smoke (small shapes)
#   3. sample_prof  — sample-stage decomposition at the bench bucket (PRP paths)
#   4. validate     — window kernel CI-overlap validation (16 reps, 2 modes)
#   5. bench        — graded headline (K=1 + K=10 pallas field)
set -u
mkdir -p /tmp/devlog
cd /root/repo

run_step() {
  local name="$1"; shift
  echo "=== $name: $(date -u +%H:%M:%S) ===" | tee -a /tmp/devlog/driver.log
  "$@" > "/tmp/devlog/$name.log" 2>&1
  local rc=$?
  echo "=== $name done rc=$rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/devlog/driver.log
  return $rc
}

run_step canary python -c "import mfcd_tpu; from mfcd_tpu.cache import ensure_cache_healthy; ensure_cache_healthy(); import jax; print(jax.devices())"
run_step smoke python scripts/smoke_multiepoch.py
run_step sample_prof python scripts/profile_sample.py
run_step validate python scripts/validate_multiepoch.py --reps 16
run_step bench python bench.py
echo "ALL DONE $(date -u +%H:%M:%S)" | tee -a /tmp/devlog/driver.log
