#!/bin/bash
# Round-4 hardware measurement campaign. Run when the axon tunnel is up.
# Each step runs in its own subprocess (relay connection poisoning:
# benchmarks/RESULTS.md) and appends to the log; a step failing does not
# stop the campaign. Results feed the round-4 decisions:
#   - WIDE_DISPATCH_MIN_TAPS  (ops/pallas_resample.py, crossover: step 2)
#   - WIDE_PIPELINE_ENABLED   (ops/pallas_resample.py, steps 3-4)
#   - CR_SCAN_PIPELINE default (benchmarks/run_all.py config 7, step 5)
#   - RESULTS.md config-9 row + headline reconcile (steps 6-7)
LOG=${1:-/tmp/hw_campaign.log}
cd "$(dirname "$0")/.."
run() {
  local name=$1; shift
  echo "=== $name @ $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? @ $(date -u +%H:%M:%S)" | tee -a "$LOG"
}
TMO=900  run step1-verify      python tools/verify_tpu.py
TMO=1500 run step2-crossover   python tools/probe_midwide.py time 2048
TMO=900  run step3-dmasplit    python tools/probe_midwide.py dmasplit 1024
TMO=1200 run step4-widepipe    python tools/probe_midwide.py pipeline 1024
TMO=900  run step5-scan-nopipe env CR_SCAN_PIPELINE=0 python benchmarks/run_all.py --config 7
TMO=900  run step5-scan-pipe   env CR_SCAN_PIPELINE=1 python benchmarks/run_all.py --config 7
TMO=900  run step6-config9     python benchmarks/run_all.py --config 9
TMO=900  run step7-headline    python bench.py
echo "CAMPAIGN DONE @ $(date -u)" | tee -a "$LOG"
