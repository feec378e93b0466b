#!/bin/bash
# Round-4 TPU recovery wrapper: retries tools/tpu_round4_batch.py through
# relay tunnel outages (observed: UNAVAILABLE fast-fails AND 25-minute
# hangs in client INIT). Each attempt only runs stages whose artifacts
# are missing, so completed work is never redone. No timeout-kill on a
# live attempt: relay INIT varies 24s-25min and stages run long; a hung
# attempt dies on its own. Ends with a real bench.py run to warm the
# compile cache and refresh docs/results/bench_last_good.json.
# Usage: tools/tpu_round4_wrapper.sh [logfile]
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOG="${1:-/tmp/tpu_batch_r4.log}"
for attempt in $(seq 1 60); do
  stages=""
  [ -d "$REPO/runs/distill1/distilled_1" ] || stages="$stages d1"
  [ -f "$REPO/docs/results/distill/distill_fidelity_1.json" ] || stages="$stages eval1"
  [ -d "$REPO/runs/cfg_finetune/ldm_final" ] || stages="$stages cfg"
  [ -f "$REPO/docs/results/guidance/transfer_eval_g3.json" ] || stages="$stages sweep"
  [ -d "$REPO/runs/distill_cfg/distilled_6" ] || stages="$stages gdistill"
  [ -f "$REPO/docs/results/guidance/transfer_eval_gstudent6.json" ] || stages="$stages geval"
  [ -f "$REPO/docs/results/sweep/transfer_eval_t120_half.json" ] || stages="$stages pareto"
  [ -f "$REPO/docs/results/fullscale/generate_eval_c3.json" ] || stages="$stages gen"
  if [ -z "$stages" ]; then
    echo "WRAPPER4: all stages complete $(date)" >> "$LOG"
    break
  fi
  echo "WRAPPER4: attempt $attempt stages:$stages $(date)" >> "$LOG"
  python "$REPO/tools/tpu_round4_batch.py" $stages >> "$LOG" 2>&1
  rc=$?
  echo "WRAPPER4: attempt $attempt rc=$rc $(date)" >> "$LOG"
  [ $rc -eq 0 ] && break
  sleep 300
done
echo "WRAPPER4: bench warm+capture $(date)" >> "$LOG"
cd "$REPO" && timeout 900 python bench.py >> "$LOG" 2>&1
echo "WRAPPER4: bench rc=$? $(date)" >> "$LOG"
