#!/bin/bash
# Round-4 phase-3 recovery wrapper (supersedes wrapper2, which predated
# the CPU cfg-finetune fallback). The relay tunnel has been down since
# ~2026-08-17 22:10; d1/eval1 and the recon pareto re-run landed on the
# CPU fallback, and a CPU cfg finetune is now grinding (~3.5 h). If the
# relay comes back this wrapper:
#   1. captures bench.py FIRST (VERDICT r03 #1 — bank the number the
#      moment the chip is reachable),
#   2. kills the CPU cfg fallback by exact pid (/tmp/cfg_cpu.pid) — the
#      TPU redoes the finetune in ~15 min from the same seeds,
#   3. runs every still-missing evidence stage in canonical order
#      (cfg sweep gdistill geval),
#   4. final bench.py to refresh bench_last_good.json + warm the
#      compile cache for the driver's end-of-round run.
# Health is probed with a timeout-bounded jax.devices() in a throwaway
# process: bench.py intentionally exits 0 even when the backend is down
# (stale-line contract), so its rc is NOT a health signal.
# Usage: tools/tpu_round4_wrapper3.sh [logfile]
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOG="${1:-/tmp/tpu_r4_phase3.log}"

note() { echo "W3: $* $(date)" >> "$LOG"; }

probe() {
  timeout 600 python -c "
import jax
d = jax.devices()
assert d and d[0].platform != 'cpu', d
print('probe devices:', d)
" >> "$LOG" 2>&1
}

missing_stages() {
  s=""
  [ -d "$REPO/runs/distill1/distilled_1" ] || s="$s d1"
  [ -f "$REPO/docs/results/distill/distill_fidelity_1.json" ] || s="$s eval1"
  [ -d "$REPO/runs/cfg_finetune/ldm_final" ] || s="$s cfg"
  [ -f "$REPO/docs/results/guidance/transfer_eval_g3.json" ] || s="$s sweep"
  [ -d "$REPO/runs/distill_cfg/distilled_6" ] || s="$s gdistill"
  [ -f "$REPO/docs/results/guidance/transfer_eval_gstudent6.json" ] || s="$s geval"
  echo "$s"
}

for attempt in $(seq 1 120); do
  note "attempt $attempt: probing relay"
  if probe; then
    note "relay HEALTHY on attempt $attempt"
    (cd "$REPO" && timeout 1500 python bench.py) >> "$LOG" 2>&1
    note "bench(first) rc=$?"
    # Retire the CPU cfg fallback (exact pid, never by pattern): the TPU
    # path re-runs the finetune from the same teacher + seeds, faster.
    if [ -f /tmp/cfg_cpu.pid ] && kill -0 "$(cat /tmp/cfg_cpu.pid)" 2>/dev/null; then
      note "killing CPU cfg fallback pid $(cat /tmp/cfg_cpu.pid)"
      kill "$(cat /tmp/cfg_cpu.pid)" 2>/dev/null
      sleep 5
      rm -rf "$REPO/runs/cfg_finetune"   # partial CPU state; TPU restarts clean
    fi
    stages="$(missing_stages)"
    if [ -n "$stages" ]; then
      note "stages:$stages"
      python "$REPO/tools/tpu_round4_batch.py" $stages >> "$LOG" 2>&1
      note "stages rc=$?"
    fi
    if [ -z "$(missing_stages)" ]; then
      (cd "$REPO" && timeout 1500 python bench.py) >> "$LOG" 2>&1
      note "bench(final) rc=$? -- ALL DONE"
      exit 0
    fi
    note "stages still missing after healthy attempt; will re-probe"
  else
    note "attempt $attempt: relay still down (probe rc=$?)"
  fi
  sleep 240
done
note "gave up after 120 attempts"
