#!/usr/bin/env bash
# Driver-contract rehearsal: mirror EXACTLY what the round driver runs,
# and write release_check_report.json (rc + tails, committed with the
# end-of-round snapshot) so the judge can see all three contracts were
# green on the final commit (VERDICT r03 #4).
#
#   1. fresh-clone test suite        (the judge re-runs pytest on a clone)
#   2. dryrun_multichip(8)           (same __graft_entry__ import the
#                                     driver uses, 8 virtual CPU devices)
#   3. timeout 600 python bench.py   (driver invocation; scratch compile
#                                     cache for cold-cache realism —
#                                     override with RELEASE_CHECK_WARM=1
#                                     to rehearse the driver's warm run)
#
# All stages run even if an earlier one fails; the report records each.
# Usage: tools/release_check.sh [report_path]
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REPORT="${1:-$REPO/release_check_report.json}"
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

run_stage() { # name, logfile, cmd...
  local name="$1" logf="$2"; shift 2
  echo "== $name =="
  ("$@") >"$logf" 2>&1
  local rc=$?
  echo "   rc=$rc"
  tail -5 "$logf" | sed 's/^/   | /'
  return $rc
}

echo "== fresh clone =="
git clone -q "$REPO" "$TMP/clone"

run_stage "fresh-clone test suite" "$TMP/suite.log" \
  bash -c "cd '$TMP/clone' && python -m pytest tests/ -q"
SUITE_RC=$?

run_stage "multi-chip dryrun (8 virtual devices)" "$TMP/dryrun.log" \
  bash -c "cd '$TMP/clone' && XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -c 'import __graft_entry__ as g; g.dryrun_multichip(8)'"
DRYRUN_RC=$?

run_stage "doc-artifact consistency" "$TMP/docs.log" \
  bash -c "cd '$TMP/clone' && python tools/check_doc_artifacts.py"
DOCS_RC=$?

BENCH_ENV=""
if [ "${RELEASE_CHECK_WARM:-0}" != "1" ]; then
  BENCH_ENV="MSTLDM_COMPILE_CACHE=$TMP/cold_cache"
fi
run_stage "headline bench (driver contract: timeout 600)" "$TMP/bench.log" \
  bash -c "cd '$REPO' && env $BENCH_ENV timeout 600 python bench.py"
BENCH_RC=$?

python - "$REPORT" "$TMP" "$SUITE_RC" "$DRYRUN_RC" "$BENCH_RC" "$DOCS_RC" <<'EOF'
import json, sys, time
from pathlib import Path

report_path, tmp, suite_rc, dryrun_rc, bench_rc, docs_rc = sys.argv[1:7]
tmp = Path(tmp)

def tail(name, n=15):
    try:
        return "\n".join((tmp / name).read_text().splitlines()[-n:])
    except Exception:
        return ""

parsed = None
for line in reversed(tail("bench.log", 500).splitlines()):
    try:
        cand = json.loads(line)
        if isinstance(cand, dict) and "value" in cand:
            parsed = cand
            break
    except Exception:
        continue

report = {
    "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    "suite": {"rc": int(suite_rc), "tail": tail("suite.log", 5)},
    "dryrun": {"rc": int(dryrun_rc), "tail": tail("dryrun.log", 5)},
    "bench": {"rc": int(bench_rc), "parsed": parsed,
              "stale": bool(parsed.get("stale")) if parsed else None,
              "tail": tail("bench.log", 15)},
    "doc_artifacts": {"rc": int(docs_rc), "tail": tail("docs.log", 8)},
}
report["pass"] = (report["suite"]["rc"] == 0 and report["dryrun"]["rc"] == 0
                  and report["bench"]["rc"] == 0 and parsed is not None
                  and not report["bench"]["stale"]
                  and report["doc_artifacts"]["rc"] == 0)
Path(report_path).write_text(json.dumps(report, indent=1) + "\n")
print(f"report -> {report_path}  pass={report['pass']}")
EOF

if [ "$SUITE_RC" -eq 0 ] && [ "$DRYRUN_RC" -eq 0 ] && [ "$BENCH_RC" -eq 0 ] \
   && [ "$DOCS_RC" -eq 0 ]; then
  if grep -q '"pass": true' "$REPORT"; then
    echo "release check PASSED"
  else
    # All contracts held (rc=0, parseable line) but the bench line is the
    # banked stale record — the relay was down/hung during the run.  The
    # capture contract explicitly allows this; re-run when the relay is
    # healthy to land a fresh-measurement report (pass=true).
    echo "release check PASSED with STALE BENCH (relay down during the run)"
  fi
else
  echo "release check FAILED (suite=$SUITE_RC dryrun=$DRYRUN_RC bench=$BENCH_RC docs=$DOCS_RC)"
  exit 1
fi
