#!/usr/bin/env bash
# Full release check: suite (fresh clone), multi-chip dryrun, bench.
# Usage: tools/release_check.sh
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
TMP=$(mktemp -d)
echo "== fresh-clone test suite =="
git clone -q "$REPO" "$TMP/clone"
(cd "$TMP/clone" && python -m pytest tests/ -q)
echo "== multi-chip dryrun (8 virtual devices) =="
(cd "$TMP/clone" && XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)")
echo "== headline bench (real accelerator) =="
(cd "$REPO" && python bench.py)
echo "release check PASSED"
