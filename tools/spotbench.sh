#!/usr/bin/env bash
# Idle re-measurement of a query subset — the adjudication half of
# tools/benchdiff.py (dev tool only).
#
# Usage: tools/spotbench.sh q1,q2,... [SF_DIR] [OUT.json]
#
# Re-runs just the named queries through the real graft.Bench main
# (min-of-3, interleaved passes, per-run load averages) and writes the
# full artifact to OUT.json (default /tmp/spotbench.json). Run it when
# the box is idle; feed the result to benchdiff.py --spot to classify
# each >2x mover as load-artifact or confirmed-regression.
#
# Round-close protocol: after the full bench, run
#   python3 tools/benchdiff.py BENCH_prev.json bench_out.json
# and if it lists movers, spotbench them and re-run benchdiff with
# --spot, committing the adjudication JSON beside the bench artifact.
set -euo pipefail
QUERIES="${1:?usage: spotbench.sh q1,q2,... [SF_DIR] [OUT.json]}"
SF_DIR="${2:-/root/testdata/sf0.1}"
OUT="${3:-/tmp/spotbench.json}"
cd "$(dirname "$0")/.."
echo "spotbench: loadavg before: $(cut -d' ' -f1-3 /proc/loadavg)" >&2
SPARK_GRAFT_SF_DIR="$SF_DIR" \
SPARK_GRAFT_BENCH_RUNS=3 \
SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
SPARK_GRAFT_BENCH_OUT="$OUT" \
  sbt -batch "runMain graft.Bench" >/dev/null 2>&1 || {
    echo "spotbench: Bench run failed" >&2; exit 1; }
echo "spotbench: wrote $OUT" >&2
python3 - "$OUT" <<'EOF'
import json, sys
d = json.loads(open(sys.argv[1]).readline())
for q, v in sorted(d["queries"].items()):
    print(f"{q:36s} min={v:8.3f}  runs={d['runs'][q]}  loads={d['loads'][q]}")
if d.get("errors"):
    print("ERRORS:", d["errors"])
EOF
