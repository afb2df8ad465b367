#!/usr/bin/env bash
# Bench-line artifact gate: proves the EXACT failure mode that shipped
# "parsed": null in BENCH_r01..r06 is gone, by doing what the driver does —
# run the real `sbt -batch "runMain graft.Bench"` (forked JVM, full sbt
# logging around it), capture combined stdout+stderr, take the LAST 2000
# characters, and require that some line in that tail starts with '{' and
# json-parses with the expected bench keys. Runs a 2-query registry slice
# at sf0.01 with reps=1 so the gate costs ~1 min, not 25.
#
# Rounds 1-5 failed this because the compact line was too big for the tail;
# round 6 failed it because `run / fork := true` used sbt's default
# LoggedOutput strategy, which prefixed the line with "[error] ".
# build.sbt now sets `run / outputStrategy := Some(OutputStrategy.StdoutOutput)`.
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=$(mktemp /tmp/graft_bench_tail.XXXX)

SPARK_GRAFT_SF_DIR="$SF" \
SPARK_GRAFT_BENCH_ONLY="q01,q02" \
SPARK_GRAFT_BENCH_REPS=1 \
SPARK_GRAFT_BENCH_OUT=/tmp/graft_bench_gate_result.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -c 2000 > "$OUT"

python3 - "$OUT" <<'EOF'
import json, sys
tail = open(sys.argv[1], encoding="utf-8", errors="replace").read()
parsed = None
for line in tail.splitlines():
    line = line.strip()
    if line.startswith("{"):
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if obj.get("metric") == "total":
            parsed = obj
if parsed is None:
    print("FAIL: no bare JSON bench line inside the last 2000 chars of the")
    print("combined sbt output. Tail was:")
    print(tail)
    sys.exit(1)
for key in ("metric", "value", "unit", "min_total", "queries", "sf"):
    assert key in parsed, f"FAIL: bench line missing key {key}: {parsed}"
assert parsed["unit"] == "sec", parsed
assert parsed["n_queries"] >= 1, parsed
print("OK: bench line parses from the 2000-char tail of a real sbt run:")
print(json.dumps({k: parsed[k] for k in ("metric","value","n_queries","contended")}))
EOF
