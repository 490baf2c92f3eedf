#!/bin/bash
# Steal-gated bench probe: waits for a quiet window (machine steal < 0.5%
# over 10 s), then runs a SPARK_GRAFT_ONLY bench probe; if the result has
# any `contended` query, waits and retries (up to 6 attempts).
# Usage: tools/probe.sh <out.json> <comma-query-list> [sfdir] [cpus]
set -u
OUT=$1; QUERIES=$2; SF=${3:-/root/testdata/sf0.1}; CPUS=${4:-32}
steal() {
  python3 - <<'EOF'
import time
def t():
    n=[int(x) for x in open('/proc/stat').readline().split()[1:]]
    return n[7], sum(n)
s0,t0=t(); time.sleep(10); s1,t1=t()
print(f"{100*(s1-s0)/(t1-t0):.3f}")
EOF
}
for attempt in $(seq 1 6); do
  while true; do
    S=$(steal)
    echo "[probe] steal=${S}%"
    python3 -c "import sys; sys.exit(0 if float('$S') < 0.5 else 1)" && break
    echo "[probe] contended box, waiting 60s"; sleep 60
  done
  # ADVICE r19: remove any stale output first and gate on sbt's exit code,
  # so a crashed run can never be parsed as a clean previous result
  rm -f "$OUT"
  SPARK_GRAFT_ONLY=$QUERIES SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$CPUS \
    SPARK_GRAFT_BENCH_OUT=$OUT sbt -batch "runMain graft.Bench" \
    > ${OUT%.json}.log 2>&1
  if [ $? -ne 0 ] || [ ! -s "$OUT" ]; then
    echo "[probe] sbt failed or no output (see ${OUT%.json}.log)"; exit 2
  fi
  python3 - "$OUT" <<'EOF'
import json,sys
d=json.load(open(sys.argv[1]))
bad=d.get('contended') or {}
errs=d.get('errors') or {}
if errs: print('[probe] ERRORS:', errs); sys.exit(2)
if bad: print('[probe] contended:', list(bad)); sys.exit(1)
print('[probe] clean; total', round(d['value'],3))
for k,v in sorted(d['queries'].items()): print(f"  {k:32s} {v:7.3f}")
sys.exit(0)
EOF
  rc=$?
  [ $rc -eq 0 ] && exit 0
  [ $rc -eq 2 ] && exit 2
  echo "[probe] retry $attempt"
done
echo "[probe] gave up after 6 attempts"; exit 1
