#!/bin/bash
# Full regression pass: tests + oracle rehearsal at every scale + bench.
# Usage: tools/check_all.sh   (run from /root/repo)
set -e
echo "== sbt test"
sbt test 2>&1 | grep -E "Tests:|All tests|\*\*\*" | head -3
for sf in 0.001 0.01 0.1; do
  echo "== verify sf$sf"
  rm -rf /tmp/chk$sf
  sbt "runMain graft.Verify /root/testdata/sf$sf /tmp/chk$sf" 2>&1 | grep -E "\[verify\]" || true
  python3 tools/oracle_check.py /root/testdata/sf$sf /tmp/chk$sf
done
echo "== bench sf0.1"
# run / outputStrategy = StdoutOutput: the metric line arrives unprefixed
# (older logs had sbt's "[info] " in front — accept both)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Bench" 2>&1 \
  | grep -E '^(\[info\] )?\{"metric"' | tail -1 | sed 's/\[info\] //' \
  | python3 -c "import json,sys; d=json.load(sys.stdin); print('total', round(d['value'],2), 's,', len(d['queries']), 'queries')"
