#!/usr/bin/env bash
# Full local replica of the driver's per-round gate:
#   compile -> scalatest -> Verify@sf0.01 -> DuckDB oracle compare -> Bench@sf0.1
# Usage: tools/gate.sh [--quick]   (--quick skips the bench)
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch test 2>&1 | grep -aE "Tests:|TESTS FAILED" | tail -2

# stale outputs from a prior run must never satisfy the compare
rm -rf target/verify_out
if ! SPARK_GRAFT_CPUS=8 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.01 target/verify_out" \
  > target/verify_run.log 2>&1; then
  tail -5 target/verify_run.log
  echo "verify run crashed"; exit 1
fi
if grep -aE "\[verify\].*failed|\[error\].*\.scala" target/verify_run.log; then
  echo "verify had per-query failures"; exit 1
fi

python3 tools/check_oracle.py /root/testdata/sf0.01 target/verify_out

if [[ "${1:-}" != "--quick" ]]; then
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -ao '{"metric".*'
fi
