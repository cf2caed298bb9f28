#!/usr/bin/env bash
# The round ritual: full driver gate (Verify dump + DuckDB compare) at
# ALL THREE scale factors, serially — distribution-dependent oracle bugs
# are invisible at a single SF (round 6 caught three at sf0.1 alone).
# Run with NOTHING else touching sbt or executing queries: IO queries
# write their read-back artifacts at frame-construction time, and a
# concurrent suite can clobber an artifact between a leg's dump and its
# compare (SCALE.md "gate-concurrency lesson").
#
# Usage: tools/sweep.sh [outdir-prefix]   (default /tmp/vsweep)
set -euo pipefail
cd "$(dirname "$0")/.."
prefix="${1:-/tmp/vsweep}"
for sf in sf0.001 sf0.01 sf0.1; do
  out="${prefix}_${sf}"
  rm -rf "$out"
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
    sbt -batch "runMain graft.Verify /root/testdata/$sf $out" \
    > "${out}.log" 2>&1
  python3 tools/check_oracle.py "/root/testdata/$sf" "$out" \
    > "${out}.oracle.txt" 2>&1 || true
  echo "=== $sf: $(grep -c '^OK ' "${out}.oracle.txt" || true) OK / $(grep -c '^FAIL' "${out}.oracle.txt" || true) FAIL  (${out}.oracle.txt)"
done
