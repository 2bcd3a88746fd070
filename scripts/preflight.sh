#!/usr/bin/env bash
# Round-close preflight (SURVEY §8b rule, made mechanical per VERDICT
# r16 item 8): NO snapshot commit without (1) the full ScalaTest
# suite green and (2) the sf0.001 registry smoke green. Run from the
# repo root; exits non-zero on any failure so it can gate a commit:
#
#   scripts/preflight.sh && git commit ...
#
# The smoke runs every registered entry end-to-end at sf0.001 and
# compares against the DuckDB oracle — the cheapest full-registry
# signal (~2 min). It is NOT a substitute for the sf0.01 driver gate;
# it exists to catch "compiles but throws at runtime" before a
# snapshot ships (the r15 lesson: warehouse_zorder shipped broken
# because the snapshot went out without this).
set -euo pipefail
cd "$(dirname "$0")/.."

SMOKE_SF="${SMOKE_SF:-/root/testdata/sf0.001}"
OUT="$(mktemp -d /tmp/graft_preflight.XXXXXX)"
trap 'rm -rf "$OUT"' EXIT

echo "[preflight] sbt test..."
sbt -batch test

echo "[preflight] registry smoke at $SMOKE_SF..."
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch "runMain graft.Verify $SMOKE_SF $OUT/verify"

echo "[preflight] DuckDB oracle compare..."
python3 scripts/check_oracle.py "$SMOKE_SF" "$OUT/verify"

echo "[preflight] OK — suite green, registry smoke green."
