#!/bin/bash
# Repo-side correctness artifact: runs the full Verify dump at sf0.01 and
# the DuckDB compare, writing VERIFY_LOCAL.json (per-query rows/schema/hash
# verdicts) at the repo root. Run at round close so an empty driver-side
# CORRECTNESS_r{N}.json can never leave a green round without a
# machine-readable record (round-5 verdict, "What's wrong #1").
set -e
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/verify_local_out}"
rm -rf "$OUT"
sbt --error "runMain graft.Verify $SF $OUT"
python3 tools/compare.py "$SF" "$OUT" --json VERIFY_LOCAL.json
