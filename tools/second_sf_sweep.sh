#!/bin/sh
# Second-SF oracle sweep runner (VERDICT r14 item 4): dumps the full
# query surface with graft.Verify at a NON-gate scale factor, then runs
# the rows+schema+hash compare with the documented whitelist, writing a
# CORRECTNESS_2SF-style artifact.
#
# Usage: tools/second_sf_sweep.sh [sfDir] [outJson]
# Defaults: sfDir=/root/testdata/sf0.001  outJson=CORRECTNESS_2SF.json
set -eu
SF_DIR="${1:-/root/testdata/sf0.001}"
OUT_JSON="${2:-CORRECTNESS_2SF.json}"
DUMP_DIR="$(mktemp -d /tmp/graft_2sf.XXXXXX)"
cd "$(dirname "$0")/.."
sbt "runMain graft.Verify $SF_DIR $DUMP_DIR"
python3 tools/second_sf_sweep.py "$SF_DIR" "$DUMP_DIR" "$OUT_JSON"
