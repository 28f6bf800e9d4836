#!/bin/sh
# Second-SF oracle sweep runner (VERDICT r14 item 4): dumps the full
# query surface with graft.Verify at a NON-gate scale factor, then runs
# the rows+schema+hash compare with the documented whitelist, writing a
# CORRECTNESS_2SF-style artifact.
#
# Usage: tools/second_sf_sweep.sh [sfDir] [outJson]
# Defaults: sfDir=/root/testdata/sf0.001  outJson=CORRECTNESS_2SF.json
# Relative args resolve against the CALLER's cwd (captured before the
# cd into the repo root that sbt needs); the temp dump dir is removed
# on exit.
set -eu
SF_DIR="$(cd "${1:-/root/testdata/sf0.001}" && pwd)"
OUT_JSON="${2:-CORRECTNESS_2SF.json}"
case "$OUT_JSON" in /*) ;; *) OUT_JSON="$PWD/$OUT_JSON" ;; esac
DUMP_DIR="$(mktemp -d /tmp/graft_2sf.XXXXXX)"
trap 'rm -rf "$DUMP_DIR"' EXIT
cd "$(dirname "$0")/.."
sbt "runMain graft.Verify $SF_DIR $DUMP_DIR"
python3 tools/second_sf_sweep.py "$SF_DIR" "$DUMP_DIR" "$OUT_JSON"
