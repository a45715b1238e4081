#!/bin/sh
# Run the full standing robustness matrix (SURVEY §5) for one round,
# writing every record the cadence rule requires:
#   sh tools/run_sweep_matrix.sh r14
# Sweeps are correctness gates (not timing-sensitive), so tiers run
# sequentially here but the script is safe to parallelize by hand
# (one sweep per shell) on an otherwise idle host.
set -eu
R="${1:?usage: run_sweep_matrix.sh rNN}"
cd "$(dirname "$0")/.."
# Historical naming note: the `_sf001_` suffix on starred-tier records
# denotes the sf0.01 DIRECTORY below (the suffix predates the second
# tier and was kept so round-over-round records diff cleanly).
SF01=/root/testdata/sf0.01

# One script-level trap cleans the current capture file on ANY exit
# (normal, set -eu failure, or signal) — without it an interrupted
# sweep leaks a mktemp file per run (ADVICE r15).
tmp=""
trap 'rm -f "$tmp"' EXIT INT TERM

run() { # tool, record, extra args...
  tool="$1"; rec="$2"; shift 2
  echo "=== $tool -> $rec"
  # Capture to a temp file and tail AFTER checking the exit status:
  # piping the tool through `| tail` would make the pipeline's status
  # tail's, so `set -eu` would never see a crashed sweep and the
  # matrix would print 'complete' over a missing/stale record.
  tmp="$(mktemp)"
  if ! python "tools/$tool" "$@" > "$tmp" 2>&1; then
    echo "FAILED: $tool ($rec) — last output:" >&2
    tail -20 "$tmp" >&2
    rm -f "$tmp"
    exit 1
  fi
  tail -2 "$tmp"
  rm -f "$tmp"
}

# sf0.001 tier (the default SRC_SF_DIR for every tool)
# plan lint first: builds EVERY registry key's executed plan and
# applies the mechanized multi-scan audit rule (VERDICT r15 ask #1)
run plan_lint.py         bench/PLANLINT_${R}.json   --build --json bench/PLANLINT_${R}.json
run degenerate_check.py  bench/DEGENERATE_${R}.json --json bench/DEGENERATE_${R}.json
run null_check.py        bench/NULLSWEEP_${R}.json  --json bench/NULLSWEEP_${R}.json
run partition_check.py   bench/PARTITIONSWEEP_${R}.json --json-out bench/PARTITIONSWEEP_${R}.json
run dirtytext_check.py   bench/DIRTYTEXT_${R}.json  --json-out bench/DIRTYTEXT_${R}.json
run extremes_check.py    bench/EXTREMES_${R}.json   --gated --json bench/EXTREMES_${R}.json
run kitchensink_check.py bench/KITCHENSINK_${R}.json --json bench/KITCHENSINK_${R}.json
run timeedge_check.py    bench/TIMEEDGE_PROBE_${R}.json --json bench/TIMEEDGE_PROBE_${R}.json
run timeedge_check.py    bench/TIMEEDGE_relational_${R}.json --surface relational --json bench/TIMEEDGE_relational_${R}.json

# sf0.01 tier (starred sweeps, SURVEY §5)
export SPARK_GRAFT_SF_DIR="$SF01"
run degenerate_check.py  bench/DEGENERATE_sf001_${R}.json --json bench/DEGENERATE_sf001_${R}.json
run null_check.py        bench/NULLSWEEP_sf001_${R}.json  --json bench/NULLSWEEP_sf001_${R}.json
run dirtytext_check.py   bench/DIRTYTEXT_sf001_${R}.json  --json-out bench/DIRTYTEXT_sf001_${R}.json
run extremes_check.py    bench/EXTREMES_sf001_${R}.json   --gated --json bench/EXTREMES_sf001_${R}.json
run kitchensink_check.py bench/KITCHENSINK_sf001_${R}.json --json bench/KITCHENSINK_sf001_${R}.json
run timeedge_check.py    bench/TIMEEDGE_sf001_${R}.json   --json bench/TIMEEDGE_sf001_${R}.json
run timeedge_check.py    bench/TIMEEDGE_relational_sf001_${R}.json --surface relational --json bench/TIMEEDGE_relational_sf001_${R}.json
echo "matrix complete for $R"
