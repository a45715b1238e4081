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
SF001=/root/testdata/sf0.001
SF01=/root/testdata/sf0.01

run() { # tool, record, extra args...
  tool="$1"; rec="$2"; shift 2
  echo "=== $tool -> $rec"
  python "tools/$tool" "$@" 2>&1 | tail -2
}

# sf0.001 tier (the default SRC_SF_DIR for every tool)
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
