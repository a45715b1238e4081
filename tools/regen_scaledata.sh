#!/usr/bin/env bash
# One-command regeneration of the gitignored scale corpora
# (SCALE.md; VERDICT r6 ask #8). Safe to run from a fresh checkout:
#
#   tools/regen_scaledata.sh              # all corpora, skip existing
#   tools/regen_scaledata.sh --force      # rebuild even if present
#   tools/regen_scaledata.sh --only sf1   # just one corpus
#
# SCALEDATA_ROOT overrides the output root (default <repo>/.scaledata)
# — used by the self-test; SPARK-side tests and bench tooling read the
# default location.
set -euo pipefail

repo="$(cd "$(dirname "$0")/.." && pwd)"
root="${SCALEDATA_ROOT:-$repo/.scaledata}"
src="/root/testdata/sf0.1"
force=0
only=""
while [[ $# -gt 0 ]]; do
  case "$1" in
    --force) force=1 ;;
    --only) only="$2"; shift ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
  shift
done

gen() { # name replicas extra-args...
  local name="$1" replicas="$2"; shift 2
  if [[ -n "$only" && "$only" != "$name" ]]; then return; fi
  local dest="$root/$name"
  if [[ -d "$dest" && "$force" != 1 ]]; then
    echo "[skip] $dest exists (use --force to rebuild)"
    return
  fi
  rm -rf "$dest"
  echo "[gen ] $dest (${replicas}x $src $*)"
  python "$repo/tools/gen_scale_data.py" "$src" "$dest" "$replicas" "$@"
}

gen sf1 10
gen sf1skew 10 --skew
gen sf3 30
gen sf10 100
echo "done: $(du -sh "$root" 2>/dev/null | cut -f1) under $root"
