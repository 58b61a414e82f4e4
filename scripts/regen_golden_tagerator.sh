#!/bin/sh
# Regenerate tests/golden_tagerator/* from the reference gt binary.
# Usage: scripts/regen_golden_tagerator.sh /path/to/gt
# (build the reference out-of-tree first; see regen_golden_esa.sh)
set -e
GT=${1:-/tmp/gtref/bin/gt}
REPO=$(cd "$(dirname "$0")/.." && pwd)
OUT="$REPO/tests/golden_tagerator"
W=$(mktemp -d)
cd "$W"
"$GT" suffixerator -db /root/reference/testdata/Atinsert.fna \
    -indexname sfx -dna -suf -tis -lcp -ssp -pl >/dev/null
cp "$OUT/tags.fna" tags.fna
run() {
  name=$(echo "$*" | tr ' ,' '__' | tr -d '-')
  "$GT" tagerator "$@" -q tags.fna -esa sfx > "$OUT/golden_$name.txt"
}
run -e 0
run -e 1
run -e 2
run -e 2 -best
run -e 1 -maxocc 5
run -e 1 -nop
run -e 1 -nod
run -e 1 -output tagnum tagseq dblength dbstartpos strand edist
rm -rf "$W"
echo regenerated
