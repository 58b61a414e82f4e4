#!/bin/sh
# Regenerate tests/golden_esa/* from the reference gt binary.
# Usage: scripts/regen_golden_esa.sh /path/to/gt
# Build the reference binary out-of-tree first:
#   cp -r /root/reference /tmp/gtref && cd /tmp/gtref &&
#   make cairo=no errorcheck=no threads=yes with-sqlite=no CFLAGS=-fcommon -j16
set -e
GT=${1:-/tmp/gtref/bin/gt}
REPO=$(cd "$(dirname "$0")/.." && pwd)
TD=/root/reference/testdata
for db in Atinsert.fna Duplicate.fna Random.fna Random159.fna Random160.fna \
          TTT-small.fna trna_glutamine.fna small_poly.fas at1MB; do
  w=$(mktemp -d)
  (cd "$w" && "$GT" suffixerator -db "$TD/$db" -indexname idx \
      -suf -lcp -tis -bwt -bck >/dev/null)
  out="$REPO/tests/golden_esa/$db"
  mkdir -p "$out"
  if [ "$db" = at1MB ]; then
    cp "$w"/idx.lcp "$w"/idx.llv "$w"/idx.bck "$w"/idx.prj "$out/"
    gzip -9 -c "$w"/idx.suf > "$out/idx.suf.gz"
    gzip -9 -c "$w"/idx.bwt > "$out/idx.bwt.gz"
  else
    cp "$w"/idx.suf "$w"/idx.lcp "$w"/idx.llv "$w"/idx.bwt "$w"/idx.bck \
       "$w"/idx.prj "$out/"
  fi
  rm -rf "$w"
  echo "$db done"
done
