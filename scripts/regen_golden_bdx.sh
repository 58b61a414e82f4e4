#!/bin/sh
# Regenerate tests/golden_bdx/* from the reference gt binary
# (build recipe: scripts/regen_golden_esa.sh header).
set -e
GT=${1:-/tmp/gtref/bin/gt}
REPO=$(cd "$(dirname "$0")/.." && pwd)
TD=/root/reference/testdata
out="$REPO/tests/golden_bdx"
mkdir -p "$out"
w=$(mktemp -d)
(cd "$w" && "$GT" packedindex mkindex -db "$TD/Atinsert.fna" \
    -indexname default >/dev/null && \
 "$GT" packedindex mkindex -db "$TD/Duplicate.fna" -indexname bsize4 \
    -bsize 4 -blbuck 16 >/dev/null && \
 "$GT" packedindex mkindex -db "$TD/Random.fna" -indexname rev \
    -dir rev >/dev/null && \
 "$GT" packedindex mkindex -db "$TD/TTT-small.fna" -indexname ttt \
    -bsize 6 >/dev/null)
for n in default bsize4 rev ttt; do cp "$w/$n.bdx" "$out/"; done
rm -rf "$w"
