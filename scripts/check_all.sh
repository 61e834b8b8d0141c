#!/usr/bin/env bash
# Run every reference scene full-length and validate BOTH output files for
# all four grids: av_vels against the reference goldens, final_state against
# the reference's where present (128x128, 128x256) and against our
# regenerated regression goldens (256x256, 1024x1024 — stripped from the
# mirror, .MISSING_LARGE_BLOBS).
set -euo pipefail
cd "$(dirname "$0")/.."
source scripts/env.sh

REF=${LBM_REFERENCE:-/root/reference}
OUT=$(mktemp -d)
trap 'rm -rf "$OUT"' EXIT

fail=0
for grid in 128x128 128x256 256x256 1024x1024; do
    echo "=== $grid ==="
    python -m lbm_tpu run "$REF/dataSet/input_$grid.params" \
        "$REF/dataSet/obstacles_$grid.dat" --out-dir "$OUT/$grid" \
        | grep -E "==done==|Compute time|Compute rate"

    ref_fs="$REF/check/$grid.final_state.dat"
    if [ ! -f "$ref_fs" ] && [ -f "golden/$grid.final_state.dat.gz" ]; then
        ref_fs="golden/$grid.final_state.dat.gz"   # regenerated regression golden
    fi
    if [ ! -f "$ref_fs" ]; then
        echo "missing final_state golden for $grid (reference and golden/)" >&2
        exit 1
    fi
    python -m lbm_tpu check \
        --ref-av-vels-file "$REF/check/$grid.av_vels.dat" \
        --ref-final-state-file "$ref_fs" \
        --av-vels-file "$OUT/$grid/av_vels.dat" \
        --final-state-file "$OUT/$grid/final_state.dat" | tail -1 || fail=1
done
exit $fail
