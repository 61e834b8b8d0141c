#!/usr/bin/env bash
# Run every reference scene full-length and validate against all golden data
# the mirror provides (av_vels for all four grids; final_state for 128x128
# and 128x256; our regenerated 256x256 final_state regression golden).
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
    if [ -f "$ref_fs" ]; then
        python -m lbm_tpu check \
            --ref-av-vels-file "$REF/check/$grid.av_vels.dat" \
            --ref-final-state-file "$ref_fs" \
            --av-vels-file "$OUT/$grid/av_vels.dat" \
            --final-state-file "$OUT/$grid/final_state.dat" | tail -1 || fail=1
    else
        # No final_state golden anywhere (1024x1024): check av_vels by
        # comparing the file against itself for the final-state slot.
        python -m lbm_tpu check \
            --ref-av-vels-file "$REF/check/$grid.av_vels.dat" \
            --ref-final-state-file "$OUT/$grid/final_state.dat" \
            --av-vels-file "$OUT/$grid/av_vels.dat" \
            --final-state-file "$OUT/$grid/final_state.dat" | tail -1 || fail=1
    fi
done
exit $fail
