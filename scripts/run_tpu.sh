#!/usr/bin/env bash
# Single-host TPU launch (the analog of the reference's single-node SLURM
# scripts, e.g. SerialCode/job_submit_d2q9-bgk: 1 node x 40 cpus).
#
# Usage: scripts/run_tpu.sh <input.params> <obstacles.dat> [extra run flags]
set -euo pipefail
cd "$(dirname "$0")/.."
source scripts/env.sh

PARAMS=${1:?usage: run_tpu.sh <input.params> <obstacles.dat> [flags]}
OBSTACLES=${2:?usage: run_tpu.sh <input.params> <obstacles.dat> [flags]}
shift 2

make -s native
python -m lbm_tpu run "$PARAMS" "$OBSTACLES" "$@"
