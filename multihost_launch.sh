#!/usr/bin/env bash
# Multi-host launcher (replaces slurm_train.sh): run this once per host of
# the TPU pod slice (e.g. via your scheduler); jax.distributed.initialize
# picks up coordinator/topology from the TPU runtime environment, and the
# single SPMD program extends over ICI within a slice and DCN across hosts.
set -euo pipefail
CFG=${1:?usage: multihost_launch.sh <cfg_file> [extra train.py args...]}
shift
exec python train.py --cfg_file "$CFG" --distributed "$@"
