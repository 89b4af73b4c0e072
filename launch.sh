#!/usr/bin/env bash
# Single-host launcher (replaces dist_train.sh): one process drives every
# local TPU chip through the jax.sharding mesh — no port scanning, no
# torch.distributed.launch.
set -euo pipefail
CFG=${1:?usage: launch.sh <cfg_file> [extra train.py args...]}
shift
exec python train.py --cfg_file "$CFG" "$@"
