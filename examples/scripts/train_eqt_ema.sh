#!/bin/bash
# Train EQTransformer with EMA on VCSEIS (train_ema_e.sh recipe).
set -e
cd "$(dirname "$0")/../.."
python -m volpick_tpu.train.trainer --config examples/configs/eqtransformer_vcseis.json "$@"
