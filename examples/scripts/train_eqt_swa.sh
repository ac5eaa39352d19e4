#!/bin/bash
# Train EQTransformer with SWA on VCSEIS (train_swa_e.sh recipe).
set -e
cd "$(dirname "$0")/../.."
python -m volpick_tpu.train.trainer --config examples/configs/eqtransformer_swa.json "$@"
