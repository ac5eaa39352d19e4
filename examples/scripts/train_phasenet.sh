#!/bin/bash
# Train PhaseNet on VCSEIS (counterpart of the reference's train0.sh recipes).
# VOLPICK_TPU_DATA must point at a directory containing the vcseis dataset.
set -e
cd "$(dirname "$0")/../.."
python -m volpick_tpu.train.trainer --config examples/configs/phasenet_vcseis.json "$@"
