#!/bin/sh
# Flagship 15-1 BACS legs at the paper's hyperparameters (VERDICT r3 #1
# follow-up): the round-4 ADE 100-50 run showed bg_weighted_ce (paper
# bacs_plus: alpha=0.8) and loss.boundary_train_mode=false are the two
# load-bearing levers for BACS retention; this measures both at flagship
# scale (DeepLabV3-RN50, crop 256, rich synthetic, HBM-resident).
# Serialized: ONE tpu process at a time (CLAUDE.md).
set -e
cd "$(dirname "$0")/.."
python scripts/protocol_compare.py --protocol 15-1-flagship \
    --methods bacs_plus > /tmp/flag_bacs_plus.log 2>&1
python scripts/protocol_compare.py --protocol 15-1-flagship \
    --methods bacs_plus --override +loss.boundary_train_mode=false \
    > /tmp/flag_bacs_plus_btm.log 2>&1
echo ALL_LEGS_DONE
