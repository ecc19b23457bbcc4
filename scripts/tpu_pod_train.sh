#!/usr/bin/env bash
# TPU-pod launcher: the TPU-native equivalent of the reference's SLURM grid
# (reference: scripts/voc/slurm_train.sh:68-87 — scenario grid over
# {overlap,disjoint,sequential} x {15-1,10-1,15-5,19-1}).
#
# Runs the same experiment grid on a Cloud TPU pod slice: the command is
# broadcast to every worker with `--worker=all`; each process auto-joins via
# jax.distributed (bacs_tpu/parallel/mesh.py multihost_init — on TPU VMs the
# coordinator is discovered from the TPU environment, no flags needed) and
# the Mesh spans the global device list.
#
#   TPU_NAME=my-pod ZONE=us-central2-b ./scripts/tpu_pod_train.sh
#
# Single-host fallback (no TPU_NAME): runs the grid locally, same semantics.
set -euo pipefail

CONFIG_PATH="${CONFIG_PATH:-conf/bacs}"
CONFIG_NAME="${CONFIG_NAME:-bacs_plus_config}"
BATCH_SIZE="${BATCH_SIZE:-12}"
EPOCHS="${EPOCHS:-30}"
CKPT_ROOT="${CKPT_ROOT:-checkpoints}"
BACKBONE_WEIGHTS="${BACKBONE_WEIGHTS:-}"
N_DEVICES="${N_DEVICES:-}"          # default: all devices in the slice
REPO_DIR="${REPO_DIR:-$(pwd)}"

# the reference grid (slurm_train.sh:16-18)
INITIAL_INCREMENTS=(15 10 15 19)
INCREMENTS=(1 1 5 1)
MODES=(overlap disjoint sequential)

run_one() {
    local exp_name="$1"; shift
    local overrides=("$@")
    if [[ -n "${TPU_NAME:-}" ]]; then
        # broadcast to all pod workers; each runs the same SPMD program
        gcloud compute tpus tpu-vm ssh "$TPU_NAME" \
            --zone "${ZONE:?set ZONE for pod launches}" --worker=all \
            --command "cd $REPO_DIR && python main.py \
                --config-path $CONFIG_PATH --config-name $CONFIG_NAME \
                ${overrides[*]}"
    else
        python main.py --config-path "$CONFIG_PATH" \
            --config-name "$CONFIG_NAME" "${overrides[@]}"
    fi
}

for mode in "${MODES[@]}"; do
    for i in "${!INITIAL_INCREMENTS[@]}"; do
        init="${INITIAL_INCREMENTS[i]}"
        inc="${INCREMENTS[i]}"
        exp_name="bacs_${mode}${init}-${inc}"
        echo "=== Experiment ${exp_name} ==="
        overrides=(
            "training.mode=${mode}"
            "training.initial_increment=${init}"
            "training.increment=${inc}"
            "training.batch_size=${BATCH_SIZE}"
            "training.epochs=${EPOCHS}"
            "training.ckpt_dir=${CKPT_ROOT}/${exp_name}"
            "+training.name=${exp_name}"
        )
        [[ -n "$BACKBONE_WEIGHTS" ]] && overrides+=(
            "+network.backbone_weights_path=${BACKBONE_WEIGHTS}")
        [[ -n "$N_DEVICES" ]] && overrides+=(
            "+training.n_devices=${N_DEVICES}")
        run_one "$exp_name" "${overrides[@]}"
    done
done
