#!/bin/bash
# Reference training recipe (reference: jax_train.sh:15-41 — 1024 worlds,
# lr 1e-4, 40 steps/update, 4 bptt chunks, 1 minibatch, 2 epochs, bf16,
# PBT 2 train + 2 past policies, 100k updates).
set -e
cd "$(dirname "$0")"

NUM_WORLDS=${NUM_WORLDS:-1024}
RUN_NAME=${RUN_NAME:-run0}

python scripts/train.py \
    --ckpt-dir ckpts \
    --tb-dir tb \
    --run-name "$RUN_NAME" \
    --num-worlds "$NUM_WORLDS" \
    --num-updates 100000 \
    --steps-per-update 40 \
    --num-bptt-chunks 4 \
    --num-minibatches 1 \
    --num-epochs 2 \
    --lr 1e-4 \
    --entropy-loss-coef 0.01 \
    --pbt-ensemble-size 2 \
    --pbt-past-policies 2 \
    --bf16 \
    --num-hiders 2 \
    --num-seekers 2 \
    --eval-frequency 500 \
    "$@"
