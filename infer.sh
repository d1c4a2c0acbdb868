#!/bin/bash
# Reference inference recipe (reference: jax_infer.sh:14-22 — 3600 steps,
# checkpoint record log for replay).
set -e
cd "$(dirname "$0")"

CKPT=${1:?usage: infer.sh CKPT_PATH [args...]}
shift

python scripts/infer.py \
    --ckpt-path "$CKPT" \
    --num-worlds 16 \
    --num-steps 3600 \
    --num-hiders 2 \
    --num-seekers 2 \
    --record-log record.bin \
    "$@"
