#!/bin/bash
# Re-evaluate one diffusion checkpoint at many sampling step counts
# (reference: gms/diffusion/eval_no_progressive.sh).
set -e
WEIGHTS=${1:?usage: eval_no_progressive.sh <logdir-with-model.pt>}
for steps in 256 128 64 32 16 8 4 2 1; do
  python -m generative_models_tpu.main --model=diffusion_model \
    --weights_from=$WEIGHTS/model.pt --timesteps=$steps \
    --skip_training=1 --epochs=0 --eval_heavy=1 \
    --logdir=$WEIGHTS/eval_$steps
done
