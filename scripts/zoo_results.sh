#!/bin/bash
# Train every sampling model in the zoo for a real run on chip with heavy
# eval at the end, producing the measured numbers the reference README lists
# as TODOs (reference README.md:145-148): test-set bits/dim for the
# autoregressive models, FID / precision / recall for every model, and
# wall-clock train time. scripts/collect_results.py turns the logdirs into
# RESULTS.json. EPOCHS defaults to 10 to match scripts/chip_catchup.sh so
# re-runs after an outage stay comparable within the table.
set -e
LOGROOT=${LOGROOT:-logs/zoo_results}
EPOCHS=${EPOCHS:-10}
MODELS=${MODELS:-"made rnn wavenet pixel_cnn gated_pixel_cnn \
pixel_transformer vae vqvae gan diffusion_model"}

for model in $MODELS; do
  echo "=== $model ==="
  python -m generative_models_tpu.main --model=$model \
    --epochs=$EPOCHS --save_n=$EPOCHS --eval_heavy=1 \
    --logdir=$LOGROOT/$model
done
