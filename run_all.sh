#!/bin/bash
# Train every model for N epochs (reference: run_all.sh — which used stale
# model names; these match the registry).
set -e
EPOCHS=${1:-10}
for model in made rnn wavenet pixel_cnn gated_pixel_cnn pixel_transformer \
             vae vqvae gan diffusion_model autoencoder classifier; do
  echo "=== $model ==="
  python -m generative_models_tpu.main --model=$model --epochs=$EPOCHS \
    --logdir=logs/run_all/$model
done
