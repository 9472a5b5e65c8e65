#!/bin/bash
# Round-4 chip measurement queue (run after the conv-AR zoo50 runs finish):
# completes the 50-epoch zoo refresh, the conv-AR cross-framework recorder,
# the MADE premasked A/B, the gated ablation profile, the fused-decode A/B,
# a GAN stabilizer comparison run, and the eval_heavy fast-sampler rows.
set -e
cd "$(dirname "$0")/.."
# append (not overwrite): the env's sitecustomize on PYTHONPATH registers
# the remote-TPU platform plugin
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}

LOGROOT=logs/zoo50 EPOCHS=50 \
  MODELS="made rnn pixel_transformer vae vqvae gan diffusion_model" \
  bash scripts/zoo_results.sh

# GAN stabilizer comparison (opt-in flags; the zoo run above is the
# reference-exact default). --disc_lr=1e-5 is the measured winner of
# scripts/gan_stabilizer_sweep.sh (FID 0.039 vs the default's 0.79
# collapse at 50 epochs; TTUR/label-smooth/SN variants all collapse).
python -m generative_models_tpu.main --model=gan --epochs=50 --save_n=50 \
  --eval_heavy=1 --disc_lr=1e-5 \
  --logdir=logs/zoo50/gan_stab

# eval_heavy fast-sampler A/B on the trained diffusion checkpoint
python -m generative_models_tpu.main --model=diffusion_model --epochs=0 \
  --eval_heavy=1 --weights_from=logs/zoo50/diffusion_model/model.pt \
  --logdir=logs/evalfast/base
python -m generative_models_tpu.main --model=diffusion_model --epochs=0 \
  --eval_heavy=1 --weights_from=logs/zoo50/diffusion_model/model.pt \
  --eval_sampler=dpm2m --eval_sample_steps=25 \
  --logdir=logs/evalfast/dpm2m25

python scripts/conv_ar_crosscheck.py --ours
python scripts/made_ab.py
python scripts/gated_profile.py
python scripts/decode_ab.py
python scripts/diffusion_profile.py
echo "ROUND4 CHIP QUEUE DONE"
