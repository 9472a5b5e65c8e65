#!/bin/bash
# Remainder of the round-4 chip queue (round4_chip.sh died on a transient
# remote-compile tunnel error during the evalfast heavy eval): the
# eval_heavy fast-sampler A/B, the measurement scripts, and the GAN
# stabilizer sweep. Uses the persistent compile cache to shrink the
# repeated CFG-sampler compiles the tunnel choked on.
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
CACHE=--compile_cache=/tmp/gmt_xla_cache

python -m generative_models_tpu.main --model=diffusion_model --epochs=0 \
  --eval_heavy=1 --weights_from=logs/zoo50/diffusion_model/model.pt \
  $CACHE --logdir=logs/evalfast/base
python -m generative_models_tpu.main --model=diffusion_model --epochs=0 \
  --eval_heavy=1 --weights_from=logs/zoo50/diffusion_model/model.pt \
  --eval_sampler=dpm2m --eval_sample_steps=25 \
  $CACHE --logdir=logs/evalfast/dpm2m25

python scripts/conv_ar_crosscheck.py --ours
python scripts/made_ab.py
python scripts/gated_profile.py
python scripts/decode_ab.py
python scripts/diffusion_profile.py
bash scripts/gan_stabilizer_sweep.sh
echo "ROUND4 REST DONE"
