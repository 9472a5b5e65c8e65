#!/bin/bash
# GAN stabilizer sweep (round 4): the reference-exact DCGAN collapses on
# this workload by epoch ~3 (disc loss -> 0, gen loss -> 10; 50-epoch FID
# 0.79, logs/zoo50/gan) and classic TTUR disc_lr=4x made it worse
# (logs/zoo50/gan_stab). These configs brake the DISCRIMINATOR instead:
# one-sided label smoothing, a slower disc lr, and SN combined with both.
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}

run () {
  name=$1; shift
  python -m generative_models_tpu.main --model=gan --epochs=50 --save_n=10 \
    --eval_heavy=1 --keep_best=fid --logdir=logs/gan_sweep/$name "$@"
}

run smooth      --label_smooth=0.1
run slowdisc    --disc_lr=1e-5
run smooth_slow --label_smooth=0.1 --disc_lr=1e-5
run sn_smooth   --spectral_norm=1 --label_smooth=0.1 --disc_lr=1e-5
echo "GAN SWEEP DONE"
