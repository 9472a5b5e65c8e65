#!/bin/bash
# GAN stabilizer sweep (round 4, refreshed round 5): the reference-exact
# DCGAN enters disc-domination collapse on this workload from epoch 1
# (disc loss -> 0, gen loss -> 10; with the corrected BN init it escapes
# at ~epoch 23 and recovers — trajectory in docs/RESULTS.md). These
# configs brake the DISCRIMINATOR: one-sided label smoothing, a slower
# disc lr, and SN combined with both. Collected by
# scripts/collect_gan_sweep.py into RESULTS.json['gan_sweep'].
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
