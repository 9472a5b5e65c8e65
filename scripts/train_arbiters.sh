#!/bin/bash
# Bootstrap the eval arbiters into the default config paths
# (./weights/autoencoder.pt, ./weights/classifier.pt) so --eval_heavy=1 works
# out of the box — the reference ships pretrained weights/ and loads them by
# default path (gms/main.py:85-90). Extra flags pass through to both runs,
# e.g.:  scripts/train_arbiters.sh --bs=64 --data_source=digits
set -e
cd "$(dirname "$0")/.."
EPOCHS=${EPOCHS:-10}
LOGROOT=${LOGROOT:-logs/arbiters}

python -m generative_models_tpu.main --model=autoencoder \
  --epochs="$EPOCHS" --logdir="$LOGROOT/autoencoder" "$@"
python -m generative_models_tpu.main --model=classifier \
  --epochs="$EPOCHS" --logdir="$LOGROOT/classifier" "$@"

mkdir -p weights
cp "$LOGROOT/autoencoder/model.jit.pt" weights/autoencoder.pt
cp "$LOGROOT/classifier/model.jit.pt" weights/classifier.pt
echo "installed weights/autoencoder.pt and weights/classifier.pt"
