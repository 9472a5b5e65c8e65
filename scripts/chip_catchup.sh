#!/bin/bash
# One-shot catch-up for when the TPU tunnel comes back after an outage:
# finish the zoo-results collection on chip (overwriting any CPU-fallback
# entries with chip runs), rebuild RESULTS.json + docs/RESULTS.md, and
# refresh the bench matrix. Idempotent: skips models whose logdir already
# holds a finished chip run.
#
# Usage: bash scripts/chip_catchup.sh [--force-cpu-redo]
#   --force-cpu-redo   also re-run (on chip) models whose existing results
#                      were collected on the CPU fallback
set -e
cd "$(dirname "$0")/.."
LOGROOT=${LOGROOT:-logs/zoo_results}
EPOCHS=${EPOCHS:-10}
MODELS="vae gan vqvae pixel_transformer rnn wavenet gated_pixel_cnn \
made pixel_cnn diffusion_model"

# stop the CPU fallback queue if it is still grinding
if [ -f /tmp/zoo_queue.pid ] && kill -0 "$(cat /tmp/zoo_queue.pid)" 2>/dev/null; then
  echo "stopping CPU zoo queue ($(cat /tmp/zoo_queue.pid))"
  kill "$(cat /tmp/zoo_queue.pid)" || true
  sleep 2
fi

for model in $MODELS; do
  hps="$LOGROOT/$model/hps.yaml"
  if [ -f "$hps" ]; then
    backend=$(grep -E '^jax_backend:' "$hps" | awk '{print $2}')
    # a COMPLETED chip run is kept. hps.yaml (with jax_backend) is written
    # at the first logger flush — epoch 0 — so its mere presence does NOT
    # mean the run finished; only the .done sentinel (written below after
    # main exits cleanly) does. Timed-out/crashed chip runs are redone.
    if [ "$backend" != "cpu" ] && [ -n "$backend" ] \
       && [ -f "$LOGROOT/$model/.done" ]; then
      echo "=== $model: chip run already collected, skipping"; continue
    fi
    if [ "$1" != "--force-cpu-redo" ] && [ "$backend" = "cpu" ]; then
      echo "=== $model: CPU run present (pass --force-cpu-redo to redo)"; continue
    fi
    rm -rf "$LOGROOT/$model"
  fi
  echo "=== $model (chip) ==="
  # '|| echo' keeps set -e from aborting the whole catch-up when one model
  # times out or crashes: the remaining models still get their runs and the
  # collect/render refresh below still folds in everything that finished
  if timeout 3600 python -u -m generative_models_tpu.main --model="$model" \
    --epochs="$EPOCHS" --save_n="$EPOCHS" --eval_heavy=1 \
    --logdir="$LOGROOT/$model"; then
    touch "$LOGROOT/$model/.done"
  else
    echo "WARN: $model run failed (exit $?); continuing"
  fi
done

python scripts/collect_results.py "$LOGROOT" RESULTS.json
python scripts/render_results.py
echo "chip catch-up done; RESULTS.json + docs/RESULTS.md refreshed"
