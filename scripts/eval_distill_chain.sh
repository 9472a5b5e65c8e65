#!/bin/bash
# Heavy-eval every stage of a finished progressive-distillation chain
# (scripts/progressive_distillation.sh): reload each stage checkpoint with
# --epochs=0 --eval_heavy=1 so FID / precision / recall / cond_* land in the
# stage's TensorBoard events, then scripts/collect_distill.py turns the set
# into DISTILL.json's FID-vs-steps curve. The reference chain
# (gms/diffusion/progressive_distillation.sh) never recorded this curve.
set -e
LOGROOT=${LOGROOT:-logs/distillation}

for stage in teacher step1 step2_128 step2_64 step2_32 step2_16 step2_8 \
             step2_4 step2_2 step2_1; do
  d=$LOGROOT/$stage
  [ -f "$d/model.pt" ] || continue
  echo "=== eval_heavy: $stage ==="
  python -m generative_models_tpu.main \
    --weights_from=$d/model.pt --logdir=$d \
    --epochs=0 --eval_heavy=1
done
