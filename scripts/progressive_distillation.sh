#!/bin/bash
# Progressive distillation chain (reference:
# gms/diffusion/progressive_distillation.sh): train a 256-step teacher, then
# distill step1 (CF-guidance baked into a w-conditioned student), then
# repeatedly halve the step count with step2 students.
set -e
LOGROOT=${LOGROOT:-logs/distillation}
EPOCHS_TEACHER=${EPOCHS_TEACHER:-20}
EPOCHS_STUDENT=${EPOCHS_STUDENT:-5}

# 1) teacher: standard 256-step training
python -m generative_models_tpu.main --model=diffusion_model \
  --timesteps=256 --epochs=$EPOCHS_TEACHER --logdir=$LOGROOT/teacher

# 2) step1: same step count; student learns the guided teacher's DDIM output
#    conditioned on the guidance weight w
python -m generative_models_tpu.main --model=diffusion_model \
  --timesteps=256 --epochs=$EPOCHS_STUDENT \
  --teacher_path=$LOGROOT/teacher/model.pt --teacher_mode=step1 \
  --lr=3e-4 --logdir=$LOGROOT/step1

# 3) step2 chain: halve the sampling steps each stage
PREV=$LOGROOT/step1
for steps in 128 64 32 16 8 4 2 1; do
  python -m generative_models_tpu.main --model=diffusion_model \
    --timesteps=$steps --epochs=$EPOCHS_STUDENT \
    --teacher_path=$PREV/model.pt --teacher_mode=step2 \
    --lr=1e-4 --logdir=$LOGROOT/step2_$steps
  PREV=$LOGROOT/step2_$steps
done
