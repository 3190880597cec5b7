#!/bin/bash
# Round-4 MEAD correlated rehearsal, attempt 2.
#
# Attempt 1 (pipeline_mead.sh, runs_r4/correlation_stage1_roundtrip.json)
# failed its OWN stage-1 gate — and the per-split probe shows exactly why:
# the full-size codec round-trips TRAIN clips at corr 0.976 but TEST clips
# at corr ~0 (train mse 1.07e-5, test 1.54e-5 ~= the signal variance). At
# 128 clips the codec MEMORIZES rather than learning to track the
# envelope; recon/val losses never expose this because a near-mean
# reconstruction already scores well in absolute error. The reference
# regime trains on thousands of real clips; synthetic clips are free, so
# attempt 2 scales the dataset to 512 clips (64 eval/test) and keeps the
# same total step budget (~40k stage-1 steps = 650 epochs at 64
# steps/epoch).
#
# Also new vs attempt 1: a TRAIN-split round-trip report next to the test
# gate (memorization is visible as the gap between the two), and stage-2
# chunks early-stop the moment the correlation gate passes.
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

R4=runs_r4b
CK=checkpoints/r4corr2
SIZE=512   # 512 train / 64 valid / 64 test clips
BS=8

mkdir -p $R4 $CK

SYN="--dataset mead --synthetic --synthetic_mode correlated --synthetic_size $SIZE"

# ---- stage 1: EVQ-VAE codec, batch-8 DP on the single chip ----
python -u -m fdm_tpu train-vqvae $SYN --epochs 650 \
  --set train.batch_size=$BS \
  --set train.log_dir=$R4/tb_stage1 --set train.eval_every=100 \
  --set train.checkpoint_every=200 \
  --output_dir $CK/stage1 --resume \
  > $R4/stage1_stdout.log 2>&1

# ---- stage-1 gates: the round-trip must track GT temporally on BOTH
# splits — train-split tracking with test-split failure is memorization
# (attempt 1's failure mode) and stops here, loudly ----
python -u -m fdm_tpu sample-vqvae $SYN --split train \
  --params $CK/stage1/mead_vqvae_params.msgpack \
  --output_dir /tmp/r4c2_vq_train > $R4/sample_vqvae_train_stdout.log 2>&1
python -u -m fdm_tpu correlation $SYN --split train --max_clips 64 \
  --pred_path /tmp/r4c2_vq_train \
  --json_out $R4/correlation_stage1_train_roundtrip.json \
  > $R4/correlation_stage1_train_stdout.log 2>&1
tail -1 $R4/correlation_stage1_train_stdout.log || true

python -u -m fdm_tpu sample-vqvae $SYN \
  --params $CK/stage1/mead_vqvae_params.msgpack \
  --output_dir /tmp/r4c2_vq > $R4/sample_vqvae_stdout.log 2>&1
python -u -m fdm_tpu correlation $SYN \
  --pred_path /tmp/r4c2_vq --min_delta 0.5 \
  --json_out $R4/correlation_stage1_roundtrip.json \
  > $R4/correlation_stage1_stdout.log 2>&1

# ---- stage 2 in chunks; sample + correlation after each; early stop ----
PASSED=0
for EP in 150 300 450 600; do
  python -u -m fdm_tpu train-diffusion $SYN --epochs $EP \
    --set train.batch_size=$BS \
    --set train.log_dir=$R4/tb_stage2 --set train.eval_every=50 \
    --set train.checkpoint_every=150 \
    --stage1 $CK/stage1/mead_vqvae_params.msgpack \
    --train_audio_encoder --output_dir $CK/stage2 --resume \
    >> $R4/stage2_stdout.log 2>&1

  python -u -m fdm_tpu sample-diffusion $SYN --batch_size 8 \
    --stage1 $CK/stage1/mead_vqvae_params.msgpack \
    --stage2 $CK/stage2/mead_fdm_params.msgpack \
    --audio_params $CK/stage2/mead_audio_params.msgpack \
    --output_dir /tmp/r4c2_samples_$EP \
    > $R4/sample_e${EP}_stdout.log 2>&1

  if python -u -m fdm_tpu correlation $SYN \
       --pred_path /tmp/r4c2_samples_$EP --min_delta 0.5 \
       --json_out $R4/correlation_e${EP}.json \
       > $R4/correlation_e${EP}_stdout.log 2>&1; then
    PASSED=$EP
    cp $R4/correlation_e${EP}.json $R4/correlation_mead.json
    cp /tmp/r4c2_samples_$EP/* /tmp/r4c2_samples_final/ 2>/dev/null || {
      mkdir -p /tmp/r4c2_samples_final
      cp /tmp/r4c2_samples_$EP/* /tmp/r4c2_samples_final/
    }
    break
  fi
  tail -1 $R4/correlation_e${EP}_stdout.log || true
done

if [ "$PASSED" = "0" ]; then
  echo "R4 MEAD2: correlation gate FAILED after 600 epochs"
  exit 1
fi
test -s $R4/correlation_mead.json || { echo "MISSING correlation_mead.json"; exit 1; }
echo "R4 MEAD2 PIPELINE DONE (gate passed at epoch $PASSED)"
