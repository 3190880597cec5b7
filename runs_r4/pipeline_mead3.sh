#!/bin/bash
# Round-4 MEAD correlated rehearsal, attempt 2 continued (v3 runner).
#
# Same regime as pipeline_mead2.sh after the universe fix — stage-1 is
# DONE and both its roundtrip gates passed at delta +0.97/+0.99
# (runs_r4b/correlation_stage1_{train_,}roundtrip.json). v3 changes the
# stage-2 execution only:
#   - --device_cache_half + --scan_steps 16: the device tunnel spent the
#     morning in a degraded window where per-step dispatch (not compute)
#     pinned training to 1.3-1.7 steps/s; 16 scanned steps per dispatch
#     amortize the link latency 16x and the HBM-resident cache removes
#     the per-step host path entirely.
#   - checkpoint_every=50 so a restart never loses more than a third of
#     a chunk.
#   - stage-1 gate steps skip when their artifacts already exist.
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

R4=runs_r4b
CK=checkpoints/r4corr2
SIZE=512
BS=8

mkdir -p $R4 $CK

SYN="--dataset mead --synthetic --synthetic_mode correlated --synthetic_size $SIZE"

# ---- stage 1 (resume = no-op once trained) + gates, skipped if done ----
if [ ! -s $R4/correlation_stage1_roundtrip.json ]; then
  python -u -m fdm_tpu train-vqvae $SYN --epochs 650 \
    --set train.batch_size=$BS \
    --set train.log_dir=$R4/tb_stage1 --set train.eval_every=100 \
    --set train.checkpoint_every=200 \
    --output_dir $CK/stage1 --resume \
    > $R4/stage1_stdout.log 2>&1

  python -u -m fdm_tpu sample-vqvae $SYN --split train --max_clips 64 \
    --params $CK/stage1/mead_vqvae_params.msgpack \
    --output_dir /tmp/r4c2_vq_train > $R4/sample_vqvae_train_stdout.log 2>&1
  python -u -m fdm_tpu correlation $SYN --split train --max_clips 64 \
    --pred_path /tmp/r4c2_vq_train \
    --json_out $R4/correlation_stage1_train_roundtrip.json \
    > $R4/correlation_stage1_train_stdout.log 2>&1

  python -u -m fdm_tpu sample-vqvae $SYN \
    --params $CK/stage1/mead_vqvae_params.msgpack \
    --output_dir /tmp/r4c2_vq > $R4/sample_vqvae_stdout.log 2>&1
  python -u -m fdm_tpu correlation $SYN \
    --pred_path /tmp/r4c2_vq --min_delta 0.5 \
    --json_out $R4/correlation_stage1_roundtrip.json \
    > $R4/correlation_stage1_stdout.log 2>&1
fi

# ---- stage 2 in chunks; sample + correlation after each; early stop ----
PASSED=0
for EP in 150 300 450 600; do
  python -u -m fdm_tpu train-diffusion $SYN --epochs $EP \
    --set train.batch_size=$BS \
    --device_cache --device_cache_half --scan_steps 16 \
    --set train.log_dir=$R4/tb_stage2 --set train.eval_every=50 \
    --set train.checkpoint_every=50 \
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
    mkdir -p /tmp/r4c2_samples_final
    cp /tmp/r4c2_samples_$EP/* /tmp/r4c2_samples_final/
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
