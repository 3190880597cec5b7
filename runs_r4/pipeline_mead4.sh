#!/bin/bash
# Round-4 MEAD correlated rehearsal, attempt 2, v4 runner.
#
# v3 ran stage-2 at 14 steps/s (device cache + 16-step scanned dispatch)
# but OOMed the chip at the epoch-50 checkpoint: the async checkpointer's
# on-device snapshot doubled the train state in HBM on top of the pinned
# dataset cache, and the deferred error surfaced at the next device_get
# (runs_r4b/stage2_stdout.log). No checkpoint was written. v4:
#   - train.ckpt_async=false: stream checkpoints straight to host (the
#     Checkpointer now also auto-falls-back on low HBM headroom);
#   - checkpoint_every=150, aligned to the 150-epoch chunks, plus the
#     CLIs' new guaranteed end-of-run save — one ~60-140 s sync save per
#     ~15 min chunk instead of three OOM-risk snapshots;
#   - stage-2 state dir cleaned first (v3 left a stale progress.json with
#     an empty orbax dir).
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

# ---- stage 2 fresh (v3 left no usable checkpoint) ----
rm -rf $CK/stage2
PASSED=0
for EP in 150 300 450 600; do
  python -u -m fdm_tpu train-diffusion $SYN --epochs $EP \
    --set train.batch_size=$BS \
    --device_cache --device_cache_half --scan_steps 16 \
    --set train.log_dir=$R4/tb_stage2 --set train.eval_every=50 \
    --set train.checkpoint_every=150 --set train.ckpt_async=false \
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
