#!/bin/bash
# Round-4 MEAD correlated rehearsal, attempt 2, v5 runner.
#
# v4 trained stage-2 to epoch 150 at ~14 steps/s and produced the first
# positive at-scale correlation evidence (runs_r4b/correlation_e150.json:
# matched +0.335 vs mismatched -0.008, delta +0.344) but OOMed one epoch
# into the 300-epoch resume chunk: the restore path left the init-time
# HuBERT params pinned in HBM (~1.4 GB dead weights) — fixed in
# cli/train_diffusion.py (explicit buffer delete after restore). v5:
#   - does NOT wipe stage-2 (v4's rm -rf would destroy the epoch-150
#     orbax checkpoint at step 9600); resumes from it;
#   - starts the chunk loop at 300 (150 already evaluated: FAIL at 0.344);
#   - on gate pass, chains straight into the CFG evidence run.
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

R4=runs_r4b
CK=checkpoints/r4corr2
SIZE=512
BS=8

SYN="--dataset mead --synthetic --synthetic_mode correlated --synthetic_size $SIZE"

test -s $R4/correlation_stage1_roundtrip.json || { echo "stage-1 gate artifact missing"; exit 1; }
test -d $CK/stage2/orbax/9600 || { echo "stage-2 epoch-150 checkpoint missing"; exit 1; }

PASSED=0
for EP in 300 450; do
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
  echo "R4 MEAD2: correlation gate FAILED (best effort committed per-epoch)"
  exit 1
fi
test -s $R4/correlation_mead.json || { echo "MISSING correlation_mead.json"; exit 1; }
echo "R4 MEAD2 PIPELINE DONE (gate passed at epoch $PASSED)"

bash runs_r4/cfg_pipeline.sh >> runs_r4/cfg_chain.log 2>&1
echo "R4 MEAD2+CFG CHAIN DONE"
