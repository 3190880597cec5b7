#!/bin/bash
# Round-4 MEAD correlated rehearsal, attempt 2, v6 runner.
#
# v5 cleared the resume point (the restore-path buffer leak fix) but hit
# a second deferred RESOURCE_EXHAUSTED 102 epochs in (epoch 253) — two
# more HBM sinks in the scan-dispatch regime, both fixed in-package:
#   - stacked_chunks kept the per-batch device buffers alive next to the
#     stacked copies (whole dataset pinned twice; release_batches=True);
#   - epoch_stacked cast fp16 chunks to fp32 at DISPATCH time, so async
#     dispatch held every in-flight chunk at fp32 (~2x dataset in
#     transients; now cast per-step inside the scan body via
#     make_multi_step cast_f32_keys).
# v6 also checkpoints every 50 epochs (sync, ~2 min each) so a crash can
# never again lose 100 epochs of progress.
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
    --set train.checkpoint_every=50 --set train.ckpt_async=false \
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
