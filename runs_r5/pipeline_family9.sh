#!/bin/bash
# Round-5 correlated rehearsal for the vertex-space families (VERDICT r4
# item 3: runs_r4/pipeline_family.sh was committed with zero runs — the
# round ended before the MEAD chain freed the chip).
# Usage: pipeline_family9.sh <biwi|vocaset>
#
# Budget-reduced vs the (never-run) r4 plan: the remaining round-5 wall
# clock must fit BOTH families plus the final bench, so sizes/epochs are
# cut and the stages are chunked with early stop. The MEAD v8 rehearsal
# (runs_r5/pipeline_mead8.sh) established the calibration this script is
# scored against:
#   - train-split delta reaches the oracle ceiling (+0.967 vs oracle
#     +0.970 at 1024 clips) — the framework learns the task;
#   - TEST-split delta is bounded by audio-encoder generalization, NOT
#     model capacity (~+0.27 at 1024 clips, ~+0.34 at 512; the torch
#     reference head-to-head in runs_r5/headtohead scores the same
#     regime). With <=128 clips the reachable test delta is lower still,
#     so the hard gate here is a null-result catch (min_delta 0.15), and
#     the TRAIN-split probe is the learning evidence of record.
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

DS=${1:?usage: pipeline_family9.sh <biwi|vocaset>}
R=runs_r5/$DS
CK=checkpoints/r5corr/$DS
BS=8
# biwi vertices are 70110-dim — fp16 HBM cache (the reference's own
# loaders round-trip BIWI vertices through fp16); vocaset fits fp32
if [ "$DS" = "biwi" ]; then
  SIZE=96; S1_CHUNKS="400 800"; S2_CHUNKS="150 300"; HALF=--device_cache_half
else
  SIZE=128; S1_CHUNKS="400 800"; S2_CHUNKS="150 300"; HALF=
fi

mkdir -p "$R" "$CK" runs_r5/params

SYN="--dataset $DS --synthetic --synthetic_mode correlated --synthetic_size $SIZE"

# ---- stage 1 in chunks; early-stop once the codec round-trip tracks GT
# (marker written only after the gate PASSES — ADVICE r4 medium) ----
if [ ! -f $R/stage1_gate.ok ]; then
  for EP in $S1_CHUNKS; do
    python -u -m fdm_tpu train-vqvae $SYN --epochs $EP \
      --set train.batch_size=$BS --device_cache $HALF --scan_steps 16 \
      --set train.log_dir=$R/tb_stage1 --set train.eval_every=100 \
      --set train.checkpoint_every=100000 --set train.ckpt_async=false \
      --output_dir $CK/stage1 --resume \
      >> $R/stage1_stdout.log 2>&1
    python -u -m fdm_tpu sample-vqvae $SYN --max_clips 32 \
      --params $CK/stage1/${DS}_vqvae_params.msgpack \
      --output_dir /tmp/r5f_${DS}_vq > $R/sample_vqvae_stdout.log 2>&1
    if python -u -m fdm_tpu correlation $SYN --max_clips 32 \
         --pred_path /tmp/r5f_${DS}_vq --min_delta 0.5 \
         --json_out $R/correlation_stage1.json \
         > $R/correlation_stage1_stdout.log 2>&1; then
      touch $R/stage1_gate.ok
      break
    fi
    tail -n 1 $R/correlation_stage1_stdout.log || true
  done
fi
test -f $R/stage1_gate.ok || { echo "R5 ${DS^^}: stage-1 gate FAILED"; exit 1; }
cp -f $CK/stage1/${DS}_vqvae_params.msgpack runs_r5/params/ || true

# ---- oracle ceiling for THIS dataset's codec (sizes the gates) ----
if [ ! -s $R/correlation_oracle.json ]; then
  python -u -m fdm_tpu correlation $SYN --oracle --max_clips 32 \
    --stage1 $CK/stage1/${DS}_vqvae_params.msgpack \
    --json_out $R/correlation_oracle.json \
    > $R/correlation_oracle_stdout.log 2>&1 || true
fi

# ---- stage 2 in chunks; test + train-split correlation after each ----
PASSED=0
for EP in $S2_CHUNKS; do
  python -u -m fdm_tpu train-diffusion $SYN --epochs $EP \
    --set train.batch_size=$BS --device_cache $HALF --scan_steps 16 \
    --ema_decay 0.999 \
    --set train.log_dir=$R/tb_stage2 --set train.eval_every=50 \
    --set train.checkpoint_every=100000 --set train.ckpt_async=false \
    --stage1 $CK/stage1/${DS}_vqvae_params.msgpack \
    --train_audio_encoder --output_dir $CK/stage2 --resume \
    >> $R/stage2_stdout.log 2>&1

  for SPLIT in "" "--split train"; do
    TAG=$([ -n "$SPLIT" ] && echo train || echo test)
    [ -s $R/correlation_e${EP}_${TAG}.json ] && continue
    python -u -m fdm_tpu sample-diffusion $SYN --batch_size 8 $SPLIT \
      --max_clips 32 \
      --stage1 $CK/stage1/${DS}_vqvae_params.msgpack \
      --stage2 $CK/stage2/${DS}_fdm_params_ema.msgpack \
      --audio_params $CK/stage2/${DS}_audio_params_ema.msgpack \
      --output_dir /tmp/r5f_${DS}_s_${EP}_${TAG} \
      > $R/sample_e${EP}_${TAG}_stdout.log 2>&1
    python -u -m fdm_tpu correlation $SYN $SPLIT --max_clips 32 \
      --pred_path /tmp/r5f_${DS}_s_${EP}_${TAG} \
      --json_out $R/correlation_e${EP}_${TAG}.json \
      > $R/correlation_e${EP}_${TAG}_stdout.log 2>&1 || true
    tail -n 1 $R/correlation_e${EP}_${TAG}_stdout.log || true
  done

  # the null-result catch: a positive TEST delta ends the chunk loop
  if python -u -m fdm_tpu correlation $SYN --max_clips 32 \
       --pred_path /tmp/r5f_${DS}_s_${EP}_test --min_delta 0.15 \
       --json_out $R/correlation_${DS}.json \
       > $R/correlation_final_stdout.log 2>&1; then
    PASSED=$EP
    break
  fi
done

test -s $R/correlation_${DS}.json || { echo "MISSING correlation_${DS}.json"; exit 1; }
if [ "$PASSED" = "0" ]; then
  echo "R5 ${DS^^}: test-split delta < 0.15 after ${S2_CHUNKS##* } epochs"
  exit 1
fi
echo "R5 ${DS^^} PIPELINE DONE (test gate passed at epoch $PASSED)"
