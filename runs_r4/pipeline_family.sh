#!/bin/bash
# Round-4 correlated rehearsal for the vertex-space families (VERDICT r3
# item 4: the round-3 BIWI/VOCASET scripts were committed with zero runs).
# Usage: pipeline_family.sh <biwi|vocaset>
#
# Same regime as pipeline_mead4.sh (batch-8 DP, redesigned lip-region
# articulation map, per-chunk correlation checkpoints) with one addition:
# EARLY STOP — the moment a chunk's correlation gate reaches delta >= 0.5
# the stage-2 loop ends and the final artifact is written, so a model that
# learns in 300 epochs does not burn the full 600-epoch budget (wall
# clock is the scarce resource; both families run after MEAD).
#
# v4 sync: --scan_steps 16 amortizes tunnel dispatch latency 16x (14 vs
# 1.5 steps/s measured on MEAD stage-2 during a degraded-tunnel window);
# checkpoints are chunk-aligned and synchronous (train.ckpt_async=false)
# because the async on-device snapshot OOMs next to a pinned dataset
# cache; the CLIs guarantee an end-of-run save for --resume chaining.
#
# Shell hygiene per ADVICE r3: pipefail, explicit PYTHONPATH (keeping the
# axon sitecustomize entry), direct redirects (no `| tee` dead guards),
# end-of-run artifact asserts.
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

DS=${1:?usage: pipeline_family.sh <biwi|vocaset>}
R=runs_r4/$DS
CK=checkpoints/r4corr/$DS
BS=8
# Sizes chosen for generalization headroom (the MEAD attempt-1
# "memorization" reading was later traced to a split-universe eval bug —
# runs_r4/NOTES.md — but more data only helps) bounded by device
# memory — the vertex-space datasets train through the
# HBM-resident cache (--device_cache), which removes the ~50 MB/s
# host->device bound that pinned the round-3 runs to 3 steps/s:
#   vocaset: 256 clips x 120 x 15069 fp32 ~= 1.9 GB   (fp32 cache)
#   biwi:    192 clips x 120 x 70110 fp16 ~= 3.2 GB   (fp16 cache, the
#            reference's own loaders round-trip vertices through fp16)
if [ "$DS" = "biwi" ]; then
  SIZE=192; S1_EPOCHS=1650; CHUNKS="150 300 450 600"; HALF=--device_cache_half
else
  SIZE=256; S1_EPOCHS=1250; CHUNKS="150 300 450 600"; HALF=
fi

mkdir -p "$R" "$CK"

SYN="--dataset $DS --synthetic --synthetic_mode correlated --synthetic_size $SIZE"

# ---- stage 1: VQ-VAE codec ----
python -u -m fdm_tpu train-vqvae $SYN --epochs $S1_EPOCHS \
  --set train.batch_size=$BS --device_cache $HALF --scan_steps 16 \
  --set train.log_dir=$R/tb_stage1 --set train.eval_every=250 \
  --set train.checkpoint_every=500 --set train.ckpt_async=false \
  --output_dir $CK/stage1 --resume \
  > $R/stage1_stdout.log 2>&1

# ---- stage-1 gate: the VQ round-trip must track GT motion temporally
# (if the codec cannot represent the articulation signal, stage 2 has
# nothing to learn — the round-3 failure mode; stop here, loudly) ----
python -u -m fdm_tpu sample-vqvae $SYN \
  --params $CK/stage1/${DS}_vqvae_params.msgpack \
  --output_dir /tmp/r4c_${DS}_vq > $R/sample_vqvae_stdout.log 2>&1

python -u -m fdm_tpu correlation $SYN \
  --pred_path /tmp/r4c_${DS}_vq --min_delta 0.5 \
  --json_out $R/correlation_stage1_roundtrip.json \
  > $R/correlation_stage1_stdout.log 2>&1

# ---- stage-1 memorization probe: train-split roundtrip next to the
# test gate (their gap IS the memorization signal) ----
python -u -m fdm_tpu sample-vqvae $SYN --split train --max_clips 64 \
  --params $CK/stage1/${DS}_vqvae_params.msgpack \
  --output_dir /tmp/r4c_${DS}_vq_train \
  > $R/sample_vqvae_train_stdout.log 2>&1
python -u -m fdm_tpu correlation $SYN --split train --max_clips 64 \
  --pred_path /tmp/r4c_${DS}_vq_train \
  --json_out $R/correlation_stage1_train_roundtrip.json \
  > $R/correlation_stage1_train_stdout.log 2>&1
tail -1 $R/correlation_stage1_train_stdout.log || true

# ---- stage 2 in chunks; sample + correlation after each; stop early on
# success ----
PASSED=0
for EP in $CHUNKS; do
  python -u -m fdm_tpu train-diffusion $SYN --epochs $EP \
    --set train.batch_size=$BS --device_cache $HALF --scan_steps 16 \
    --set train.log_dir=$R/tb_stage2 --set train.eval_every=100 \
    --set train.checkpoint_every=150 --set train.ckpt_async=false \
    --stage1 $CK/stage1/${DS}_vqvae_params.msgpack \
    --train_audio_encoder --output_dir $CK/stage2 --resume \
    >> $R/stage2_stdout.log 2>&1

  python -u -m fdm_tpu sample-diffusion $SYN --batch_size 8 \
    --stage1 $CK/stage1/${DS}_vqvae_params.msgpack \
    --stage2 $CK/stage2/${DS}_fdm_params.msgpack \
    --audio_params $CK/stage2/${DS}_audio_params.msgpack \
    --output_dir /tmp/r4c_${DS}_samples_$EP \
    > $R/sample_e${EP}_stdout.log 2>&1

  # report-only mid-run; the gated artifact below decides
  python -u -m fdm_tpu correlation $SYN \
    --pred_path /tmp/r4c_${DS}_samples_$EP \
    --json_out $R/correlation_e${EP}.json \
    > $R/correlation_e${EP}_stdout.log 2>&1
  tail -1 $R/correlation_e${EP}_stdout.log || true

  if python -u -m fdm_tpu correlation $SYN \
       --pred_path /tmp/r4c_${DS}_samples_$EP --min_delta 0.5 \
       --json_out $R/correlation_${DS}.json \
       > $R/correlation_final_stdout.log 2>&1; then
    PASSED=$EP
    break
  fi
done

# ---- artifact-existence asserts + the learning-evidence gate ----
for f in $R/correlation_stage1_roundtrip.json $R/correlation_${DS}.json; do
  test -s "$f" || { echo "MISSING ARTIFACT: $f"; exit 1; }
done
if [ "$PASSED" = "0" ]; then
  echo "R4 ${DS^^} PIPELINE: correlation gate FAILED after 1200 epochs"
  exit 1
fi
echo "R4 ${DS^^} PIPELINE DONE (gate passed at epoch $PASSED)"
