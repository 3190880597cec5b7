#!/bin/bash
# Round-4 full-size MEAD correlated rehearsal (VERDICT r3 "missing" #1).
#
# Round 3's null result had two causes, both fixed before this run:
#  - the synthetic articulation map's vertex signal (~5e-4 std) sat 3x
#    BELOW the codec's reconstruction floor (~1.3e-3); the redesigned map
#    (commit 7b5a3a7) concentrates jaw/lip motion at ~3e-3, 2x above it.
#  - 12.8k stage-2 steps at batch 1 was a fraction of the reference's data
#    exposure; this run uses batch 8 (10.9 steps/s measured, so one b8
#    step costs a third of a b1 step wall-clock) and 2x the clips.
#
# Shell hygiene per ADVICE r3: pipefail, explicit PYTHONPATH (keeping the
# axon sitecustomize entry), no `| tee` guards, end-of-run artifact asserts.
# Learning evidence is checkpointed: the packaged `correlation` CLI runs
# after EVERY stage-2 chunk so progress (or its absence) is visible in
# runs_r4/correlation_e*.json rather than only at the end (VERDICT weak #6).
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

R4=runs_r4
CK=checkpoints/r4corr
SIZE=128   # 128 train / 16 valid / 16 test clips
BS=8

mkdir -p $R4 $CK

# ---- stage 1: EVQ-VAE codec, batch-8 DP on the single chip ----
python -u -m fdm_tpu train-vqvae --dataset mead --synthetic \
  --synthetic_mode correlated --synthetic_size $SIZE --epochs 2500 \
  --set train.batch_size=$BS \
  --set train.log_dir=$R4/tb_stage1 --set train.eval_every=250 \
  --set train.checkpoint_every=500 \
  --output_dir $CK/stage1 --resume \
  > $R4/stage1_stdout.log 2>&1

# ---- stage-1 gate: the VQ round-trip must track GT motion temporally.
# If the codec cannot reconstruct the articulation signal, stage 2 has
# nothing to learn (the round-3 failure mode) — stop here, loudly.
python -u -m fdm_tpu sample-vqvae --dataset mead --synthetic \
  --synthetic_mode correlated --synthetic_size $SIZE \
  --params $CK/stage1/mead_vqvae_params.msgpack \
  --output_dir /tmp/r4c_vq > $R4/sample_vqvae_stdout.log 2>&1

python -u -m fdm_tpu correlation --dataset mead --synthetic \
  --synthetic_mode correlated --synthetic_size $SIZE \
  --pred_path /tmp/r4c_vq --min_delta 0.5 \
  --json_out $R4/correlation_stage1_roundtrip.json \
  > $R4/correlation_stage1_stdout.log 2>&1

# ---- stage 2 in chunks; sample + correlation after each chunk ----
for EP in 300 600 900 1200; do
  python -u -m fdm_tpu train-diffusion --dataset mead --synthetic \
    --synthetic_mode correlated --synthetic_size $SIZE --epochs $EP \
    --set train.batch_size=$BS \
    --set train.log_dir=$R4/tb_stage2 --set train.eval_every=100 \
    --set train.checkpoint_every=300 \
    --stage1 $CK/stage1/mead_vqvae_params.msgpack \
    --train_audio_encoder --output_dir $CK/stage2 --resume \
    >> $R4/stage2_stdout.log 2>&1

  python -u -m fdm_tpu sample-diffusion --dataset mead --synthetic \
    --synthetic_mode correlated --synthetic_size $SIZE --batch_size 8 \
    --stage1 $CK/stage1/mead_vqvae_params.msgpack \
    --stage2 $CK/stage2/mead_fdm_params.msgpack \
    --audio_params $CK/stage2/mead_audio_params.msgpack \
    --output_dir /tmp/r4c_samples_$EP --dump_gt_dir /tmp/r4c_gt \
    > $R4/sample_e${EP}_stdout.log 2>&1

  # report-only mid-run (min_delta 0); the final gate is below
  python -u -m fdm_tpu correlation --dataset mead --synthetic \
    --synthetic_mode correlated --synthetic_size $SIZE \
    --pred_path /tmp/r4c_samples_$EP \
    --json_out $R4/correlation_e${EP}.json \
    > $R4/correlation_e${EP}_stdout.log 2>&1
  tail -1 $R4/correlation_e${EP}_stdout.log || true
done

# ---- final learning-evidence gate (VERDICT: matched - mismatched >= 0.5) ----
python -u -m fdm_tpu correlation --dataset mead --synthetic \
  --synthetic_mode correlated --synthetic_size $SIZE \
  --pred_path /tmp/r4c_samples_1200 --min_delta 0.5 \
  --json_out $R4/correlation_mead.json \
  > $R4/correlation_final_stdout.log 2>&1

# ---- artifact-existence asserts (ADVICE r3: never trust silent success) ----
for f in $R4/correlation_stage1_roundtrip.json $R4/correlation_e1200.json \
         $R4/correlation_mead.json; do
  test -s "$f" || { echo "MISSING ARTIFACT: $f"; exit 1; }
done
echo "R4 MEAD PIPELINE DONE"
