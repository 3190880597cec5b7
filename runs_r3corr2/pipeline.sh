#!/bin/bash
# Round-3 correlated-synthetic learning rehearsal, take 2.
#
# Take 1 (runs_r3corr/) failed to show audio->motion learning at full size
# and the post-mortem found out why: with the smoke default of 8 training
# clips, stage 1's whole 300-epoch budget is 2,400 optimizer steps — the
# codec's val_recon was still at the zero-output plateau (0.081 = the
# static-face L1) until ~epoch 200 and had only reached 0.041 when the
# budget ran out, so stage 2 trained against a codec that cannot represent
# the (realistically small, ~1% of static scale) envelope signal, and the
# sampled motion decoded to noise (temporal corr vs GT ~= 0.001). The
# matched-vs-time-reversed metrics comparison also proved ORDER-INSENSITIVE
# for near-constant predictions (FVE/LVE compare frame sets, so reversal
# changes only the pairing): take 2 adds a direct temporal-correlation
# analysis with matched vs MISMATCHED-AUDIO controls (the tiny e2e test's
# method, tests/test_correlated_synthetic.py).
#
# Take 2: --synthetic_size 64 (64 train / 8 eval clips) -> 64 steps/epoch;
# stage 1 600 epochs = 38,400 steps, stage 2 200 epochs = 12,800 steps,
# both at the reference lr 1e-4 batch 1 regime (3e-4 diverges: quant loss
# 30->300 within 6 epochs, observed in take 1's first attempt).
# Hardened post-hoc per ADVICE r3 (the tee pipeline swallowed the
# analyzer's crash and PYTHONPATH lost the repo root when this ran):
# superseded by runs_r4/pipeline_family.sh for new runs.
set -x
set -euo pipefail
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
R3=runs_r3corr2
CK=checkpoints/r3corr2
SIZE=64

mkdir -p $R3

python -u -m fdm_tpu train-vqvae --dataset mead --synthetic \
  --synthetic_mode correlated --synthetic_size $SIZE --epochs 600 \
  --set train.log_dir=$R3 --set train.eval_every=50 \
  --set train.checkpoint_every=200 \
  --output_dir $CK/stage1 --resume \
  > $R3/stage1_stdout.log 2>&1 || exit 1

python -u -m fdm_tpu train-diffusion --dataset mead --synthetic \
  --synthetic_mode correlated --synthetic_size $SIZE --epochs 200 \
  --set train.log_dir=$R3 --set train.eval_every=50 \
  --set train.checkpoint_every=100 \
  --stage1 $CK/stage1/mead_vqvae_params.msgpack \
  --train_audio_encoder --output_dir $CK/stage2 --resume \
  > $R3/stage2_stdout.log 2>&1 || exit 1

python -u -m fdm_tpu sample-diffusion --dataset mead --synthetic \
  --synthetic_mode correlated --synthetic_size $SIZE \
  --stage1 $CK/stage1/mead_vqvae_params.msgpack \
  --stage2 $CK/stage2/mead_fdm_params.msgpack \
  --audio_params $CK/stage2/mead_audio_params.msgpack \
  --output_dir /tmp/r3c2_samples --dump_gt_dir /tmp/r3c2_gt \
  > $R3/sample_stdout.log 2>&1 || exit 1

# ---- direct learning evidence: temporal correlation, matched vs
# ---- mismatched audio (recomputed GT; the map is deterministic) ----
python -u runs_r3corr2/analyze_correlation.py \
  --pred /tmp/r3c2_samples --size $SIZE \
  --json_out $R3/correlation.json 2>&1 | tee $R3/correlation_stdout.log \
  || exit 1

# ---- metrics-CLI dress rehearsal (matched + reversed control) ----
python - <<'PY' || exit 1
import glob, os
import numpy as np
os.makedirs("/tmp/r3c2_gt_rev", exist_ok=True)
for f in glob.glob("/tmp/r3c2_gt/*.npy"):
    a = np.load(f)
    np.save(os.path.join("/tmp/r3c2_gt_rev", os.path.basename(f)), a[::-1].copy())
PY

python - <<'PY' || exit 1
import numpy as np
rng = np.random.RandomState(0)
ids = rng.permutation(5023)
np.save("/tmp/r3c2_face.npy", np.sort(ids[:2019]))
np.save("/tmp/r3c2_lip.npy", np.sort(ids[2019:2019+648]))
np.save("/tmp/r3c2_emotion.npy", np.sort(ids[2019+648:2019+648+1371]))
PY

python -u -m fdm_tpu metrics --pred_path /tmp/r3c2_samples \
  --gt_path /tmp/r3c2_gt \
  --face_region /tmp/r3c2_face.npy --lip_region /tmp/r3c2_lip.npy \
  --emotion_region /tmp/r3c2_emotion.npy --json \
  2>$R3/metrics_stderr.log | tail -1 > $R3/metrics_matched.json || exit 1

python -u -m fdm_tpu metrics --pred_path /tmp/r3c2_samples \
  --gt_path /tmp/r3c2_gt_rev \
  --face_region /tmp/r3c2_face.npy --lip_region /tmp/r3c2_lip.npy \
  --emotion_region /tmp/r3c2_emotion.npy --json \
  2>$R3/metrics_control_stderr.log | tail -1 > $R3/metrics_control_reversed.json || exit 1

echo "matched:"; cat $R3/metrics_matched.json
echo "reversed control:"; cat $R3/metrics_control_reversed.json
echo "R3C2 PIPELINE DONE"
