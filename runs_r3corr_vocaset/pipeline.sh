#!/bin/bash
# VOCASET learning rehearsal on correlated synthetic data, take-2 regime
# (see runs_r3corr2/pipeline.sh for the post-mortem that set it): 64
# training clips so the epoch budgets translate into a realistic
# optimizer-step count, plus the direct temporal-correlation analysis with
# mismatched-audio controls — the time-reversal metrics control alone is
# order-insensitive for near-constant predictions.
#
# This is the densest token regrouping (16 tokens/frame, HuBERT-large
# trained from scratch), DDIM-100 sampling with each clip's own style,
# matched vs time-reversed-GT control through the VOCASET metric family.
# Hardened post-hoc per ADVICE r3 (the tee pipeline swallowed the
# analyzer's crash and PYTHONPATH lost the repo root when this ran):
# superseded by runs_r4/pipeline_family.sh for new runs.
set -x
set -euo pipefail
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
R3=runs_r3corr_vocaset
CK=checkpoints/r3corr_vocaset
SIZE=64
mkdir -p $R3 $CK

python -u -m fdm_tpu train-vqvae --dataset vocaset --synthetic \
  --synthetic_mode correlated --synthetic_size $SIZE --epochs 300 \
  --set train.log_dir=$R3 --set train.eval_every=50 --set train.checkpoint_every=100 \
  --ema_decay 0.999 --output_dir $CK/stage1 --resume \
  > $R3/stage1_stdout.log 2>&1 || exit 1

python -u -m fdm_tpu train-diffusion --dataset vocaset --synthetic \
  --synthetic_mode correlated --synthetic_size $SIZE --epochs 150 \
  --set train.log_dir=$R3 --set train.eval_every=50 --set train.checkpoint_every=100 \
  --stage1 $CK/stage1/vocaset_vqvae_params.msgpack \
  --train_audio_encoder --output_dir $CK/stage2 --resume \
  > $R3/stage2_stdout.log 2>&1 || exit 1

python -u -m fdm_tpu sample-diffusion --dataset vocaset --synthetic \
  --synthetic_mode correlated --synthetic_size $SIZE \
  --stage1 $CK/stage1/vocaset_vqvae_params.msgpack \
  --stage2 $CK/stage2/vocaset_fdm_params.msgpack \
  --audio_params $CK/stage2/vocaset_audio_params.msgpack \
  --output_dir /tmp/r3corrv_samples --dump_gt_dir /tmp/r3corrv_gt \
  > $R3/sample_stdout.log 2>&1 || exit 1

# ---- direct learning evidence: temporal correlation, matched vs
# ---- mismatched audio (GT recomputable; the map is deterministic) ----
python -u runs_r3corr2/analyze_correlation.py \
  --dataset vocaset --pred /tmp/r3corrv_samples --size $SIZE \
  --json_out $R3/correlation.json 2>&1 | tee $R3/correlation_stdout.log \
  || exit 1

python - <<'PY' || exit 1
import glob, os
import numpy as np
os.makedirs("/tmp/r3corrv_gt_rev", exist_ok=True)
for f in glob.glob("/tmp/r3corrv_gt/*.npy"):
    a = np.load(f)
    np.save(os.path.join("/tmp/r3corrv_gt_rev", os.path.basename(f)), a[::-1].copy())
PY

# synthetic VOCASET regions at reference-style cardinalities (ids < 5023)
python - <<'PY' || exit 1
import numpy as np
rng = np.random.RandomState(0)
ids = rng.permutation(5023)
np.save("/tmp/r3corrv_lip.npy", np.sort(ids[:1000]))
np.save("/tmp/r3corrv_upper.npy", np.sort(ids[1000:2500]))
np.save("/tmp/r3corrv_tmpl.npy", np.zeros(15069, np.float32))
PY

python -u -m fdm_tpu metrics --pred_path /tmp/r3corrv_samples \
  --gt_path /tmp/r3corrv_gt \
  --lip_region /tmp/r3corrv_lip.npy --upper_region /tmp/r3corrv_upper.npy \
  --templates /tmp/r3corrv_tmpl.npy --json \
  2>$R3/metrics_stderr.log | tail -1 > $R3/metrics_matched.json || exit 1

python -u -m fdm_tpu metrics --pred_path /tmp/r3corrv_samples \
  --gt_path /tmp/r3corrv_gt_rev \
  --lip_region /tmp/r3corrv_lip.npy --upper_region /tmp/r3corrv_upper.npy \
  --templates /tmp/r3corrv_tmpl.npy --json \
  2>$R3/metrics_control_stderr.log | tail -1 > $R3/metrics_control_reversed.json || exit 1

echo "matched:"; cat $R3/metrics_matched.json
echo "control:"; cat $R3/metrics_control_reversed.json
echo "R3 VOCASET CORRELATED LEARNING PIPELINE DONE"
