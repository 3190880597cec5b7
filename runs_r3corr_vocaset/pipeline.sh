#!/bin/bash
# VOCASET learning rehearsal on correlated synthetic data (see
# runs_r3corr/pipeline.sh for the design): the densest token
# regrouping (16 tokens/frame, HuBERT-large trained from scratch),
# DDIM-100 sampling with each clip's own style, matched vs time-reversed-GT
# control through the VOCASET metric family.
set -x
cd /root/repo
R3=runs_r3corr_vocaset
CK=checkpoints/r3corr_vocaset
mkdir -p $R3 $CK

python -u -m fdm_tpu train-vqvae --dataset vocaset --synthetic \
  --synthetic_mode correlated --epochs 150 \
  --set train.log_dir=$R3 --set train.eval_every=25 --set train.checkpoint_every=100 \
  --ema_decay 0.999 --output_dir $CK/stage1 \
  > $R3/stage1_stdout.log 2>&1 || exit 1

python -u -m fdm_tpu train-diffusion --dataset vocaset --synthetic \
  --synthetic_mode correlated --epochs 400 \
  --set train.log_dir=$R3 --set train.eval_every=25 --set train.checkpoint_every=100 \
  --stage1 $CK/stage1/vocaset_vqvae_params.msgpack \
  --train_audio_encoder --output_dir $CK/stage2 \
  > $R3/stage2_stdout.log 2>&1 || exit 1

python -u -m fdm_tpu sample-diffusion --dataset vocaset --synthetic \
  --synthetic_mode correlated \
  --stage1 $CK/stage1/vocaset_vqvae_params.msgpack \
  --stage2 $CK/stage2/vocaset_fdm_params.msgpack \
  --audio_params $CK/stage2/vocaset_audio_params.msgpack \
  --output_dir /tmp/r3corrv_samples --dump_gt_dir /tmp/r3corrv_gt \
  > $R3/sample_stdout.log 2>&1 || exit 1

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
