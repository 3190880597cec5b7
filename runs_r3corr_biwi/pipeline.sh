#!/bin/bash
# BIWI learning rehearsal on correlated synthetic data (see
# runs_r3corr/pipeline.sh for the design): the heaviest configuration
# (23370-vertex scans, in_dim 70110, wav2vec2-base trained from scratch),
# DDIM-50 sampling with each clip's own style, matched vs time-reversed-GT
# control through the BIWI metric family.
set -x
cd /root/repo
R3=runs_r3corr_biwi
CK=checkpoints/r3corr_biwi
mkdir -p $R3 $CK

python -u -m fdm_tpu train-vqvae --dataset biwi --synthetic \
  --synthetic_mode correlated --epochs 150 \
  --set train.log_dir=$R3 --set train.eval_every=25 --set train.checkpoint_every=100 \
  --ema_decay 0.999 --output_dir $CK/stage1 \
  > $R3/stage1_stdout.log 2>&1 || exit 1

python -u -m fdm_tpu train-diffusion --dataset biwi --synthetic \
  --synthetic_mode correlated --epochs 400 \
  --set train.log_dir=$R3 --set train.eval_every=25 --set train.checkpoint_every=100 \
  --stage1 $CK/stage1/biwi_vqvae_params.msgpack \
  --train_audio_encoder --output_dir $CK/stage2 \
  > $R3/stage2_stdout.log 2>&1 || exit 1

python -u -m fdm_tpu sample-diffusion --dataset biwi --synthetic \
  --synthetic_mode correlated \
  --stage1 $CK/stage1/biwi_vqvae_params.msgpack \
  --stage2 $CK/stage2/biwi_fdm_params.msgpack \
  --audio_params $CK/stage2/biwi_audio_params.msgpack \
  --output_dir /tmp/r3corrb_samples --dump_gt_dir /tmp/r3corrb_gt \
  > $R3/sample_stdout.log 2>&1 || exit 1

python - <<'PY' || exit 1
import glob, os
import numpy as np
os.makedirs("/tmp/r3corrb_gt_rev", exist_ok=True)
for f in glob.glob("/tmp/r3corrb_gt/*.npy"):
    a = np.load(f)
    np.save(os.path.join("/tmp/r3corrb_gt_rev", os.path.basename(f)), a[::-1].copy())
PY

# synthetic BIWI regions at reference-style cardinalities (ids < 23370)
python - <<'PY' || exit 1
import numpy as np
rng = np.random.RandomState(0)
ids = rng.permutation(23370)
np.save("/tmp/r3corrb_lip.npy", np.sort(ids[:1000]))
np.save("/tmp/r3corrb_upper.npy", np.sort(ids[1000:2500]))
np.save("/tmp/r3corrb_tmpl.npy", np.zeros(70110, np.float32))
PY

python -u -m fdm_tpu metrics --pred_path /tmp/r3corrb_samples \
  --gt_path /tmp/r3corrb_gt \
  --lip_region /tmp/r3corrb_lip.npy --upper_region /tmp/r3corrb_upper.npy \
  --templates /tmp/r3corrb_tmpl.npy --json \
  2>$R3/metrics_stderr.log | tail -1 > $R3/metrics_matched.json || exit 1

python -u -m fdm_tpu metrics --pred_path /tmp/r3corrb_samples \
  --gt_path /tmp/r3corrb_gt_rev \
  --lip_region /tmp/r3corrb_lip.npy --upper_region /tmp/r3corrb_upper.npy \
  --templates /tmp/r3corrb_tmpl.npy --json \
  2>$R3/metrics_control_stderr.log | tail -1 > $R3/metrics_control_reversed.json || exit 1

echo "matched:"; cat $R3/metrics_matched.json
echo "control:"; cat $R3/metrics_control_reversed.json
echo "R3 BIWI CORRELATED LEARNING PIPELINE DONE"
