#!/bin/bash
# Round-3 LEARNING rehearsal on correlated synthetic data: motion is a
# deterministic function of the audio envelope (fdm_tpu/data/synthetic.py),
# so — unlike the iid-noise rehearsals, which can only validate plumbing —
# the evaluation metrics can actually IMPROVE with training, and a
# matched-vs-control comparison shows the system learned audio->motion at
# full production MEAD dimensions (FLAME 5023-vertex decode, HuBERT-large
# trained from scratch, reference batch-1 regime).
# Control: each prediction scored against its own clip's ground truth vs the
# TIME-REVERSED ground truth (same length, same marginal statistics, no
# temporal alignment) — a model that ignored audio scores the same on both.
set -x
cd /root/repo
R3=runs_r3corr
CK=checkpoints/r3corr
mkdir -p $R3 $CK

# reference learning rate (1e-4): 3e-4 measurably diverges the full-size
# codebook (quant loss 30 -> 300 in 6 epochs); more epochs instead — at
# ~50-70 CLI steps/s the whole stage is minutes
python -u -m fdm_tpu train-vqvae --dataset mead --synthetic \
  --synthetic_mode correlated --epochs 300 \
  --set train.log_dir=$R3 --set train.eval_every=25 --set train.checkpoint_every=100 \
  --ema_decay 0.999 --output_dir $CK/stage1 \
  > $R3/stage1_stdout.log 2>&1 || exit 1

python -u -m fdm_tpu train-diffusion --dataset mead --synthetic \
  --synthetic_mode correlated --epochs 800 \
  --set train.log_dir=$R3 --set train.eval_every=25 --set train.checkpoint_every=100 \
  --stage1 $CK/stage1/mead_vqvae_params.msgpack \
  --train_audio_encoder --output_dir $CK/stage2 \
  > $R3/stage2_stdout.log 2>&1 || exit 1

python -u -m fdm_tpu sample-diffusion --dataset mead --synthetic \
  --synthetic_mode correlated \
  --stage1 $CK/stage1/mead_vqvae_params.msgpack \
  --stage2 $CK/stage2/mead_fdm_params.msgpack \
  --audio_params $CK/stage2/mead_audio_params.msgpack \
  --output_dir /tmp/r3corr_samples --dump_gt_dir /tmp/r3corr_gt \
  > $R3/sample_stdout.log 2>&1 || exit 1

# time-reversed-GT control directory
python - <<'PY' || exit 1
import glob, os
import numpy as np
os.makedirs("/tmp/r3corr_gt_rev", exist_ok=True)
for f in glob.glob("/tmp/r3corr_gt/*.npy"):
    a = np.load(f)
    np.save(os.path.join("/tmp/r3corr_gt_rev", os.path.basename(f)), a[::-1].copy())
PY

# synthetic FLAME-vertex regions at the reference cardinalities
# (metric/face_vertices.npy 2019, lip 648, emotion 1371; ids < 5023)
python - <<'PY' || exit 1
import numpy as np
rng = np.random.RandomState(0)
ids = rng.permutation(5023)
np.save("/tmp/r3corr_face.npy", np.sort(ids[:2019]))
np.save("/tmp/r3corr_lip.npy", np.sort(ids[2019:2019+648]))
np.save("/tmp/r3corr_emotion.npy", np.sort(ids[2019+648:2019+648+1371]))
PY

python -u -m fdm_tpu metrics --pred_path /tmp/r3corr_samples \
  --gt_path /tmp/r3corr_gt \
  --face_region /tmp/r3corr_face.npy --lip_region /tmp/r3corr_lip.npy \
  --emotion_region /tmp/r3corr_emotion.npy --json \
  2>$R3/metrics_stderr.log | tail -1 > $R3/metrics_matched.json || exit 1

python -u -m fdm_tpu metrics --pred_path /tmp/r3corr_samples \
  --gt_path /tmp/r3corr_gt_rev \
  --face_region /tmp/r3corr_face.npy --lip_region /tmp/r3corr_lip.npy \
  --emotion_region /tmp/r3corr_emotion.npy --json \
  2>$R3/metrics_control_stderr.log | tail -1 > $R3/metrics_control_reversed.json || exit 1

echo "matched:"; cat $R3/metrics_matched.json
echo "control:"; cat $R3/metrics_control_reversed.json
echo "R3 CORRELATED LEARNING PIPELINE DONE"
