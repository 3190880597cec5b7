#!/bin/bash
# Resume the round-3 correlated-learning rehearsal (pipeline.sh) after the
# driver session died at stage-2 epoch 570/800. Resumes stage 2 from the
# last complete orbax checkpoint (step 3200 ~= epoch 400) and then runs the
# unchanged tail of pipeline.sh: sample -> time-reversed control -> metrics
# (matched + control) -> CFG pass.
set -x
cd /root/repo
R3=runs_r3corr
CK=checkpoints/r3corr

python -u -m fdm_tpu train-diffusion --dataset mead --synthetic \
  --synthetic_mode correlated --epochs 800 \
  --set train.log_dir=$R3 --set train.eval_every=25 --set train.checkpoint_every=100 \
  --stage1 $CK/stage1/mead_vqvae_params.msgpack \
  --train_audio_encoder --output_dir $CK/stage2 --resume \
  > $R3/stage2_resume_stdout.log 2>&1 || exit 1

python -u -m fdm_tpu sample-diffusion --dataset mead --synthetic \
  --synthetic_mode correlated \
  --stage1 $CK/stage1/mead_vqvae_params.msgpack \
  --stage2 $CK/stage2/mead_fdm_params.msgpack \
  --audio_params $CK/stage2/mead_audio_params.msgpack \
  --output_dir /tmp/r3corr_samples --dump_gt_dir /tmp/r3corr_gt \
  > $R3/sample_stdout.log 2>&1 || exit 1

python - <<'PY' || exit 1
import glob, os
import numpy as np
os.makedirs("/tmp/r3corr_gt_rev", exist_ok=True)
for f in glob.glob("/tmp/r3corr_gt/*.npy"):
    a = np.load(f)
    np.save(os.path.join("/tmp/r3corr_gt_rev", os.path.basename(f)), a[::-1].copy())
PY

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

python -u -m fdm_tpu sample-diffusion --dataset mead --synthetic \
  --synthetic_mode correlated --cfg_scale 2.5 \
  --stage1 $CK/stage1/mead_vqvae_params.msgpack \
  --stage2 $CK/stage2/mead_fdm_params.msgpack \
  --audio_params $CK/stage2/mead_audio_params.msgpack \
  --output_dir /tmp/r3corr_samples_cfg \
  > $R3/sample_cfg_stdout.log 2>&1 || exit 1

python -u -m fdm_tpu metrics --pred_path /tmp/r3corr_samples_cfg \
  --gt_path /tmp/r3corr_gt \
  --face_region /tmp/r3corr_face.npy --lip_region /tmp/r3corr_lip.npy \
  --emotion_region /tmp/r3corr_emotion.npy --json \
  2>$R3/metrics_cfg_stderr.log | tail -1 > $R3/metrics_matched_cfg.json || exit 1
echo "cfg:"; cat $R3/metrics_matched_cfg.json
echo "R3 CORRELATED CFG PASS DONE"
