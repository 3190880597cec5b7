#!/bin/bash
# Round-3 convergence rehearsal: two-stage synthetic training under the
# corrected dropout regime (now the complete HF set incl. attention-probs/FFN-activation dropout and LayerDrop, drawn with the hardware RNG), then the
# full acceptance path: sample-diffusion -> metrics (FVE/LVE/EME JSON).
set -x
cd /root/repo
R3=runs_r3d
CK=checkpoints/r3d
mkdir -p $R3 $CK

python -u -m fdm_tpu train-vqvae --dataset mead --synthetic --epochs 30 \
  --set train.log_dir=$R3 \
  --ema_decay 0.999 --output_dir $CK/stage1 \
  > $R3/stage1_stdout.log 2>&1 || exit 1

python -u -m fdm_tpu train-diffusion --dataset mead --synthetic --epochs 20 \
  --set train.log_dir=$R3 \
  --stage1 $CK/stage1/mead_vqvae_params.msgpack \
  --train_audio_encoder --output_dir $CK/stage2 \
  > $R3/stage2_stdout.log 2>&1 || exit 1

python -u -m fdm_tpu sample-diffusion --dataset mead --synthetic \
  --stage1 $CK/stage1/mead_vqvae_params.msgpack \
  --stage2 $CK/stage2/mead_fdm_params.msgpack \
  --audio_params $CK/stage2/mead_audio_params.msgpack \
  --output_dir /tmp/r3d_samples --dump_gt_dir /tmp/r3d_gt \
  > $R3/sample_stdout.log 2>&1 || exit 1

# synthetic FLAME-vertex regions at the reference cardinalities
# (metric/face_vertices.npy 2019, lip 648, emotion 1371; ids < 5023)
python - <<'PY' || exit 1
import numpy as np
rng = np.random.RandomState(0)
ids = rng.permutation(5023)
np.save("/tmp/r3d_face.npy", np.sort(ids[:2019]))
np.save("/tmp/r3d_lip.npy", np.sort(ids[2019:2019+648]))
np.save("/tmp/r3d_emotion.npy", np.sort(ids[2019+648:2019+648+1371]))
PY

python -u -m fdm_tpu metrics --pred_path /tmp/r3d_samples --gt_path /tmp/r3d_gt \
  --face_region /tmp/r3d_face.npy --lip_region /tmp/r3d_lip.npy \
  --emotion_region /tmp/r3d_emotion.npy --json \
  2>$R3/metrics_stderr.log | tail -1 > $R3/metrics_synthetic.json || exit 1
cat $R3/metrics_synthetic.json
echo "R3 CONVERGENCE PIPELINE DONE"
