#!/bin/bash
# BIWI convergence rehearsal: the heaviest configuration (23370-vertex
# scans, in_dim 70110, wav2vec2-base audio) through the full acceptance
# path at full production size on hardware: two-stage synthetic training,
# DDIM-50 sampling, then the BIWI metric family (MVE/LVE/FDD/Diversity).
set -x
cd /root/repo
R3=runs_r3d_biwi
CK=checkpoints/r3d_biwi
mkdir -p $R3 $CK

python -u -m fdm_tpu train-vqvae --dataset biwi --synthetic --epochs 30 \
  --set train.log_dir=$R3 \
  --ema_decay 0.999 --output_dir $CK/stage1 \
  > $R3/stage1_stdout.log 2>&1 || exit 1

python -u -m fdm_tpu train-diffusion --dataset biwi --synthetic --epochs 20 \
  --set train.log_dir=$R3 \
  --stage1 $CK/stage1/biwi_vqvae_params.msgpack \
  --train_audio_encoder --output_dir $CK/stage2 \
  > $R3/stage2_stdout.log 2>&1 || exit 1

python -u -m fdm_tpu sample-diffusion --dataset biwi --synthetic \
  --stage1 $CK/stage1/biwi_vqvae_params.msgpack \
  --stage2 $CK/stage2/biwi_fdm_params.msgpack \
  --audio_params $CK/stage2/biwi_audio_params.msgpack \
  --all_conditions \
  --output_dir /tmp/r3biwi_samples --dump_gt_dir /tmp/r3biwi_gt \
  > $R3/sample_stdout.log 2>&1 || exit 1

# synthetic BIWI regions at reference-style cardinalities (ids < 23370)
python - <<'PY' || exit 1
import numpy as np
rng = np.random.RandomState(0)
ids = rng.permutation(23370)
np.save("/tmp/r3biwi_lip.npy", np.sort(ids[:1000]))
np.save("/tmp/r3biwi_upper.npy", np.sort(ids[1000:2500]))
np.save("/tmp/r3biwi_tmpl.npy", np.zeros(70110, np.float32))
PY

python -u -m fdm_tpu metrics --pred_path /tmp/r3biwi_samples \
  --gt_path /tmp/r3biwi_gt \
  --lip_region /tmp/r3biwi_lip.npy --upper_region /tmp/r3biwi_upper.npy \
  --templates /tmp/r3biwi_tmpl.npy --json \
  2>$R3/metrics_stderr.log | tail -1 > $R3/metrics_synthetic.json || exit 1
cat $R3/metrics_synthetic.json
echo "R3 BIWI CONVERGENCE PIPELINE DONE"
