#!/bin/bash
# VOCASET convergence rehearsal: the third model family (5023-vertex FLAME
# mesh, in_dim 15069, HuBERT-large audio, 16 tokens/frame — the densest
# token regrouping) through the full acceptance path at production size on
# hardware: two-stage synthetic training, DDIM-100 all-conditions
# sampling, then the vertex metric family (MVE/LVE/FDD/Diversity).
set -x
cd /root/repo
R3=runs_r3d_vocaset
CK=checkpoints/r3d_vocaset
mkdir -p $R3 $CK

python -u -m fdm_tpu train-vqvae --dataset vocaset --synthetic --epochs 30 \
  --set train.log_dir=$R3 \
  --ema_decay 0.999 --output_dir $CK/stage1 \
  > $R3/stage1_stdout.log 2>&1 || exit 1

python -u -m fdm_tpu train-diffusion --dataset vocaset --synthetic --epochs 20 \
  --set train.log_dir=$R3 \
  --stage1 $CK/stage1/vocaset_vqvae_params.msgpack \
  --train_audio_encoder --output_dir $CK/stage2 \
  > $R3/stage2_stdout.log 2>&1 || exit 1

python -u -m fdm_tpu sample-diffusion --dataset vocaset --synthetic \
  --stage1 $CK/stage1/vocaset_vqvae_params.msgpack \
  --stage2 $CK/stage2/vocaset_fdm_params.msgpack \
  --audio_params $CK/stage2/vocaset_audio_params.msgpack \
  --all_conditions \
  --output_dir /tmp/r3vocaset_samples --dump_gt_dir /tmp/r3vocaset_gt \
  > $R3/sample_stdout.log 2>&1 || exit 1

# synthetic VOCASET regions at reference-style cardinalities (ids < 5023)
python - <<'PY' || exit 1
import numpy as np
rng = np.random.RandomState(0)
ids = rng.permutation(5023)
np.save("/tmp/r3vocaset_lip.npy", np.sort(ids[:1000]))
np.save("/tmp/r3vocaset_upper.npy", np.sort(ids[1000:2500]))
np.save("/tmp/r3vocaset_tmpl.npy", np.zeros(15069, np.float32))
PY

python -u -m fdm_tpu metrics --pred_path /tmp/r3vocaset_samples \
  --gt_path /tmp/r3vocaset_gt \
  --lip_region /tmp/r3vocaset_lip.npy --upper_region /tmp/r3vocaset_upper.npy \
  --templates /tmp/r3vocaset_tmpl.npy --json \
  2>$R3/metrics_stderr.log | tail -1 > $R3/metrics_synthetic.json || exit 1
cat $R3/metrics_synthetic.json
echo "R3 VOCASET CONVERGENCE PIPELINE DONE"
