#!/bin/bash
# fdm_tpu side of the head-to-head, round-5 v2: identical budget and
# matched capacity to tpu_side.sh (and to the torch reference run), but
# with the stage-1 AMSGrad parity fix active (train.stage1_amsgrad=true
# default — the optimizer every reference VQ trainer uses). Optional
# $2 = train.seed for a seed-variance arm (data universe unchanged).
# Usage: tpu_side_v2.sh <tag> [train_seed]
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

TAG=${1:?usage: tpu_side_v2.sh <tag> [train_seed]}
TSEED=${2:-0}
H2H=runs_r5/headtohead
OUT=$H2H/tpu_$TAG
SYN="--dataset mead --synthetic --synthetic_mode correlated --synthetic_size 32"
SETS="--set vqvae.hidden_size=512 --set vqvae.num_hidden_layers=4 \
      --set vqvae.num_attention_heads=8 --set vqvae.intermediate_size=768 \
      --set fdm.num_layers=4 --set fdm.audio_layers=2 \
      --set fdm.cfg_mask_prob=0.0 --set train.batch_size=1 \
      --set train.seed=$TSEED \
      --set train.eval_every=25 --set train.checkpoint_every=100000 \
      --set train.ckpt_async=false"

if [ ! -s $OUT/stage1/mead_vqvae_params.msgpack ]; then
  python -u -m fdm_tpu train-vqvae $SYN $SETS --epochs 120 \
    --scan_steps 16 --device_cache \
    --output_dir $OUT/stage1 --resume \
    > $H2H/tpu_${TAG}_stage1.log 2>&1
fi

if [ ! -s $OUT/stage2/mead_fdm_params.msgpack ]; then
  python -u -m fdm_tpu train-diffusion $SYN $SETS --epochs 100 \
    --scan_steps 16 --device_cache \
    --stage1 $OUT/stage1/mead_vqvae_params.msgpack \
    --train_audio_encoder \
    --output_dir $OUT/stage2 --resume \
    > $H2H/tpu_${TAG}_stage2.log 2>&1
fi

if [ ! -d $OUT/preds ] || [ -z "$(ls $OUT/preds 2>/dev/null)" ]; then
  python -u -m fdm_tpu sample-diffusion $SYN $SETS --batch_size 1 \
    --sampler ddpm \
    --stage1 $OUT/stage1/mead_vqvae_params.msgpack \
    --stage2 $OUT/stage2/mead_fdm_params.msgpack \
    --audio_params $OUT/stage2/mead_audio_params.msgpack \
    --output_dir $OUT/preds \
    > $H2H/tpu_${TAG}_sample.log 2>&1
fi

# stage-1 roundtrip of this arm (TPU), test split — the codec ceiling
python -u -m fdm_tpu sample-vqvae $SYN $SETS --max_clips 8 \
  --params $OUT/stage1/mead_vqvae_params.msgpack \
  --output_dir /tmp/h2h_rt_${TAG}_test > $H2H/rt_${TAG}_test_sample.log 2>&1
JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
python -u -m fdm_tpu correlation $SYN $SETS --max_clips 8 \
  --pred_path /tmp/h2h_rt_${TAG}_test --min_delta 0.0 \
  --json_out $H2H/rt_${TAG}_test_correlation.json 2>&1 | tail -1
echo "H2H TPU $TAG DONE"
