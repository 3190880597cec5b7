#!/bin/bash
# fdm_tpu side of the round-5 head-to-head (see h2h_config.py docstring).
# Same data (synthetic correlated MEAD, size 32, seed 0), same matched
# capacity (--set overrides mirror ref_train.py's shrinkages), same budget
# (bs=1, s1 120 epochs, s2 100 epochs), same sampler of record (DDPM-1000).
# No EMA, no CFG dropout (the reference trains without either).
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

H2H=runs_r5/headtohead
SYN="--dataset mead --synthetic --synthetic_mode correlated --synthetic_size 32"
SETS="--set vqvae.hidden_size=512 --set vqvae.num_hidden_layers=4 \
      --set vqvae.num_attention_heads=8 --set vqvae.intermediate_size=768 \
      --set fdm.num_layers=4 --set fdm.audio_layers=2 \
      --set fdm.cfg_mask_prob=0.0 --set train.batch_size=1 \
      --set train.eval_every=25 --set train.checkpoint_every=100000 \
      --set train.ckpt_async=false"

if [ ! -s $H2H/tpu/stage1/mead_vqvae_params.msgpack ]; then
  python -u -m fdm_tpu train-vqvae $SYN $SETS --epochs 120 \
    --scan_steps 16 --device_cache \
    --output_dir $H2H/tpu/stage1 --resume \
    > $H2H/tpu_stage1.log 2>&1
fi

if [ ! -s $H2H/tpu/stage2/mead_fdm_params.msgpack ]; then
  python -u -m fdm_tpu train-diffusion $SYN $SETS --epochs 100 \
    --scan_steps 16 --device_cache \
    --stage1 $H2H/tpu/stage1/mead_vqvae_params.msgpack \
    --train_audio_encoder \
    --output_dir $H2H/tpu/stage2 --resume \
    > $H2H/tpu_stage2.log 2>&1
fi

if [ ! -d $H2H/tpu/preds ] || [ -z "$(ls $H2H/tpu/preds 2>/dev/null)" ]; then
  python -u -m fdm_tpu sample-diffusion $SYN $SETS --batch_size 1 \
    --sampler ddpm \
    --stage1 $H2H/tpu/stage1/mead_vqvae_params.msgpack \
    --stage2 $H2H/tpu/stage2/mead_fdm_params.msgpack \
    --audio_params $H2H/tpu/stage2/mead_audio_params.msgpack \
    --output_dir $H2H/tpu/preds \
    > $H2H/tpu_sample.log 2>&1
fi
echo "H2H TPU SIDE DONE"
