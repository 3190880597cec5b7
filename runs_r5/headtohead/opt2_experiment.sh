#!/bin/bash
# Round-5 h2h diagnosis, part 2. Part 1 (opt_experiment.sh) refuted the
# optimizer hypothesis: fresh uniform-init arms land at roundtrip delta
# +0.146 (adamw) / +0.092 (amsgrad) vs the torch reference codec's +0.52
# at the same 3840 steps. Two remaining suspects, one arm each (both
# sampled on TPU like part 1):
#   sinit : train.stage1_codebook_init=sample (the new data-dependent
#           codebook seeding; amsgrad default true)   -> TPU roundtrip
#   fp32mm: uniform init + jax_default_matmul_precision=float32 (tests
#           whether XLA:TPU's bf16-accumulating matmuls bound codec
#           convergence at ~3e-3 signal scale; torch side is CPU fp32)
set -uxo pipefail
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

train_arm () {  # $1 tag, $2+ extra --set flags
  TAG=$1; shift
  python -u -m fdm_tpu train-vqvae $SYN $SETS "$@" --epochs 120 \
    --scan_steps 16 --device_cache --output_dir $H2H/opt_$TAG/stage1 \
    > $H2H/opt_${TAG}_stage1.log 2>&1
}

roundtrip () {  # $1 tag, $2 params path, $3+ extra flags for the sampler
  P=$2; TAG=$1; shift 2
  for SPLIT in test train; do
    EXTRA=""; [ $SPLIT = train ] && EXTRA="--split train"
    python -u -m fdm_tpu sample-vqvae $SYN $SETS $EXTRA "$@" --max_clips 8 \
      --params "$P" --output_dir /tmp/h2h_rt_${TAG}_$SPLIT \
      > $H2H/rt_${TAG}_${SPLIT}_sample.log 2>&1
    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python -u -m fdm_tpu correlation $SYN $SETS $EXTRA --max_clips 8 \
      --pred_path /tmp/h2h_rt_${TAG}_$SPLIT --min_delta 0.0 \
      --json_out $H2H/rt_${TAG}_${SPLIT}_correlation.json 2>&1 | tail -1
  done
}

train_arm sinit --set train.stage1_codebook_init=sample
roundtrip sinit $H2H/opt_sinit/stage1/mead_vqvae_params.msgpack
train_arm fp32mm --set train.stage1_codebook_init=uniform \
  --set train.matmul_precision=float32
roundtrip fp32mm $H2H/opt_fp32mm/stage1/mead_vqvae_params.msgpack \
  --set train.matmul_precision=float32
echo "OPT2 EXPERIMENT DONE"
for f in $H2H/rt_*_correlation.json; do
  echo "$f: $(python -c "import json;d=json.load(open('$f'));print(d.get('delta'))" 2>/dev/null)"
done
