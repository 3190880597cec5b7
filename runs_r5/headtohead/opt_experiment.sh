#!/bin/bash
# Round-5 h2h diagnosis experiment (TPU): why is the fdm_tpu 32-clip
# stage-1 codec at roundtrip delta +0.158 when the torch reference's is
# +0.52 after the same 3840 steps?
#
# Three arms, all sampled ON TPU (the same numeric regime the h2h ran in,
# eliminating the CPU-fp32 vs TPU-bf16 code-assignment confound):
#   orig : the as-run h2h codec (plain adamw)      -> TPU roundtrip
#   adamw: fresh retrain, stage1_amsgrad=false     -> TPU roundtrip
#   ams  : fresh retrain, stage1_amsgrad=true      -> TPU roundtrip
# Correlations score on CPU (pure numpy on saved preds).
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

train_arm () {  # $1 tag, $2 amsgrad true/false
  python -u -m fdm_tpu train-vqvae $SYN $SETS \
    --set train.stage1_amsgrad=$2 --epochs 120 --scan_steps 16 \
    --device_cache --output_dir $H2H/opt_$1/stage1 \
    > $H2H/opt_$1_stage1.log 2>&1
}

roundtrip () {  # $1 tag, $2 params path
  for SPLIT in test train; do
    EXTRA=""; [ $SPLIT = train ] && EXTRA="--split train"
    python -u -m fdm_tpu sample-vqvae $SYN $SETS $EXTRA --max_clips 8 \
      --params "$2" --output_dir /tmp/h2h_rt_$1_$SPLIT \
      > $H2H/rt_$1_${SPLIT}_sample.log 2>&1
    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python -u -m fdm_tpu correlation $SYN $SETS $EXTRA --max_clips 8 \
      --pred_path /tmp/h2h_rt_$1_$SPLIT --min_delta 0.0 \
      --json_out $H2H/rt_$1_${SPLIT}_correlation.json 2>&1 | tail -1
  done
}

roundtrip orig $H2H/tpu/stage1/mead_vqvae_params.msgpack
train_arm adamw false
roundtrip adamw $H2H/opt_adamw/stage1/mead_vqvae_params.msgpack
train_arm ams true
roundtrip ams $H2H/opt_ams/stage1/mead_vqvae_params.msgpack
echo "OPT EXPERIMENT DONE"
for f in $H2H/rt_*_correlation.json; do
  echo "$f: $(python -c "import json;d=json.load(open('$f'));print(d.get('delta'), d.get('matched_corr_mean'))" 2>/dev/null)"
done
