#!/bin/bash
# At-scale CFG evidence (VERDICT r3 item 5 / BASELINE config #4) on the
# round-4 MEAD rehearsal model: sample the SAME trained stage-2 model at
# cfg 0 and cfg 2.5 with the same seed, then run the analyzer
# (runs_r4/cfg_evidence.py): outputs must differ post-quantization, both
# arms report matched-vs-mismatched correlation, and EME over the
# emotion-sensitive region should not regress under guidance.
# Run AFTER pipeline_mead4.sh passes its correlation gate.
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

R4=runs_r4b
CK=checkpoints/r4corr2
SIZE=512
SYN="--dataset mead --synthetic --synthetic_mode correlated --synthetic_size $SIZE"

test -s $R4/correlation_mead.json || { echo "run pipeline_mead4.sh first"; exit 1; }

python -u -m fdm_tpu sample-diffusion $SYN --batch_size 8 \
  --stage1 $CK/stage1/mead_vqvae_params.msgpack \
  --stage2 $CK/stage2/mead_fdm_params.msgpack \
  --audio_params $CK/stage2/mead_audio_params.msgpack \
  --cfg_scale 0 \
  --output_dir /tmp/r4c2_cfg0 > $R4/sample_cfg0_stdout.log 2>&1

python -u -m fdm_tpu sample-diffusion $SYN --batch_size 8 \
  --stage1 $CK/stage1/mead_vqvae_params.msgpack \
  --stage2 $CK/stage2/mead_fdm_params.msgpack \
  --audio_params $CK/stage2/mead_audio_params.msgpack \
  --cfg_scale 2.5 \
  --output_dir /tmp/r4c2_cfg25 > $R4/sample_cfg25_stdout.log 2>&1

python -u runs_r4/cfg_evidence.py $SYN \
  --cfg0_dir /tmp/r4c2_cfg0 --cfg25_dir /tmp/r4c2_cfg25 \
  --json_out $R4/cfg_evidence.json > $R4/cfg_evidence_stdout.log 2>&1

test -s $R4/cfg_evidence.json || { echo "MISSING cfg_evidence.json"; exit 1; }
tail -3 $R4/cfg_evidence_stdout.log
echo "R4 CFG EVIDENCE DONE"
