#!/bin/bash
# Round-4 rehearsal supervisor: waits for the running MEAD pipeline
# (attempt 2), then — only if its learning-evidence gate passed — runs the
# at-scale CFG evidence and the BIWI/VOCASET rehearsals back to back.
# Detached from the builder session so a session restart cannot orphan
# the sequence.
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

MEAD_PID=${1:?usage: chain.sh <pid of pipeline_mead3.sh>}

while kill -0 "$MEAD_PID" 2>/dev/null; do sleep 30; done
grep -q "R4 MEAD2 PIPELINE DONE" runs_r4/pipeline_mead3.log || {
  echo "MEAD pipeline did not finish cleanly; stopping the chain"
  exit 1
}

# ---- at-scale CFG evidence (VERDICT r3 item 5) ----
# cfg=0 arm: the pipeline's gate-passing sample dir. cfg=2.5 arm: same
# model, same seed, guidance on.
python -u -m fdm_tpu sample-diffusion --dataset mead --synthetic \
  --synthetic_mode correlated --synthetic_size 512 --batch_size 8 \
  --stage1 checkpoints/r4corr2/stage1/mead_vqvae_params.msgpack \
  --stage2 checkpoints/r4corr2/stage2/mead_fdm_params.msgpack \
  --audio_params checkpoints/r4corr2/stage2/mead_audio_params.msgpack \
  --cfg_scale 2.5 \
  --output_dir /tmp/r4c2_samples_cfg25 \
  > runs_r4b/sample_cfg25_stdout.log 2>&1

python -u runs_r4/cfg_evidence.py --dataset mead --synthetic \
  --synthetic_mode correlated --synthetic_size 512 \
  --cfg0_dir /tmp/r4c2_samples_final --cfg25_dir /tmp/r4c2_samples_cfg25 \
  --json_out runs_r4b/cfg_evidence_mead.json \
  > runs_r4b/cfg_evidence_stdout.log 2>&1
test -s runs_r4b/cfg_evidence_mead.json || {
  echo "MISSING ARTIFACT: runs_r4b/cfg_evidence_mead.json"; exit 1;
}

# ---- the other two families (VERDICT r3 item 4) ----
bash runs_r4/pipeline_family.sh vocaset
bash runs_r4/pipeline_family.sh biwi

echo "R4 CHAIN DONE"
