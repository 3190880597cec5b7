#!/bin/bash
# Round-5 post-chain orchestrator: waits for the MEAD v8 chain (PID $1) to
# exit, then runs the work that was queued behind the chip:
#   1. CFG evidence (VERDICT r4 item 3, CPU-side scoring — overlaps 2.)
#   2. BIWI + VOCASET correlated rehearsals (TPU, sequential)
set -uxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

CHAIN_PID=${1:?usage: after_chain.sh <chain_pid>}
while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 30; done
echo "chain $CHAIN_PID exited; starting queued work at $(date +%H:%M)"

# ---- CFG evidence on the e350 EMA arms the grid just wrote (CPU) ----
SYN="--dataset mead --synthetic --synthetic_mode correlated --synthetic_size 1024"
if [ -d /tmp/r5_s_350_ddim100_ema ] && [ -d /tmp/r5_s_350_ddim100_ema_cfg25 ]; then
  nohup python -u runs_r5/cfg_evidence.py $SYN \
    --cfg0_dir /tmp/r5_s_350_ddim100_ema \
    --cfg25_dir /tmp/r5_s_350_ddim100_ema_cfg25 \
    --max_clips 64 \
    --json_out runs_r5/cfg_evidence.json \
    > runs_r5/cfg_evidence_stdout.log 2>&1 &
else
  echo "e350 cfg arms missing; falling back to e250"
  nohup python -u runs_r5/cfg_evidence.py $SYN \
    --cfg0_dir /tmp/r5_s_250_ddim100_ema \
    --cfg25_dir /tmp/r5_s_250_ddim100_ema_cfg25 \
    --max_clips 64 \
    --json_out runs_r5/cfg_evidence.json \
    > runs_r5/cfg_evidence_stdout.log 2>&1 &
fi

# ---- vertex-space family rehearsals (TPU) ----
bash runs_r5/pipeline_family9.sh biwi    > runs_r5/family_biwi.log 2>&1 || true
bash runs_r5/pipeline_family9.sh vocaset > runs_r5/family_vocaset.log 2>&1 || true
wait
echo "AFTER-CHAIN WORK DONE at $(date +%H:%M)"
