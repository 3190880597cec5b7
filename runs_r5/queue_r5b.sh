#!/bin/bash
# Round-5 second-half TPU queue (replaces the killed after_chain tail):
# wait for the family9-biwi leg and the opt experiment to drain, then run
# the lr-scaled family rehearsals, the h2h v2 arms, and score v2.
set -uxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

FAM9_PID=${1:-0}
OPT_PID=${2:-0}
while [ "$FAM9_PID" != "0" ] && kill -0 "$FAM9_PID" 2>/dev/null; do sleep 30; done
while [ "$OPT_PID" != "0" ] && kill -0 "$OPT_PID" 2>/dev/null; do sleep 30; done
echo "queue starts at $(date +%H:%M)"

bash runs_r5/pipeline_family9b.sh biwi    > runs_r5/family_biwi_b.log 2>&1 || true
bash runs_r5/pipeline_family9b.sh vocaset > runs_r5/family_vocaset_b.log 2>&1 || true

bash runs_r5/headtohead/tpu_side_v2.sh v2      > runs_r5/headtohead/tpu_v2.log 2>&1 || true
bash runs_r5/headtohead/tpu_side_v2.sh v2s1 1  > runs_r5/headtohead/tpu_v2s1.log 2>&1 || true

# score v2 (CPU): reference preds vs the v2 arm
PYTHONPATH=/root/repo python -u runs_r5/headtohead/score.py \
  --tpu_preds runs_r5/headtohead/tpu_v2/preds \
  --json_out runs_r5/headtohead/headtohead_v2.json \
  > runs_r5/headtohead/score_v2_stdout.log 2>&1 || true
PYTHONPATH=/root/repo python -u runs_r5/headtohead/score.py \
  --tpu_preds runs_r5/headtohead/tpu_v2s1/preds \
  --json_out runs_r5/headtohead/headtohead_v2s1.json \
  > runs_r5/headtohead/score_v2s1_stdout.log 2>&1 || true
echo "QUEUE R5B DONE at $(date +%H:%M)"
