#!/bin/bash
# Chain 2: after the EA holdout chain exits, train the full I_da stack
# (unit k-means, f0-VQVAE, unit-HiFi-GAN decoder) WITHOUT LJ050-0271 on top
# of the held-out encoder already in eval_out_r3_holdout, sweep the held-out
# utterance, merge, and regenerate EVAL_r03.json.
#
# Usage: run_da_holdout_chain.sh <prev_chain_pid> <repo_root>
set -x
PREV_PID=$1
REPO=${2:-/root/repo}
cd "$REPO" || exit 1

while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
echo "=== chain 1 (pid $PREV_PID) done; starting I_da holdout leg ==="

H=eval_out_r3_holdout
test -f "$H/ea_params.pkl" || { echo "missing held-out encoder"; exit 1; }

timeout 6000 python examples/eval_e2e.py \
  --stage feats,f0vq,da,eval_da --out "$H" \
  --f0vq-steps 500 --da-steps 3000 \
  --da-holdout LJ050-0271 || exit 1

cp "$H/eval_da_holdout.json" eval_out_r3/
timeout 600 python examples/eval_e2e.py --stage report --out eval_out_r3 \
  --hifigan-steps 6000 --ea-steps 3000 --f0vq-steps 500 --da-steps 3000
echo "=== I_da holdout chain done ==="
