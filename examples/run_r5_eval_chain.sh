#!/bin/bash
# Round-5 eval chain: produce EVAL_r05.json from the committed deepened
# lineages (eval_r5 main, eval_r5_eahold, eval_r5_dahold). Strictly serial
# (one-TPU-client rule); regenerates the report after every milestone so a
# mid-chain crash still leaves the best-so-far EVAL_r05.json, and commits
# each milestone's artifacts.
#
# Usage: run_r5_eval_chain.sh   (from anywhere; cd's to the repo)
set -x
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
R=eval_r5
REPORT="timeout 900 python examples/eval_e2e.py --out $R --stage report \
  --ea-steps 3000 --f0vq-steps 500"

# 1. main tables + same-depth two-family gate
timeout 4500 python examples/eval_e2e.py --out $R --stage eval_ea \
  --families istft,v1 || exit 1
timeout 3000 python examples/eval_e2e.py --out $R --stage eval_da || exit 1
$REPORT || exit 1
git add $R EVAL_r05.json && git commit -q -m \
  "eval_r5: main quality tables + two-family gate at the deepened lineage"

# 2. EA holdout (generalization sweep, both families for the holdout gate)
timeout 3600 python examples/eval_e2e.py --out eval_r5_eahold \
  --stage eval_ea --families istft,v1 --ea-holdout LJ050-0271 || exit 1
cp eval_r5_eahold/eval_ea_holdout.json \
   eval_r5_eahold/eval_ea_holdout_v1.json "$R/"
$REPORT
git add eval_r5_eahold "$R" EVAL_r05.json && git commit -q -m \
  "eval_r5: EA holdout mask sweeps (istft + v1)"

# 3. DA holdout + multispeaker train-row cost + vc-sweep analysis
timeout 3000 python examples/eval_e2e.py --out eval_r5_dahold \
  --stage eval_da --da-holdout LJ050-0271 || exit 1
cp eval_r5_dahold/eval_da_holdout.json "$R/"
timeout 3000 python examples/eval_e2e.py --out eval_r5_dahold \
  --stage eval_da && cp eval_r5_dahold/eval_da.json "$R/eval_da_multispkr.json"
timeout 2400 python examples/eval_e2e.py --out eval_r5_dahold \
  --stage vc_sweep --da-holdout LJ050-0271 && \
  cp eval_r5_dahold/eval_vc_sweep.json "$R/"
$REPORT
git add eval_r5_dahold "$R" EVAL_r05.json && git commit -q -m \
  "eval_r5: I_da holdout + multispeaker cost + quantified vc-sweep analysis"

# 4. ASR->TTS donor-oracle baseline row
timeout 2400 python examples/eval_e2e.py --out $R --stage baseline && \
  $REPORT && git add "$R" EVAL_r05.json && git commit -q -m \
  "eval_r5: ASR->TTS donor-oracle baseline row"

echo "=== r5 eval chain done ==="
