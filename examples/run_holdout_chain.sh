#!/bin/bash
# Chained follow-up to the main EVAL_r03 pipeline: once the main run's PID
# exits (one-TPU-client rule), train the EA encoder with LJ050-0271 held
# out, sweep masks on it, merge the held-out table into eval_out_r3, and
# regenerate EVAL_r03.json.
#
# Usage: run_holdout_chain.sh <main_pid> <repo_root>
set -x
MAIN_PID=$1
case "$MAIN_PID" in
  ''|*[!0-9]*)
    # an empty/garbled PID would make the wait gate pass instantly and
    # launch a second TPU client alongside the main run (one-client rule)
    echo "usage: $0 <main_pid> [repo_root] - main_pid must be numeric" >&2
    exit 2;;
esac
REPO=${2:-/root/repo}
cd "$REPO" || exit 1

while kill -0 "$MAIN_PID" 2>/dev/null; do sleep 30; done
echo "=== main pipeline (pid $MAIN_PID) done; starting holdout chain ==="

H=eval_out_r3_holdout
mkdir -p "$H"
cp eval_out_r3/centroids.pkl eval_out_r3/hifigan_g.pkl "$H/"

timeout 4000 python examples/eval_e2e.py \
  --stage ea,eval_ea --out "$H" --ea-steps 3000 \
  --ea-holdout LJ050-0271 || exit 1

cp "$H/eval_ea_holdout.json" eval_out_r3/
timeout 600 python examples/eval_e2e.py --stage report --out eval_out_r3 \
  --hifigan-steps 6000 --ea-steps 3000 --f0vq-steps 500 --da-steps 3000
echo "=== holdout chain done ==="
