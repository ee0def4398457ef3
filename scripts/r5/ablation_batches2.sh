#!/bin/bash
# Seeds 280..459 in 20-seed batches (second r5 extension toward MDE <12%).
out=/root/repo/docs/ablation_r5_batches.jsonl
for off in 280 300 320 340 360 380 400 420 440; do
  ABLATION_SEED_OFFSET=$off ABLATION_SEEDS=20 ABLATION_PROBLEMS=SimpleGridWorld \
    python /root/repo/scripts/per_ablation.py 2>/dev/null | tail -1 >> "$out"
  echo "batch $off done" >&2
done
echo ALL_DONE2 >&2
