#!/bin/bash
# 160 additional GridWorld ablation seeds (120..279) in 20-seed batches,
# appended as JSON lines for later merging (VERDICT r4 next-step #7d).
out=/root/repo/docs/ablation_r5_batches.jsonl
for off in 120 140 160 180 200 220 240 260; do
  ABLATION_SEED_OFFSET=$off ABLATION_SEEDS=20 ABLATION_PROBLEMS=SimpleGridWorld \
    python /root/repo/scripts/per_ablation.py 2>/dev/null | tail -1 >> "$out"
  echo "batch $off done" >&2
done
echo ALL_DONE >&2
