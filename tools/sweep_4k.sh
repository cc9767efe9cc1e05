#!/usr/bin/env bash
# 4K tiling-ladder sweep (VERDICT r3 item 7): whole-frame vs square tiles
# x tile_batch chunking, flagship-hq, chained timing via bench_4k.py.
# Run ONLY on a free chip (tpu_guard refuses otherwise).
set -u
cd "$(dirname "$0")/.."
for cfg in "--tile 0 --border 32" \
           "--tile 1088 --tile-batch 0" \
           "--tile 1088 --tile-batch 2" \
           "--tile 1088 --tile-batch 4" \
           "--tile 736 --tile-batch 3"; do
  echo "=== bench_4k $cfg ==="
  timeout 600 python tools/bench_4k.py --model flagship-hq --frames 2 $cfg
done
