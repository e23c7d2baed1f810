#!/bin/bash
# Wait for the parity queue to finish, then re-warm the XLA compile cache
# for bench.py's stages (cold conv compiles take ~15 min on a free chip)
# and run one full bench validation.
cd /root/repo
while ! grep -q "QUEUE COMPLETE" log/parity/queue.log 2>/dev/null; do sleep 60; done
echo "queue complete, warming at $(date +%H:%M:%S)" > log/parity/warm.log
BENCH_STAGE_TIMEOUT_S=2400 timeout 2500 python bench.py --stage atari >> log/parity/warm.log 2>&1
echo "atari warm rc=$? $(date +%H:%M:%S)" >> log/parity/warm.log
timeout 2500 python bench.py --stage conv >> log/parity/warm.log 2>&1
echo "conv warm rc=$? $(date +%H:%M:%S)" >> log/parity/warm.log
timeout 1200 python bench.py > log/parity/bench_final.log 2>&1
echo "full bench rc=$? $(date +%H:%M:%S)" >> log/parity/warm.log
