#!/bin/bash
# After the parity queue: (1) re-run TD3 s0 (its first run trained with
# the zero-exploration-noise bug), (2) re-warm the XLA compile cache for
# bench.py's conv stages, (3) one full bench validation.
cd /root/repo
while ! grep -q "QUEUE COMPLETE" log/parity/queue.log 2>/dev/null; do sleep 60; done
echo "post-queue start $(date +%H:%M:%S)" > log/parity/post_queue.log
timeout 3600 python examples/mujoco_td3.py --algo td3 --seed 0 --logdir log/parity/td3_hc_s0_v2 > log/parity/td3_hc_s0_v2.out 2>&1
echo "td3_s0_v2 rc=$? $(date +%H:%M:%S)" >> log/parity/post_queue.log
BENCH_STAGE_TIMEOUT_S=2400 timeout 2000 python bench.py --stage atari >> log/parity/post_queue.log 2>&1
echo "atari warm rc=$? $(date +%H:%M:%S)" >> log/parity/post_queue.log
timeout 2000 python bench.py --stage conv >> log/parity/post_queue.log 2>&1
echo "conv warm rc=$? $(date +%H:%M:%S)" >> log/parity/post_queue.log
timeout 1500 python bench.py > log/parity/bench_final.log 2>&1
echo "full bench rc=$? $(date +%H:%M:%S)" >> log/parity/post_queue.log
