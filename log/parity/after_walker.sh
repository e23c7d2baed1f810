#!/bin/bash
cd /root/repo
while pgrep -f "Walker2d-v4" > /dev/null; do sleep 30; done
timeout 3200 python examples/mujoco_td3.py --algo td3 --seed 0 --no-pipeline --logdir log/parity/td3_hc_s0_nopipe > log/parity/td3_hc_s0_nopipe.out 2>&1
echo "td3 nopipe rc=$? $(date +%H:%M:%S)" >> log/parity/post_queue.log
