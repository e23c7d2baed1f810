#!/bin/bash
cd /root/repo
while pgrep -f "mujoco_td3.py --algo td3 --seed 2" > /dev/null; do sleep 30; done
timeout 3000 python examples/mujoco_sac.py --task Walker2d-v4 --seed 0 --logdir log/parity/sac_walker_s0 > log/parity/sac_walker_s0.out 2>&1
echo "sac walker rc=$? $(date +%H:%M:%S)" >> log/parity/post_queue.log
