#!/bin/bash
# Lane D: VERDICT item-2 re-seeds on the fast coarse path (8-env,
# step_per_collect=8): 3rd TD3 HC seed, DDPG HC investigation seed.
cd /root/repo
run() { name=$1; to=$2; shift 2; echo "=== $name start $(date +%H:%M:%S)" >> log/parity5/queue.log; timeout "$to" "$@" > "log/parity5/$name.out" 2>&1; echo "=== $name done rc=$? $(date +%H:%M:%S)" >> log/parity5/queue.log; }
run td3_hc_s3  2700 taskset -c 0 python examples/mujoco_td3.py --algo td3  --seed 3 --logdir log/parity5/td3_hc_s3
run ddpg_hc_s3 2700 taskset -c 0 python examples/mujoco_td3.py --algo ddpg --seed 3 --logdir log/parity5/ddpg_hc_s3
echo "=== LANE D COMPLETE $(date +%H:%M:%S)" >> log/parity5/queue.log
