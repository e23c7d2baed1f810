#!/bin/bash
# Round-5 TPU mid lane: re-seed the thin/below-band cells under the
# corrected episode_per_test=10 protocol (VERDICT r4 item 2).
cd /root/repo
run() { name=$1; shift; echo "=== $name start $(date +%H:%M:%S)" >> log/parity5/queue.log; timeout 12000 "$@" > "log/parity5/$name.out" 2>&1; echo "=== $name done rc=$? $(date +%H:%M:%S)" >> log/parity5/queue.log; }
run td3_hopper_s1_fine python examples/mujoco_td3.py --algo td3 --task Hopper-v4 --step-per-collect 1 --seed 1 --logdir log/parity5/td3_hopper_s1_fine
run sac_ant_s1_fine    python examples/mujoco_sac.py --task Ant-v4 --step-per-collect 1 --seed 1 --logdir log/parity5/sac_ant_s1_fine
run td3_hc_s3_seq      python examples/mujoco_td3.py --algo td3 --seed 3 --logdir log/parity5/td3_hc_s3_seq
run ddpg_hc_s3         python examples/mujoco_td3.py --algo ddpg --seed 3 --logdir log/parity5/ddpg_hc_s3
echo "=== MID LANE COMPLETE $(date +%H:%M:%S)" >> log/parity5/queue.log
