#!/bin/bash
# Round-4 coarse queue v2 (after manual rebalance): DDPG cells first (easy
# in-band wins), then A2C Ant.
cd /root/repo
run() { name=$1; shift; echo "=== $name start $(date +%H:%M:%S)" >> log/parity4/queue.log; timeout 10000 "$@" > "log/parity4/$name.out" 2>&1; echo "=== $name done rc=$? $(date +%H:%M:%S)" >> log/parity4/queue.log; }
run ddpg_hc_s2      python examples/mujoco_td3.py --algo ddpg --seed 2 --logdir log/parity4/ddpg_hc_s2
run ddpg_walker_s0  python examples/mujoco_td3.py --algo ddpg --task Walker2d-v4 --seed 0 --logdir log/parity4/ddpg_walker_s0
run ddpg_hopper_s0  python examples/mujoco_td3.py --algo ddpg --task Hopper-v4 --seed 0 --logdir log/parity4/ddpg_hopper_s0
run a2c_ant_s0      python examples/mujoco_a2c.py --task Ant-v4 --seed 0 --logdir log/parity4/a2c_ant_s0
run ddpg_walker_s1  python examples/mujoco_td3.py --algo ddpg --task Walker2d-v4 --seed 1 --logdir log/parity4/ddpg_walker_s1
run ddpg_hopper_s1  python examples/mujoco_td3.py --algo ddpg --task Hopper-v4 --seed 1 --logdir log/parity4/ddpg_hopper_s1
echo "=== COARSE QUEUE v2 COMPLETE $(date +%H:%M:%S)" >> log/parity4/queue.log
