#!/bin/bash
# Round-4 serialized queue for the coarse (spc=64 / on-policy) slot.
cd /root/repo
run() { name=$1; shift; echo "=== $name start $(date +%H:%M:%S)" >> log/parity4/queue.log; timeout 10000 "$@" > "log/parity4/$name.out" 2>&1; echo "=== $name done rc=$? $(date +%H:%M:%S)" >> log/parity4/queue.log; }
run td3_hc_s2_seq  python examples/mujoco_td3.py --algo td3 --seed 2 --logdir log/parity4/td3_hc_s2_seq
run ddpg_hc_s2     python examples/mujoco_td3.py --algo ddpg --seed 2 --logdir log/parity4/ddpg_hc_s2
run a2c_ant_s0     python examples/mujoco_a2c.py --task Ant-v4 --seed 0 --logdir log/parity4/a2c_ant_s0
run a2c_hc_s1      python examples/mujoco_a2c.py --task HalfCheetah-v4 --seed 1 --logdir log/parity4/a2c_hc_s1
run a2c_ant_s1     python examples/mujoco_a2c.py --task Ant-v4 --seed 1 --logdir log/parity4/a2c_ant_s1
echo "=== COARSE QUEUE COMPLETE $(date +%H:%M:%S)" >> log/parity4/queue.log
