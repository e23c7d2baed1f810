#!/bin/bash
# Serialized 1M-step parity runs (one TPU chip).  Round 3 queue:
# SAC s2 (redo), PPO s1/s2, TD3 s0-s2, DDPG s0-s2 on HalfCheetah-v4.
cd /root/repo
run() { name=$1; shift; echo "=== $name start $(date +%H:%M:%S)" >> log/parity/queue.log; timeout 5400 "$@" > "log/parity/$name.out" 2>&1; echo "=== $name done rc=$? $(date +%H:%M:%S)" >> log/parity/queue.log; }
run sac_hc_s2  python examples/mujoco_sac.py --seed 2 --logdir log/parity/sac_hc_s2
run ppo_hc_s1  python examples/mujoco_ppo.py --seed 1
run ppo_hc_s2  python examples/mujoco_ppo.py --seed 2
run td3_hc_s0  python examples/mujoco_td3.py --algo td3 --seed 0 --logdir log/parity/td3_hc_s0
run ddpg_hc_s0 python examples/mujoco_td3.py --algo ddpg --seed 0 --logdir log/parity/ddpg_hc_s0
run td3_hc_s1  python examples/mujoco_td3.py --algo td3 --seed 1 --logdir log/parity/td3_hc_s1
run ddpg_hc_s1 python examples/mujoco_td3.py --algo ddpg --seed 1 --logdir log/parity/ddpg_hc_s1
#dropped_s2_for_schedule xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx
#dropped_s2_for_schedule xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx
echo "=== QUEUE COMPLETE $(date +%H:%M:%S)" >> log/parity/queue.log
