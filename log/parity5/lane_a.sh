#!/bin/bash
# Round-5 final-session lane A (core 0, CPU backend):
# SAC Walker2d at the reference's EXACT regime (training_num=1,
# step_per_collect=1, test_num=10 — /root/reference/examples/mujoco/mujoco_sac.py:43)
# via the fused fine host cycle on the CPU backend (1-env cycle is
# tunnel-RTT-bound on the axon TPU: 20 st/s vs 112 st/s CPU, probe_1env*.out).
cd /root/repo
run() { name=$1; to=$2; shift 2; echo "=== $name start $(date +%H:%M:%S)" >> log/parity5/queue.log; timeout "$to" "$@" > "log/parity5/$name.out" 2>&1; echo "=== $name done rc=$? $(date +%H:%M:%S)" >> log/parity5/queue.log; }
run sac_walker_1env_s0 12600 taskset -c 0 python examples/mujoco_sac.py --task Walker2d-v4 --platform cpu --num-envs 1 --step-per-collect 1 --test-envs 10 --seed 0 --logdir log/parity5/sac_walker_1env_s0
run sac_walker_1env_s1 3600 taskset -c 0 python examples/mujoco_sac.py --task Walker2d-v4 --platform cpu --num-envs 1 --step-per-collect 1 --test-envs 10 --seed 1 --logdir log/parity5/sac_walker_1env_s1
echo "=== LANE A COMPLETE $(date +%H:%M:%S)" >> log/parity5/queue.log
