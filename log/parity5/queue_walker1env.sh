#!/bin/bash
# Round-5 CPU lane: SAC Walker2d at the reference's EXACT regime
# (training_num=1 / step_per_collect=1 / test_num=10, mujoco_sac.py:43),
# via the fused fine host cycle on the CPU backend (the 1-env cycle is
# tunnel-RTT-bound on the axon TPU: 20 steps/s vs 112 steps/s on CPU —
# same XLA program, measured in probe_1env{,_cpu}.out).
cd /root/repo
run() { name=$1; shift; echo "=== $name start $(date +%H:%M:%S)" >> log/parity5/queue.log; timeout 18000 "$@" > "log/parity5/$name.out" 2>&1; echo "=== $name done rc=$? $(date +%H:%M:%S)" >> log/parity5/queue.log; }
run sac_walker_1env_s0 python examples/mujoco_sac.py --task Walker2d-v4 --platform cpu --num-envs 1 --step-per-collect 1 --test-envs 10 --seed 0 --logdir log/parity5/sac_walker_1env_s0
run sac_walker_1env_s1 python examples/mujoco_sac.py --task Walker2d-v4 --platform cpu --num-envs 1 --step-per-collect 1 --test-envs 10 --seed 1 --logdir log/parity5/sac_walker_1env_s1
echo "=== WALKER-1ENV LANE COMPLETE $(date +%H:%M:%S)" >> log/parity5/queue.log
