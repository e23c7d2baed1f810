#!/bin/bash
# Round-5 final-session lane B (core 1, TPU chip):
# SAC Humanoid-v4 (VERDICT r4 item 3 — the one published off-policy env
# never attempted; reference 5488.5±81.2, examples/mujoco/README.md:130),
# fine interleave (step_per_collect=1) matching the reference regime,
# then BipedalWalker SAC (item 6) if time remains.
cd /root/repo
run() { name=$1; to=$2; shift 2; echo "=== $name start $(date +%H:%M:%S)" >> log/parity5/queue.log; timeout "$to" "$@" > "log/parity5/$name.out" 2>&1; echo "=== $name done rc=$? $(date +%H:%M:%S)" >> log/parity5/queue.log; }
run sac_humanoid_s0_fine 11400 taskset -c 1 python examples/mujoco_sac.py --task Humanoid-v4 --step-per-collect 1 --seed 0 --logdir log/parity5/sac_humanoid_s0_fine
run bipedal_sac_s0 4800 taskset -c 1 python examples/box2d_sac.py --seed 0 --logdir log/parity5/bipedal_sac_s0
echo "=== LANE B COMPLETE $(date +%H:%M:%S)" >> log/parity5/queue.log
