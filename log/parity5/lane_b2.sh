#!/bin/bash
# Lane B2: Humanoid restart after the 23:00 client-session stall (chip
# itself alive — fresh probe attached in 7.6s; the original process hung
# on a tunnel RPC during the 22:55 load spike and never recovered).
cd /root/repo
run() { name=$1; to=$2; shift 2; echo "=== $name start $(date +%H:%M:%S)" >> log/parity5/queue.log; timeout "$to" "$@" > "log/parity5/$name.out" 2>&1; echo "=== $name done rc=$? $(date +%H:%M:%S)" >> log/parity5/queue.log; }
run sac_humanoid_s0_fine 9000 taskset -c 1 python examples/mujoco_sac.py --task Humanoid-v4 --step-per-collect 1 --seed 0 --logdir log/parity5/sac_humanoid_s0_fine
echo "=== LANE B2 COMPLETE $(date +%H:%M:%S)" >> log/parity5/queue.log
