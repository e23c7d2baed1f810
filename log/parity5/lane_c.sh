#!/bin/bash
# Lane C (post-suite bonus): BipedalWalker SAC (VERDICT r4 item 6),
# short self-terminating budget so it cannot overlap the driver's bench.
cd /root/repo
run() { name=$1; to=$2; shift 2; echo "=== $name start $(date +%H:%M:%S)" >> log/parity5/queue.log; timeout "$to" "$@" > "log/parity5/$name.out" 2>&1; echo "=== $name done rc=$? $(date +%H:%M:%S)" >> log/parity5/queue.log; }
run bipedal_sac_s0 1500 python examples/box2d_sac.py --seed 0 --logdir log/parity5/bipedal_sac_s0
echo "=== LANE C COMPLETE $(date +%H:%M:%S)" >> log/parity5/queue.log
