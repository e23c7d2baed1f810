#!/bin/bash
# Lane E: BipedalWalker SAC retry with a budget long enough to solve
# (stop_fn ends it at >=300); capped so it cannot run unbounded.
cd /root/repo
run() { name=$1; to=$2; shift 2; echo "=== $name start $(date +%H:%M:%S)" >> log/parity5/queue.log; timeout "$to" "$@" > "log/parity5/$name.out" 2>&1; echo "=== $name done rc=$? $(date +%H:%M:%S)" >> log/parity5/queue.log; }
run bipedal_sac_s0_long 4500 taskset -c 1 python examples/box2d_sac.py --seed 0 --logdir log/parity5/bipedal_sac_s0_long
echo "=== LANE E COMPLETE $(date +%H:%M:%S)" >> log/parity5/queue.log
