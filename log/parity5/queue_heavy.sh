#!/bin/bash
# CPU-heavy on-policy seeds, DELAYED so the Walker 1-env exact-regime run
# (VERDICT item 1) gets the cores it needs until its s0 completes (or
# 23:59, whichever first).
cd /root/repo
while [ ! -f log/parity5/walker_s0_done ] && [ $(date +%s) -lt 1787356740 ]; do sleep 120; done
run() { name=$1; shift; echo "=== $name start $(date +%H:%M:%S)" >> log/parity5/queue.log; timeout 11000 "$@" > "log/parity5/$name.out" 2>&1; echo "=== $name done rc=$? $(date +%H:%M:%S)" >> log/parity5/queue.log; }
run trpo_hc_s1 python examples/mujoco_trpo.py --algo trpo --seed 1 --logdir log/parity5/trpo_hc_s1
run npg_hc_s1  python examples/mujoco_trpo.py --algo npg  --seed 1 --logdir log/parity5/npg_hc_s1
run a2c_ant_s1 python examples/mujoco_a2c.py --task Ant-v4 --seed 1 --logdir log/parity5/a2c_ant_s1
echo "=== HEAVY LANE COMPLETE $(date +%H:%M:%S)" >> log/parity5/queue.log
