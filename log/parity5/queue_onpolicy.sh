#!/bin/bash
# Round-5 on-policy lane: waits for the QRDQN run, then TRPO -> NPG
# HalfCheetah 1M at reference configs (VERDICT r4 item 5).
cd /root/repo
tail --pid=32311 -f /dev/null 2>/dev/null  # wait for qrdqn slot
run() { name=$1; shift; echo "=== $name start $(date +%H:%M:%S)" >> log/parity5/queue.log; timeout 12000 "$@" > "log/parity5/$name.out" 2>&1; echo "=== $name done rc=$? $(date +%H:%M:%S)" >> log/parity5/queue.log; }
run trpo_hc_s0 python examples/mujoco_trpo.py --algo trpo --seed 0 --logdir log/parity5/trpo_hc_s0
run npg_hc_s0  python examples/mujoco_trpo.py --algo npg  --seed 0 --logdir log/parity5/npg_hc_s0
echo "=== ONPOLICY LANE COMPLETE $(date +%H:%M:%S)" >> log/parity5/queue.log
