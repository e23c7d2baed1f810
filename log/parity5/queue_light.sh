#!/bin/bash
# Light lane (TPU-RTT-bound, low host CPU): box2d + seaquest after reinforce.
cd /root/repo
tail --pid=9051 -f /dev/null 2>/dev/null
run() { name=$1; shift; echo "=== $name start $(date +%H:%M:%S)" >> log/parity5/queue.log; timeout 11000 "$@" > "log/parity5/$name.out" 2>&1; echo "=== $name done rc=$? $(date +%H:%M:%S)" >> log/parity5/queue.log; }
run bipedal_sac_s0  python examples/box2d_sac.py --seed 0 --logdir log/parity5/bipedal_sac_s0
run minatar_seaquest_dqn_s0 python examples/dqn_minatar.py --game seaquest --max-epoch 50 --step-per-epoch 100000 --step-per-collect 512 --eps-decay-steps 100000 --seed 0 --logdir log/parity5/minatar_seaquest_dqn_s0
run bipedal_hardcore_sac_s0 python examples/box2d_sac.py --hardcore --no-stop --max-epoch 120 --seed 0 --logdir log/parity5/bipedal_hardcore_sac_s0
echo "=== LIGHT LANE COMPLETE $(date +%H:%M:%S)" >> log/parity5/queue.log
