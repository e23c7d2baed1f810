#!/bin/bash
# Round-5 on-policy lane wave 2: REINFORCE 3M + 2nd seeds + box2d + seaquest.
cd /root/repo
tail --pid=1993 -f /dev/null 2>/dev/null  # wait for the trpo/npg lane
run() { name=$1; shift; echo "=== $name start $(date +%H:%M:%S)" >> log/parity5/queue.log; timeout 12000 "$@" > "log/parity5/$name.out" 2>&1; echo "=== $name done rc=$? $(date +%H:%M:%S)" >> log/parity5/queue.log; }
run reinforce_hc_s0 python examples/mujoco_reinforce.py --seed 0 --logdir log/parity5/reinforce_hc_s0
run bipedal_sac_s0  python examples/box2d_sac.py --seed 0 --logdir log/parity5/bipedal_sac_s0
run minatar_seaquest_dqn_s0 python examples/dqn_minatar.py --game seaquest --max-epoch 50 --step-per-epoch 100000 --step-per-collect 512 --eps-decay-steps 100000 --seed 0 --logdir log/parity5/minatar_seaquest_dqn_s0
run trpo_hc_s1 python examples/mujoco_trpo.py --algo trpo --seed 1 --logdir log/parity5/trpo_hc_s1
run npg_hc_s1  python examples/mujoco_trpo.py --algo npg  --seed 1 --logdir log/parity5/npg_hc_s1
run bipedal_hardcore_sac_s0 python examples/box2d_sac.py --hardcore --no-stop --max-epoch 150 --seed 0 --logdir log/parity5/bipedal_hardcore_sac_s0
echo "=== ONPOLICY2 LANE COMPLETE $(date +%H:%M:%S)" >> log/parity5/queue.log
