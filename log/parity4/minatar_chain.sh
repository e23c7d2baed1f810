#!/bin/bash
cd /root/repo
timeout 9000 python examples/dqn_minatar.py --game space_invaders --max-epoch 50 --step-per-epoch 100000 --step-per-collect 512 --eps-decay-steps 100000 --seed 0 --logdir log/parity4/minatar_spaceinv_dqn_s0 > log/parity4/minatar_spaceinv_dqn_s0.out 2>&1
timeout 7000 python examples/dqn_minatar.py --game breakout --algo qrdqn --max-epoch 30 --step-per-epoch 100000 --step-per-collect 512 --eps-decay-steps 100000 --seed 0 --logdir log/parity4/minatar_breakout_qrdqn_s0 > log/parity4/minatar_breakout_qrdqn_s0.out 2>&1
