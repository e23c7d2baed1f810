#!/bin/bash
# touch the marker when walker s0 finishes (its line appears in the .out)
cd /root/repo
while ! grep -q "best=" log/parity5/sac_walker_1env_s0.out 2>/dev/null; do sleep 120; done
touch log/parity5/walker_s0_done
