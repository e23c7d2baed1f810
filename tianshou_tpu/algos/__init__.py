"""Algorithm zoo (the reference's ``tianshou/policy`` counterpart)."""

from tianshou_tpu.algos.a2c import A2C
from tianshou_tpu.algos.base import Algorithm, RandomPolicy, TrainState
from tianshou_tpu.algos.bdq import BDQ
from tianshou_tpu.algos.c51 import C51, Rainbow
from tianshou_tpu.algos.ddpg import DDPG, TD3
from tianshou_tpu.algos.dqn import DQN
from tianshou_tpu.algos.drqn import DRQN
from tianshou_tpu.algos.gail import GAIL
from tianshou_tpu.algos.icm import ICM, ICMNet
from tianshou_tpu.algos.multiagent import MultiAgentPolicyManager
from tianshou_tpu.algos.npg import NPG, TRPO
from tianshou_tpu.algos.offline import (
    BC,
    BCQ,
    CQL,
    TD3BC,
    DiscreteBCQ,
    DiscreteCQL,
    DiscreteCRR,
)
from tianshou_tpu.algos.pg import PG
from tianshou_tpu.algos.ppo import PPO
from tianshou_tpu.algos.psrl import PSRL
from tianshou_tpu.algos.qrdqn import FQF, IQN, QRDQN
from tianshou_tpu.algos.redq import REDQ
from tianshou_tpu.algos.sac import SAC, DiscreteSAC

__all__ = [
    "A2C", "Algorithm", "BC", "BCQ", "BDQ", "C51", "CQL", "DDPG",
    "DiscreteBCQ", "DiscreteCQL", "DiscreteCRR", "DiscreteSAC", "DQN",
    "DRQN", "FQF", "GAIL", "ICM", "ICMNet", "IQN", "MultiAgentPolicyManager",
    "NPG", "PG", "PPO", "PSRL", "QRDQN", "Rainbow", "RandomPolicy", "REDQ",
    "SAC", "TD3", "TD3BC", "TrainState", "TRPO",
]
