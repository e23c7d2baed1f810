"""Declarative high-level API example (reference ``ExperimentBuilder``
usage): DQN on CartPole in ~10 lines."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tianshou_tpu.highlevel.config import SamplingConfig
from tianshou_tpu.highlevel.env import JaxEnvFactory
from tianshou_tpu.highlevel.experiment import (
    DQNExperimentBuilder,
    DQNParams,
    ExperimentConfig,
)


def main():
    result = (
        DQNExperimentBuilder(
            JaxEnvFactory("CartPole-v1"),
            config=ExperimentConfig(logger="tensorboard"),
            sampling=SamplingConfig(
                num_epochs=10,
                step_per_epoch=10000,
                step_per_collect=100,
                update_per_step=0.1,
                batch_size=64,
                buffer_size=20000,
                start_timesteps=1000,
            ),
        )
        .with_dqn_params(DQNParams(hidden_sizes=(128, 128, 128), gamma=0.9))
        .with_seed(0)
        .with_stop_fn(lambda rew: rew >= 195)
        .build()
        .run()
    )
    print(
        f"best={result.info.best_reward:.1f} env_steps={result.info.env_step} "
        f"log_dir={result.log_dir}"
    )


if __name__ == "__main__":
    main()
