"""Tic-tac-toe: a pure-JAX turn-based multi-agent environment.

The on-device analog of the reference's PettingZoo tic-tac-toe fixture
(``tianshou/env/pettingzoo_env.py:21`` adapter + ``test/pettingzoo/
tic_tac_toe.py``): observations follow the AEC convention —
``Batch(obs=<features>, mask=<legal actions>, agent_id=<current player>)``
— and rewards are per-agent vectors ``[2]`` (win +1 / loss -1 from each
agent's perspective, reference ``pettingzoo_env.py`` reward handling).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.envs.base import JaxEnv, StepResult
from tianshou_tpu.envs.spaces import Box, Discrete

__all__ = ["TicTacToe"]

# the 8 winning lines as a [8, 3] index table
_LINES = jnp.asarray(
    [
        [0, 1, 2], [3, 4, 5], [6, 7, 8],  # rows
        [0, 3, 6], [1, 4, 7], [2, 5, 8],  # cols
        [0, 4, 8], [2, 4, 6],  # diagonals
    ]
)


class TTTState(NamedTuple):
    board: jax.Array  # [9] int32: 0 empty, 1 player0, 2 player1
    player: jax.Array  # scalar int32: whose turn
    t: jax.Array


class TicTacToe(JaxEnv):
    """Two-player alternating tic-tac-toe with action masking."""

    num_agents = 2
    observation_space = Box(low=0.0, high=1.0, shape=(19,))
    action_space = Discrete(9)

    def reset(self, key: jax.Array):
        state = TTTState(
            board=jnp.zeros(9, jnp.int32),
            player=jnp.zeros((), jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )
        return state, self._obs(state)

    @staticmethod
    def _obs(s: TTTState) -> Batch:
        mine = (s.board == s.player + 1).astype(jnp.float32)
        theirs = (s.board == 2 - s.player).astype(jnp.float32)
        feats = jnp.concatenate(
            [mine, theirs, s.player.astype(jnp.float32)[None]]
        )
        return Batch(
            obs=feats,
            mask=(s.board == 0).astype(jnp.float32),
            agent_id=s.player,
        )

    def step(self, state: TTTState, action: jax.Array):
        action = action.astype(jnp.int32)
        legal = state.board[action] == 0
        board = jnp.where(
            legal, state.board.at[action].set(state.player + 1), state.board
        )
        marks = board[_LINES]  # [8, 3]
        won = jnp.any(jnp.all(marks == state.player + 1, axis=1))
        full = jnp.all(board != 0)
        # illegal move: immediate loss for the mover
        terminated = won | full | ~legal
        mover_rew = jnp.where(won, 1.0, jnp.where(~legal, -1.0, 0.0))
        rew_vec = jnp.where(
            state.player == 0,
            jnp.stack([mover_rew, -mover_rew]),
            jnp.stack([-mover_rew, mover_rew]),
        ).astype(jnp.float32)
        new = TTTState(
            board=board,
            player=1 - state.player,
            t=state.t + 1,
        )
        return new, StepResult(
            obs=self._obs(new),
            reward=rew_vec,
            terminated=terminated,
            truncated=jnp.zeros((), bool),
        )
