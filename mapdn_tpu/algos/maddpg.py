"""MADDPG: centralized critic Q_i(all obs, all actions), other agents'
actions gradient-detached.

Re-design of reference models/maddpg.py (value net :20-78, loss :102-125).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mapdn_tpu.algos.base import MARLModel
from mapdn_tpu.learn.losses import ddpg_loss


class MADDPG(MARLModel):
    def construct_value_net(self):
        # (reference maddpg.py:20-29): n*(obs+act) [+ agent id]
        self.value_in_dim = (self.obs_dim + self.act_dim) * self.n + (
            self.n if self.cfg.agent_id else 0)
        self.value_module = self._mlp_critic(1)

    def _joint_input(self, obs, act):
        """(b, n, o), (b, n, a) -> (b, n, n*o [+n] + n*a) with other agents'
        actions stop-gradiented (reference maddpg.py:40-65)."""
        b = obs.shape[0]
        obs_rep = jnp.broadcast_to(
            obs[:, None], (b, self.n, self.n, self.obs_dim)
        ).reshape(b, self.n, -1)
        if self.cfg.agent_id:
            obs_rep = jnp.concatenate(
                [obs_rep, self.agent_ids(b, obs.dtype)], axis=-1)

        act_rep = jnp.broadcast_to(
            act[:, None], (b, self.n, self.n, self.act_dim))
        own_mask = jnp.eye(self.n, dtype=act.dtype)[None, :, :, None]
        act_rep = (jax.lax.stop_gradient(act_rep) * (1.0 - own_mask)
                   + act_rep * own_mask)
        act_rep = act_rep.reshape(b, self.n, -1)
        return jnp.concatenate([obs_rep, act_rep], axis=-1)

    def value(self, params, obs, act):
        return self._apply_critic(params, self._joint_input(obs, act))

    def get_loss(self, state, batch, avail, key):
        return ddpg_loss(self, state, batch, avail, key)
