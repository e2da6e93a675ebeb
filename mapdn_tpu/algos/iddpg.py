"""IDDPG: independent DDPG, per-agent critic Q(o_i, a_i).

Re-design of reference models/iddpg.py (value net :19-60, loss delegated to
DDPG :83-85).
"""
from __future__ import annotations

import jax.numpy as jnp

from mapdn_tpu.algos.base import MARLModel
from mapdn_tpu.learn.losses import ddpg_loss


class IDDPG(MARLModel):
    def construct_value_net(self):
        # (reference iddpg.py:19-28): obs [+ agent id] + own action
        self.value_in_dim = self.obs_dim + self.act_dim + (
            self.n if self.cfg.agent_id else 0)
        self.value_module = self._mlp_critic(1)

    def value(self, params, obs, act):
        b = obs.shape[0]
        if self.cfg.agent_id:
            obs = jnp.concatenate([obs, self.agent_ids(b, obs.dtype)], axis=-1)
        inputs = jnp.concatenate([obs, act], axis=-1)
        return self._apply_critic(params, inputs)

    def get_loss(self, state, batch, avail, key):
        return ddpg_loss(self, state, batch, avail, key)
