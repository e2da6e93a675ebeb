"""IAC: independent actor-critic, per-agent Q(o_i, a_i) (continuous path).

Re-design of reference models/iac.py (value net :21-41 continuous branch,
loss delegated to ActorCritic).
"""
from __future__ import annotations

import jax.numpy as jnp

from mapdn_tpu.algos.base import MARLModel
from mapdn_tpu.learn.losses import actor_critic_loss


class IAC(MARLModel):
    on_policy = True

    def construct_value_net(self):
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
        return actor_critic_loss(self, state, batch, avail, key)
