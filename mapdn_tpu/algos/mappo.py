"""MAPPO: PPO with a centralized V(all obs) critic.

Re-design of reference models/mappo.py (central V net :21-66, PPO loss
delegated).
"""
from __future__ import annotations

import jax.numpy as jnp

from mapdn_tpu.algos.base import MARLModel
from mapdn_tpu.learn.losses import ppo_loss


class MAPPO(MARLModel):
    on_policy = True

    def construct_value_net(self):
        self.value_in_dim = self.obs_dim * self.n + (
            self.n if self.cfg.agent_id else 0)
        self.value_module = self._mlp_critic(1)

    def value(self, params, obs, act=None):
        b = obs.shape[0]
        joint = jnp.broadcast_to(
            obs[:, None], (b, self.n, self.n, self.obs_dim)).reshape(b, self.n, -1)
        if self.cfg.agent_id:
            joint = jnp.concatenate(
                [joint, self.agent_ids(b, obs.dtype)], axis=-1)
        v = self.value_module.apply(params, joint.reshape(b * self.n, -1))
        return v.reshape(b, self.n)

    def get_loss(self, state, batch, avail, key):
        return ppo_loss(self, state, batch, avail, key)
