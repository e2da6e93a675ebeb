"""IPPO: independent PPO, per-agent V(o_i).

Re-design of reference models/ippo.py (V net :20-30, PPO loss delegated).
"""
from __future__ import annotations

import jax.numpy as jnp

from mapdn_tpu.algos.base import MARLModel
from mapdn_tpu.learn.losses import ppo_loss


class IPPO(MARLModel):
    on_policy = True
    stores_rollout_value = True
    stores_next_hidden = False  # PPO loss never reads Transition.hid

    def construct_value_net(self):
        self.value_in_dim = self.obs_dim + (self.n if self.cfg.agent_id else 0)
        self.value_module = self._mlp_critic(1)

    def value(self, params, obs, act=None):
        b = obs.shape[0]
        if self.cfg.agent_id:
            obs = jnp.concatenate([obs, self.agent_ids(b, obs.dtype)], axis=-1)
        return self._apply_critic(params, obs)

    def get_loss(self, state, batch, avail, key):
        return ppo_loss(self, state, batch, avail, key)
