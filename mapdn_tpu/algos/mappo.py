"""MAPPO: PPO with a centralized V(all obs) critic.

Re-design of reference models/mappo.py (central V net :21-66, PPO loss
delegated).
"""
from __future__ import annotations

import jax.numpy as jnp

from mapdn_tpu.algos.base import MARLModel
from mapdn_tpu.learn.losses import ppo_loss
from mapdn_tpu.nets.critics import CentralVCritic


class MAPPO(MARLModel):
    on_policy = True
    stores_rollout_value = True

    def construct_value_net(self):
        cfg = self.cfg
        self.value_in_dim = self.obs_dim * self.n
        self.value_module = CentralVCritic(
            hid_size=cfg.hid_size, layernorm=cfg.layernorm,
            hid_activation=cfg.hid_activation, init_type=cfg.init_type,
            init_std=cfg.init_std, n_agents=self.n,
            use_agent_id=cfg.agent_id, output_dim=1)

    def value(self, params, obs, act=None):
        b = obs.shape[0]
        v = self.value_module.apply(params, obs.reshape(b, -1))
        return v[..., 0]

    def get_loss(self, state, batch, avail, key):
        return ppo_loss(self, state, batch, avail, key)
