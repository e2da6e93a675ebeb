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
    stores_next_hidden = False  # PPO loss never reads Transition.hid

    def construct_value_net(self):
        cfg = self.cfg
        if cfg.shared_params:
            self.value_in_dim = self.obs_dim * self.n
            self.value_module = CentralVCritic(
                hid_size=cfg.hid_size, layernorm=cfg.layernorm,
                hid_activation=cfg.hid_activation, init_type=cfg.init_type,
                init_std=cfg.init_std, n_agents=self.n,
                use_agent_id=cfg.agent_id, output_dim=1)
        else:
            # non-shared (reference mappo.py:29-30): one independent critic
            # per agent over the joint obs [+ own one-hot], realized as a
            # stacked-params MLPCritic instead of a ModuleList
            self.value_in_dim = self.obs_dim * self.n + (
                self.n if cfg.agent_id else 0)
            self.value_module = self._mlp_critic(1)

    def value(self, params, obs, act=None):
        b = obs.shape[0]
        if self.cfg.shared_params:
            v = self.value_module.apply(params, obs.reshape(b, -1))
            return v[..., 0]
        joint = jnp.broadcast_to(
            obs.reshape(b, 1, -1), (b, self.n, self.obs_dim * self.n))
        if self.cfg.agent_id:
            joint = jnp.concatenate(
                [joint, self.agent_ids(b, obs.dtype)], axis=-1)
        return self._apply_critic(params, joint)

    def get_loss(self, state, batch, avail, key):
        return ppo_loss(self, state, batch, avail, key)
