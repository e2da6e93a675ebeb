"""FACMADDPG: factored MADDPG — per-agent critics mixed by a QMIX
hypernetwork into q_tot, with a third (mixer) optimizer.

Re-design of reference models/facmaddpg.py (per-agent value :22-64,
mixer in the TD loss :95-109, `mixer: True` config) + critics/qmix.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mapdn_tpu.algos.base import MARLModel
from mapdn_tpu.learn.sampling import batchnorm
from mapdn_tpu.nets.critics import QMixer


class FACMADDPG(MARLModel):
    uses_mixer = True

    def construct_value_net(self):
        cfg = self.cfg
        self.value_in_dim = self.obs_dim + self.act_dim + (
            self.n if cfg.agent_id else 0)
        self.value_module = self._mlp_critic(1)
        self.mixer_module = QMixer(
            n_agents=self.n, state_dim=self.obs_dim * self.n,
            embed_dim=cfg.mixing_embed_dim or 64,
            hypernet_layers=cfg.hypernet_layers or 2,
            hypernet_embed=cfg.hypernet_embed or 64,
            gated=bool(cfg.gated), skip_connections=bool(cfg.skip_connections))

    def init_mixer_params(self, key):
        qs = jnp.zeros((1, self.n))
        gs = jnp.zeros((1, self.obs_dim * self.n))
        return self.mixer_module.init(key, qs, gs)

    def value(self, params, obs, act):
        b = obs.shape[0]
        if self.cfg.agent_id:
            obs = jnp.concatenate([obs, self.agent_ids(b, obs.dtype)], axis=-1)
        inputs = jnp.concatenate([obs, act], axis=-1)
        return self._apply_critic(params, inputs)

    def get_loss(self, state, batch, avail, key):
        """(reference facmaddpg.py:90-119)."""
        cfg = self.cfg
        b = self.unpack(batch)
        bsz = b.state.shape[0]
        k1, k2 = jax.random.split(key)

        _, actions_pol, _, action_out, _ = self.get_actions(
            state.policy_params, b.state, b.last_hid, k1,
            status="train", exploration=False, avail=avail)
        next_params = (state.policy_params if cfg.double_q
                       else state.target_policy_params)
        _, next_actions, _, _, _ = self.get_actions(
            next_params, b.next_state, b.hid, k2,
            status="train", exploration=False, avail=avail)

        values_pol = self.value(state.value_params, b.state, actions_pol)
        values = self.value(state.value_params, b.state, b.action)
        gs = b.state.reshape(bsz, self.n * self.obs_dim)
        q_tot = self.mixer_module.apply(state.mixer_params, values, gs)

        next_values = self.value(
            state.target_value_params, b.next_state,
            jax.lax.stop_gradient(next_actions))
        next_gs = b.next_state.reshape(bsz, self.n * self.obs_dim)
        next_q_tot = self.mixer_module.apply(
            state.target_mixer_params, next_values, next_gs)

        done = b.done[:, None]
        returns = b.reward[:, 0:1] + cfg.gamma * (1.0 - done) * jax.lax.stop_gradient(next_q_tot)
        deltas = returns - q_tot
        advantages = values_pol
        if cfg.normalize_advantages:
            advantages = batchnorm(advantages)
        policy_loss = -jnp.mean(advantages)
        value_loss = jnp.mean(deltas**2)
        return policy_loss, value_loss, action_out
