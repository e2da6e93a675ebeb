"""MAAC: soft actor-critic style MARL with a cross-agent attention critic.

Re-design of reference models/maac.py: Gaussian policy forced regardless of
the default (reference maac.py:20-38 + maac.yaml gaussian_policy: True),
AttentionCritic value (reference maac.py:40-67), entropy-in-target soft
update with `reward_scale` (reference maac.py:109-117), attention-logit
regularizer added to the policy loss (reference maac.py:118).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mapdn_tpu.algos.base import MARLModel
from mapdn_tpu.learn.sampling import batchnorm
from mapdn_tpu.nets.critics import AttentionCritic


class MAAC(MARLModel):
    def __init__(self, cfg):
        if not cfg.gaussian_policy:
            cfg = cfg.replace(gaussian_policy=True)
        super().__init__(cfg)

    def construct_value_net(self):
        cfg = self.cfg
        if not cfg.shared_params:
            raise NotImplementedError(
                "MAAC's attention critic already realizes per-agent "
                "encoders/heads internally (AttentionCritic nn.vmap axes); "
                "a non-shared variant would duplicate the shared attention "
                "projections and is not part of the reference benchmark")
        self.value_module = AttentionCritic(
            n_agents=self.n, obs_dim=self.obs_dim, act_dim=self.act_dim,
            hid_size=cfg.hid_size, attend_heads=cfg.attend_heads or 1,
            norm_in=bool(cfg.norm_in))

    def init_value_params(self, key):
        obs = jnp.zeros((1, self.n, self.obs_dim))
        act = jnp.zeros((1, self.n, self.act_dim))
        return self.value_module.init(key, obs, act)

    def value(self, params, obs, act):
        """Returns (q (b, n), attend_reg (n,))."""
        return self.value_module.apply(params, obs, act)

    def get_loss(self, state, batch, avail, key):
        """(reference maac.py:96-124)."""
        cfg = self.cfg
        b = self.unpack(batch)
        k1, k2 = jax.random.split(key)
        restore_mask = (avail != 0).astype(b.state.dtype)

        _, actions_pol, log_prob_a, action_out, _ = self.get_actions(
            state.policy_params, b.state, b.last_hid, k1,
            status="train", exploration=True, avail=avail)
        log_prob_a = jnp.sum(restore_mask * log_prob_a, axis=-1)  # (b, n)
        _, next_actions, _, _, _ = self.get_actions(
            state.target_policy_params, b.next_state, b.hid, k2,
            status="train", exploration=True, avail=avail)

        values_pol, _ = self.value(state.value_params, b.state, actions_pol)
        values, attn_reg = self.value(
            state.value_params, b.state, jax.lax.stop_gradient(b.action))
        next_values, _ = self.value(
            state.target_value_params, b.next_state,
            jax.lax.stop_gradient(next_actions))

        done = b.done[:, None]
        soft = 1.0 if cfg.soft else 0.0
        returns = (b.reward
                   + cfg.gamma * (1.0 - done) * jax.lax.stop_gradient(next_values)
                   - soft * jax.lax.stop_gradient(log_prob_a) / cfg.reward_scale)
        deltas = returns - values
        value_loss = jnp.mean(deltas**2)

        advantages = values_pol
        if cfg.normalize_advantages:
            advantages = batchnorm(advantages)
        if cfg.soft:
            policy_loss = log_prob_a / cfg.reward_scale - advantages
        else:
            policy_loss = -jax.lax.stop_gradient(advantages) * log_prob_a
        policy_loss = jnp.mean(policy_loss + attn_reg[None, :])
        return policy_loss, value_loss, action_out
