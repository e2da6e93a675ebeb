"""MATD3: MADDPG + twin critics (indicator-feature trick) + target-action
smoothing.

Re-design of reference models/matd3.py: the twin Q is realized exactly like
the reference — one shared critic evaluated twice with a trailing 0/1
indicator feature (:64-82) — target actions get clipped exploration noise
(clip path of select_action, util.py:72-74), and the TD target takes the
min of the twin target values (:141-142).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mapdn_tpu.algos.base import MARLModel
from mapdn_tpu.algos.maddpg import MADDPG
from mapdn_tpu.learn.sampling import batchnorm, select_action_continuous


class MATD3(MADDPG):
    def construct_value_net(self):
        # (reference matd3.py:21-30): MADDPG input + 1 indicator
        self.value_in_dim = (self.obs_dim + self.act_dim) * self.n + 1 + (
            self.n if self.cfg.agent_id else 0)
        self.value_module = self._mlp_critic(1)

    def value(self, params, obs, act):
        """Returns (q1, q2), each (b, n)."""
        inputs = self._joint_input(obs, act)
        zeros = jnp.zeros(inputs.shape[:-1] + (1,), inputs.dtype)
        v1 = self._apply_critic(
            params, jnp.concatenate([inputs, zeros], axis=-1))
        v2 = self._apply_critic(
            params, jnp.concatenate([inputs, 1.0 - zeros], axis=-1))
        return v1, v2

    def get_actions(self, params, obs, last_hid, key, *, status, exploration,
                    avail, clip=False):
        """Like base, but means/log_stds of unavailable slots are zeroed
        before sampling (reference matd3.py:100-102)."""
        means, log_stds, hid = self.policy(params, obs, last_hid)
        avail_mask = (avail != 0).astype(means.dtype)
        means = means * avail_mask
        log_stds = log_stds * avail_mask
        actions, log_prob = select_action_continuous(
            self.cfg, key, means, log_stds, status=status,
            exploration=exploration, clip=clip)
        restore = avail_mask * actions
        if log_prob is None:
            log_prob = jnp.zeros_like(means)
        return actions, restore, log_prob, (means, log_stds), hid

    def get_loss(self, state, batch, avail, key):
        """(reference matd3.py:126-160)."""
        cfg = self.cfg
        b = self.unpack(batch)
        k1, k2 = jax.random.split(key)

        _, actions_pol, _, action_out, _ = self.get_actions(
            state.policy_params, b.state, b.last_hid, k1,
            status="train", exploration=False, avail=avail)
        next_params = (state.policy_params if cfg.double_q
                       else state.target_policy_params)
        # exploration=True + clip=True: clipped target-policy smoothing noise
        _, next_actions, _, _, _ = self.get_actions(
            next_params, b.next_state, b.hid, k2,
            status="train", exploration=True, avail=avail, clip=True)

        values_pol, _ = self.value(state.value_params, b.state, actions_pol)
        values1, values2 = self.value(state.value_params, b.state, b.action)
        nv1, nv2 = self.value(
            state.target_value_params, b.next_state,
            jax.lax.stop_gradient(next_actions))

        done = b.done[:, None]
        next_values = jax.lax.stop_gradient(jnp.minimum(nv1, nv2))
        returns = b.reward + cfg.gamma * (1.0 - done) * next_values
        advantages = values_pol
        if cfg.normalize_advantages:
            advantages = batchnorm(advantages)
        policy_loss = -jnp.mean(advantages)
        value_loss = 0.5 * (jnp.mean((returns - values1) ** 2)
                            + jnp.mean((returns - values2) ** 2))
        return policy_loss, value_loss, action_out
