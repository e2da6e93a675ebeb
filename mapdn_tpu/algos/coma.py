"""COMA: counterfactual multi-agent policy gradient, continuous variant.

Re-design of reference models/coma.py.  The continuous counterfactual
baseline samples `sample_size` joint actions from the current policy and,
per agent, replaces that agent's action in the joint action with its
sampled one; the baseline is the mean critic value over samples
(reference coma.py:139-151).  The critic sees (all obs, own obs, all
actions) [+ agent id] (reference coma.py:21-37).

(The reference's discrete branch contains a fatal typo `unsuqeeze`,
coma.py:83 — only the continuous path, which the benchmark uses, exists
here.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mapdn_tpu.algos.base import MARLModel
from mapdn_tpu.learn.sampling import batchnorm, policy_log_density


class COMA(MARLModel):
    on_policy = True

    def construct_value_net(self):
        self.value_in_dim = (self.n + 1) * self.obs_dim + self.n * self.act_dim + (
            self.n if self.cfg.agent_id else 0)
        self.value_module = self._mlp_critic(1)

    def _critic_obs(self, obs):
        """(b, n, o) -> (b, n, n*o + o [+ n]) joint+own obs block."""
        b = obs.shape[0]
        joint = jnp.broadcast_to(
            obs[:, None], (b, self.n, self.n, self.obs_dim)).reshape(b, self.n, -1)
        inp = jnp.concatenate([joint, obs], axis=-1)
        if self.cfg.agent_id:
            inp = jnp.concatenate([inp, self.agent_ids(b, obs.dtype)], axis=-1)
        return inp

    def value_joint(self, params, obs, act_joint):
        """obs (b, n, o); act_joint (b, n, n*a) per-agent joint actions."""
        inp = jnp.concatenate([self._critic_obs(obs), act_joint], axis=-1)
        return self._apply_critic(params, inp)

    def value(self, params, obs, act):
        b = obs.shape[0]
        act_joint = jnp.broadcast_to(
            act[:, None], (b, self.n, self.n, self.act_dim)).reshape(b, self.n, -1)
        return self.value_joint(params, obs, act_joint)

    def get_loss(self, state, batch, avail, key):
        cfg = self.cfg
        b = self.unpack(batch)
        bsz = b.state.shape[0]
        k_next, k_sample = jax.random.split(key)

        means, log_stds, _ = self.policy(state.policy_params, b.state, b.last_hid)
        log_prob_a = policy_log_density(cfg, b.action, means, log_stds)

        next_params = (state.policy_params if cfg.double_q
                       else state.target_policy_params)
        _, next_actions, _, _, _ = self.get_actions(
            next_params, b.next_state, b.hid, k_next,
            status="train", exploration=False, avail=avail)

        # sampled counterfactual baseline (reference coma.py:139-151)
        s = cfg.sample_size
        noise = jax.random.normal(
            k_sample, (s,) + means.shape, means.dtype)
        sampled = jax.lax.stop_gradient(means + jnp.exp(log_stds) * noise)  # (s,b,n,a)
        act_rep = jnp.broadcast_to(
            b.action[None, :, None], (s, bsz, self.n, self.n, self.act_dim))
        smp_rep = jnp.broadcast_to(
            sampled[:, :, None], (s, bsz, self.n, self.n, self.act_dim))
        own = jnp.eye(self.n, dtype=means.dtype)[None, None, :, :, None]
        merged = act_rep * (1.0 - own) + smp_rep * own
        merged = merged.reshape(s * bsz, self.n, self.n * self.act_dim)
        obs_rep = jnp.broadcast_to(
            b.state[None], (s,) + b.state.shape).reshape(s * bsz, self.n, -1)
        values_sampled = self.value_joint(
            state.value_params, obs_rep, merged).reshape(s, bsz, self.n)
        baselines = jnp.mean(values_sampled, axis=0)

        values = self.value(state.value_params, b.state, b.action)
        if cfg.target:
            next_values = self.value(
                state.target_value_params, b.next_state, next_actions)
        else:
            next_values = self.value(
                state.value_params, b.next_state, next_actions)

        done = b.done[:, None]
        returns = b.reward + cfg.gamma * (1.0 - done) * jax.lax.stop_gradient(next_values)
        value_loss = jnp.mean((returns - values) ** 2)

        advantages = jax.lax.stop_gradient(values - baselines)
        if cfg.normalize_advantages:
            advantages = batchnorm(advantages)
        restore_mask = (avail != 0).astype(means.dtype)
        lp = jnp.sum(restore_mask * log_prob_a, axis=-1)
        policy_loss = -jnp.mean(advantages * lp)
        return policy_loss, value_loss, (means, log_stds)
