"""SQDDPG: Shapley-value credit assignment via sampled grand coalitions.

Re-design of reference models/sqddpg.py.  Each sample draws a random
permutation of agents; agent i's marginal contribution is the critic value
of the joint action restricted to (its predecessors in the permutation,
gradient-detached) plus (its own action, live), other actions zeroed
(reference sample_grandcoalitions :37-63 and marginal_contribution :65-106,
implemented here from the documented intent rather than the index
gymnastics).  The TD target regresses the *sum* of Shapley values
(reference :141-153).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mapdn_tpu.algos.base import MARLModel
from mapdn_tpu.learn.sampling import batchnorm


class SQDDPG(MARLModel):
    def construct_value_net(self):
        self.value_in_dim = (self.obs_dim + self.act_dim) * self.n + (
            self.n if self.cfg.agent_id else 0)
        self.value_module = self._mlp_critic(1)

    def marginal_contribution(self, params, obs, act, key):
        """(b, n, o), (b, n, a) -> (b, s, n) sampled marginal contributions."""
        cfg = self.cfg
        b = obs.shape[0]
        s = cfg.sample_size
        n = self.n

        # positions[b, s, j] = rank of agent j in the sampled permutation
        keys = jax.random.split(key, b * s)
        perms = jax.vmap(lambda k: jax.random.permutation(k, n))(keys)
        positions = perms.reshape(b, s, n)

        # prec[b,s,i,j] = 1 if j precedes i; own[i,j] = 1 if i == j
        pos_i = positions[..., :, None]
        pos_j = positions[..., None, :]
        prec = (pos_j < pos_i).astype(obs.dtype)
        own = jnp.eye(n, dtype=obs.dtype)[None, None]

        act_rep = jnp.broadcast_to(
            act[:, None, None], (b, s, n, n, self.act_dim))
        act_masked = (jax.lax.stop_gradient(act_rep) * prec[..., None]
                      + act_rep * own[..., None])
        act_masked = act_masked.reshape(b, s, n, n * self.act_dim)

        obs_rep = jnp.broadcast_to(
            obs[:, None, None], (b, s, n, n, self.obs_dim)
        ).reshape(b, s, n, n * self.obs_dim)
        inp = jnp.concatenate([obs_rep, act_masked], axis=-1)
        if cfg.agent_id:
            ids = jnp.broadcast_to(
                jnp.eye(n, dtype=obs.dtype), (b, s, n, n))
            inp = jnp.concatenate([inp, ids], axis=-1)

        v = self._apply_critic(params, inp.reshape(b * s, n, -1))
        return v.reshape(b, s, n)

    def value(self, params, obs, act, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        return self.marginal_contribution(params, obs, act, key)

    def get_loss(self, state, batch, avail, key):
        """(reference sqddpg.py:137-160)."""
        cfg = self.cfg
        b = self.unpack(batch)
        bsz = b.state.shape[0]
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)

        _, actions_pol, _, action_out, _ = self.get_actions(
            state.policy_params, b.state, b.last_hid, k1,
            status="train", exploration=False, avail=avail)
        next_params = (state.policy_params if cfg.double_q
                       else state.target_policy_params)
        _, next_actions, _, _, _ = self.get_actions(
            next_params, b.next_state, b.hid, k2,
            status="train", exploration=False, avail=avail)

        shapley_pol = jnp.mean(self.marginal_contribution(
            state.value_params, b.state, actions_pol, k3), axis=1)
        shapley_sum = jnp.mean(self.marginal_contribution(
            state.value_params, b.state, b.action, k4), axis=1)
        shapley_sum = jnp.broadcast_to(
            jnp.sum(shapley_sum, axis=-1, keepdims=True), (bsz, self.n))
        tgt_params = (state.target_value_params if cfg.target
                      else state.value_params)
        next_sum = jnp.mean(self.marginal_contribution(
            tgt_params, b.next_state,
            jax.lax.stop_gradient(next_actions), k5), axis=1)
        next_sum = jnp.broadcast_to(
            jnp.sum(next_sum, axis=-1, keepdims=True), (bsz, self.n))

        done = b.done[:, None]
        returns = b.reward + cfg.gamma * (1.0 - done) * jax.lax.stop_gradient(next_sum)
        deltas = returns - shapley_sum
        advantages = shapley_pol
        if cfg.normalize_advantages:
            advantages = batchnorm(advantages)
        policy_loss = -jnp.mean(advantages)
        value_loss = jnp.mean(deltas**2)
        return policy_loss, value_loss, action_out
