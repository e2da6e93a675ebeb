"""Random-action baseline (reference models/random.py — present there but
left out of the registry dict; registered here for convenience)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mapdn_tpu.algos.base import MARLModel


class RandomAgent(MARLModel):
    def construct_value_net(self):
        self.value_in_dim = 1
        self.value_module = self._mlp_critic(1)

    def value(self, params, obs, act):
        return jnp.zeros(obs.shape[:2], obs.dtype)

    def get_actions(self, params, obs, last_hid, key, *, status, exploration,
                    avail, clip=False):
        means = jax.random.normal(
            key, obs.shape[:2] + (self.act_dim,), obs.dtype)
        log_stds = jnp.zeros_like(means)
        restore_mask = (avail != 0).astype(means.dtype)
        actions = jnp.tanh(means) if self.cfg.action_enforcebound else means
        return (actions, restore_mask * actions, jnp.zeros_like(means),
                (means, log_stds), last_hid)

    def get_loss(self, state, batch, avail, key):
        zero = jnp.zeros(())
        means = jnp.zeros_like(batch.action)
        return zero, zero, (means, means)
