"""Policy networks (flax): MLP / GRU agents, deterministic and Gaussian.

Re-designs of the reference's four agent modules
(reference agents/{mlp,rnn}_agent[_gaussian].py) as flax.linen modules over
batched inputs.  Structural parity:

* fc1 -> optional LayerNorm -> activation  (reference mlp_agent.py:28-31)
* MLP: fc2 -> activation -> head           (reference mlp_agent.py:32-34)
* RNN: GRUCell(hid) -> head                (reference rnn_agent.py:27-32)
* Gaussian heads: mean + log_std with tanh-bounded log_std in
  [LOG_STD_MIN, LOG_STD_MAX]               (reference rnn_agent_gaussian.py:33-40)
* init: Normal(0, init_std) kernels        (reference models/model.py:173-181)

The GRU hidden state is threaded explicitly (shape (..., hid)); rollouts
scan these cells over time with lax.scan instead of Python loops.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


def _activation(name):
    return {"relu": nn.relu, "tanh": nn.tanh}[name]


def _kernel_init(init_type, init_std, activation):
    if init_type == "orthogonal":
        gain = {"relu": 2.0**0.5, "tanh": 5.0 / 3.0}[activation]
        return nn.initializers.orthogonal(scale=gain)
    return nn.initializers.normal(stddev=init_std)


class _Base(nn.Module):
    hid_size: int = 64
    layernorm: bool = True
    hid_activation: str = "relu"
    init_type: str = "normal"
    init_std: float = 0.1

    def _dense(self, feats):
        return nn.Dense(
            feats,
            kernel_init=_kernel_init(self.init_type, self.init_std,
                                     self.hid_activation))

    def _stem(self, x):
        x = self._dense(self.hid_size)(x)
        if self.layernorm:
            x = nn.LayerNorm()(x)
        return _activation(self.hid_activation)(x)


class MLPAgent(_Base):
    """Deterministic MLP policy head (reference agents/mlp_agent.py:5-32)."""
    action_dim: int = 1

    @nn.compact
    def __call__(self, x, hidden=None):
        act = _activation(self.hid_activation)
        h = act(self._dense(self.hid_size)(self._stem(x)))
        a = self._dense(self.action_dim)(h)
        return a, None, hidden


class MLPAgentGaussian(_Base):
    """Gaussian MLP policy (reference agents/mlp_agent_gaussian.py:6-39)."""
    action_dim: int = 1
    log_std_min: float = 0.0
    log_std_max: float = 0.5

    @nn.compact
    def __call__(self, x, hidden=None):
        act = _activation(self.hid_activation)
        h = act(self._dense(self.hid_size)(self._stem(x)))
        mean = self._dense(self.action_dim)(h)
        log_std = jnp.tanh(self._dense(self.action_dim)(h))
        log_std = self.log_std_min + 0.5 * (
            self.log_std_max - self.log_std_min) * (log_std + 1.0)
        return mean, log_std, hidden


class RNNAgent(_Base):
    """Deterministic GRU policy (reference agents/rnn_agent.py:5-32)."""
    action_dim: int = 1

    @nn.compact
    def __call__(self, x, hidden):
        x = self._stem(x)
        hidden, h = nn.GRUCell(features=self.hid_size)(hidden, x)
        a = self._dense(self.action_dim)(h)
        return a, None, hidden


class RNNAgentGaussian(_Base):
    """Gaussian GRU policy (reference agents/rnn_agent_gaussian.py:6-40)."""
    action_dim: int = 1
    log_std_min: float = 0.0
    log_std_max: float = 0.5

    @nn.compact
    def __call__(self, x, hidden):
        x = self._stem(x)
        hidden, h = nn.GRUCell(features=self.hid_size)(hidden, x)
        mean = self._dense(self.action_dim)(h)
        log_std = jnp.tanh(self._dense(self.action_dim)(h))
        log_std = self.log_std_min + 0.5 * (
            self.log_std_max - self.log_std_min) * (log_std + 1.0)
        return mean, log_std, hidden
