"""Action selection, densities and small tensor utilities.

Functional JAX re-design of the reference's utilities/util.py: explicit PRNG
keys instead of global torch RNG, branchless under jit (the mode switches
are python-static).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

LOG2PI = jnp.log(2.0 * jnp.pi)


def normal_log_density(x, mean, log_std):
    """Diagonal-Gaussian log density (reference util.py:44-46)."""
    var = jnp.exp(2.0 * log_std)
    return -0.5 * ((x - mean) ** 2 / var + 2.0 * log_std + LOG2PI)


def normal_entropy(mean, log_std):
    """Mean entropy of a diagonal Gaussian (reference util.py:37-38)."""
    return jnp.mean(0.5 + 0.5 * LOG2PI + log_std)


def categorical_entropy(logits):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(jnp.exp(logp) * logp, axis=-1))


def gumbel_softmax_sample(key, logits, temperature=0.1, eps=1e-20):
    """Reparameterized Gumbel-softmax draw (reference util.py:9-35)."""
    u = jax.random.uniform(key, logits.shape, logits.dtype)
    g = -jnp.log(-jnp.log(u + eps) + eps)
    return jax.nn.softmax((logits + g) / temperature, axis=-1)


def select_action_continuous(cfg, key, means, log_stds, *, status="train",
                             exploration=True, clip=False):
    """Continuous-action selection (reference util.py:52-87).

    Returns (actions, log_prob | None).  Branch structure is identical to the
    reference: with ``action_enforcebound`` exploration draws x ~ N(mean, std),
    squashes a = tanh(x) and applies the tanh log-prob correction; without it
    exploration adds zero-mean noise (optionally clamped to +-clip_c, the
    TD3 target-policy-smoothing path, reference util.py:68-76).
    """
    if status == "train" and exploration:
        std = jnp.exp(log_stds)
        if cfg.action_enforcebound:
            x = means + std * jax.random.normal(key, means.shape, means.dtype)
            y = jnp.tanh(x)
            log_prob = normal_log_density(x, means, log_stds)
            log_prob = log_prob - jnp.log(1.0 - y**2 + 1e-6)
            return y, log_prob
        noise = std * jax.random.normal(key, means.shape, means.dtype)
        log_prob = normal_log_density(noise, jnp.zeros_like(means), log_stds)
        if clip:
            noise = jnp.clip(noise, -cfg.clip_c, cfg.clip_c)
        return means + noise, log_prob
    if status == "test" and cfg.action_enforcebound:
        return jnp.tanh(means), None
    return means, None


def batchnorm(x, axis=0, eps=1e-5):
    """Batch standardization (reference util.py:155-159 / the nn.BatchNorm1d
    reward normalizer in model.py:19,317-318, whose affine params are never
    trained in the reference since no optimizer owns them)."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    std = jnp.std(x, axis=axis, keepdims=True)
    return (x - mean) / (std + eps)


def global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(l * l) for l in leaves))


def translate_action(cfg, actions):
    """clamp to [-1,1] then affine to [bias-scale, bias+scale]
    (reference util.py:123-132)."""
    a = jnp.clip(actions, -1.0, 1.0)
    low = cfg.action_bias - cfg.action_scale
    high = cfg.action_bias + cfg.action_scale
    return 0.5 * (a + 1.0) * (high - low) + low
