"""Action selection, densities and small tensor utilities.

Functional JAX re-design of the reference's utilities/util.py: explicit PRNG
keys instead of global torch RNG, branchless under jit (the mode switches
are python-static).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# host constant: keeps importing this module from initializing the XLA
# backend (jax.distributed.initialize must run before any device op)
LOG2PI = math.log(2.0 * math.pi)


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


def policy_log_density(cfg, actions, means, log_stds):
    """Log density of a STORED action under the current policy.

    With ``action_enforcebound`` stored actions are tanh-squashed
    (y = tanh(x), x ~ N(mean, std)); the correct density of y inverts the
    squash: log N(atanh(y); mean, std) - log(1 - y^2).  The reference
    instead evaluates N(y; mean, std) directly on the squashed action
    (ppo.py:30-31, actor_critic.py:27-28) — inconsistent with the
    rollout-side corrected density, which breaks PPO's importance ratio.
    Deviation documented in configs/alg/mappo.yaml.
    """
    if cfg.action_enforcebound:
        y = jnp.clip(actions, -1.0 + 1e-6, 1.0 - 1e-6)
        x = jnp.arctanh(y)
        return normal_log_density(x, means, log_stds) - jnp.log(
            1.0 - y * y + 1e-6)
    return normal_log_density(actions, means, log_stds)


def multinomials_log_density(actions, logits):
    """Categorical log density sum_i a_i log p_i (reference util.py:47-50).
    Valid for hard one-hots and for Gumbel-softmax relaxed samples (the
    torch OneHotCategorical.log_prob semantics the reference relies on)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.sum(actions * logp, axis=-1, keepdims=True)


def select_action_discrete(cfg, key, logits, *, status="train",
                           exploration=True):
    """Discrete-action selection (reference util.py:87-121).

    train+exploration: epsilon-softmax categorical (cfg.epsilon_softmax),
    reparameterized Gumbel-softmax rsample at T=0.1 (cfg.gumbel_softmax),
    or a plain one-hot categorical; train w/o exploration: the same but the
    Gumbel path samples detached at T=1.0; test: greedy argmax one-hot.
    Returns (actions, log_prob | None).  NOTE the reference's own discrete
    loss branches are broken (e.g. coma.py:83 'unsuqeeze'); this benchmark
    only exercises continuous actions — these utilities exist for API
    parity and custom discrete envs."""
    n = logits.shape[-1]
    if status == "test":
        p = jax.nn.softmax(logits, axis=-1)
        greedy = (p == jnp.max(p, axis=-1, keepdims=True))
        return greedy.astype(logits.dtype), None
    if exploration and cfg.epsilon_softmax:
        eps = cfg.softmax_eps
        probs = (1.0 - eps) * jax.nn.softmax(logits, axis=-1) + eps / n
        idx = jax.random.categorical(key, jnp.log(probs))
        actions = jax.nn.one_hot(idx, n, dtype=logits.dtype)
        log_prob = jnp.sum(actions * jnp.log(probs), axis=-1, keepdims=True)
        return actions, log_prob
    if cfg.gumbel_softmax:
        if exploration:   # differentiable rsample (reference :97-101)
            actions = gumbel_softmax_sample(key, logits, temperature=0.1)
        else:             # detached T=1.0 sample (reference :109-113)
            actions = jax.lax.stop_gradient(
                gumbel_softmax_sample(key, logits, temperature=1.0))
        return actions, multinomials_log_density(actions, logits)
    idx = jax.random.categorical(key, logits)
    actions = jax.nn.one_hot(idx, n, dtype=logits.dtype)
    return actions, multinomials_log_density(actions, logits)


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
