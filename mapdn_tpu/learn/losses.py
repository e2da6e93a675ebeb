"""Loss library: DDPG, ActorCritic, PPO.

Functional re-design of the reference's learning_algorithms/ package
(ddpg.py, actor_critic.py, ppo.py, rl_algorithms.py): each loss is a pure
function of (model, algo_state, batch, avail, key) returning
(policy_loss, value_loss, (means, log_stds)), so value/policy/mixer updates
can take gradients of the same scalar w.r.t. different parameter subsets —
the jax analog of the reference calling one get_loss from three optimizers
(reference trainer.py:58-108).

Only the continuous-action paths exist, matching what the benchmark
exercises (the reference's discrete branches are dead code with typos,
SURVEY.md section 2 quirks).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mapdn_tpu.algos.base import flatten_batch
from mapdn_tpu.learn.sampling import batchnorm, policy_log_density


def gae_advantages(rewards, next_values, values, mask, gamma, lambda_,
                  unroll=8):
    """Generalized advantage estimation over the window's time axis.

    Reverse recursion adv[t] = delta[t] + gamma*lambda*mask[t]*adv[t+1] with
    delta[t] = r[t] + gamma*mask[t]*V[t+1] - V[t], as a reverse ``lax.scan``
    (reference learning_algorithms/ppo.py:46-54 runs the same recursion as a
    backward Python loop).  All inputs are (T, ...) with mask broadcastable.

    ``unroll``: the per-step work is a handful of elementwise ops on tiny
    arrays, so a plain scan is pure While-op latency; unrolling fuses blocks
    of steps into straight-line code (identical numerics).
    """
    def gae_step(last_adv, xs):
        r, onv, ov, m = xs
        delta = r + gamma * onv * m - ov
        adv = delta + gamma * lambda_ * last_adv * m
        return adv, adv

    _, advantages = jax.lax.scan(
        gae_step, jnp.zeros_like(rewards[0]),
        (rewards, next_values, values, mask), reverse=True,
        unroll=min(unroll, rewards.shape[0]))
    return advantages


def ddpg_loss(model, state, batch, avail, key):
    """TD(0) critic + deterministic policy gradient
    (reference learning_algorithms/ddpg.py:15-39)."""
    cfg = model.cfg
    b = model.unpack(batch)
    k1, k2 = jax.random.split(key)

    _, actions_pol, _, action_out, _ = model.get_actions(
        state.policy_params, b.state, b.last_hid, k1,
        status="train", exploration=False, avail=avail)
    next_params = (state.policy_params if cfg.double_q
                   else state.target_policy_params)
    _, next_actions, _, _, _ = model.get_actions(
        next_params, b.next_state, b.hid, k2,
        status="train", exploration=False, avail=avail)

    values_pol = model.value(state.value_params, b.state, actions_pol)
    values = model.value(state.value_params, b.state, b.action)
    next_values = model.value(
        state.target_value_params, b.next_state,
        jax.lax.stop_gradient(next_actions))

    done = b.done[:, None]
    returns = b.reward + cfg.gamma * (1.0 - done) * jax.lax.stop_gradient(next_values)
    deltas = returns - values
    advantages = values_pol
    if cfg.normalize_advantages:
        advantages = batchnorm(advantages)
    policy_loss = -jnp.mean(advantages)
    value_loss = jnp.mean(deltas**2)
    return policy_loss, value_loss, action_out


def actor_critic_loss(model, state, batch, avail, key):
    """TD advantage x log-prob policy gradient
    (reference learning_algorithms/actor_critic.py:16-56; note the
    reference's 'advantage' is the detached Q itself, :48 — kept)."""
    cfg = model.cfg
    b = model.unpack(batch)
    k1 = key

    means, log_stds, _ = model.policy(state.policy_params, b.state, b.last_hid)
    log_prob_a = policy_log_density(cfg, b.action, means, log_stds)
    restore_mask = (avail != 0).astype(means.dtype)
    log_prob_a = jnp.sum(restore_mask * log_prob_a, axis=-1)  # (b, n)

    next_params = (state.policy_params if cfg.double_q
                   else state.target_policy_params)
    _, next_actions, _, _, _ = model.get_actions(
        next_params, b.next_state, b.hid, k1,
        status="train", exploration=False, avail=avail)

    values = model.value(state.value_params, b.state, b.action)
    # behaviour (not target) net evaluates the bootstrap (reference :37)
    next_values = model.value(
        state.value_params, b.next_state, jax.lax.stop_gradient(next_actions))

    done = b.done[:, None]
    returns = b.reward + cfg.gamma * (1.0 - done) * jax.lax.stop_gradient(next_values)
    deltas = returns - values
    advantages = jax.lax.stop_gradient(values)
    if cfg.normalize_advantages:
        advantages = batchnorm(advantages)
    policy_loss = -jnp.mean(advantages * log_prob_a)
    value_loss = jnp.mean(deltas**2)
    return policy_loss, value_loss, (means, log_stds)


def ppo_loss(model, state, batch, avail, key):
    """Clipped-surrogate PPO with GAE over the contiguous window
    (reference learning_algorithms/ppo.py:16-71).

    The GAE recursion runs over the window's time axis per env lane
    (reverse lax.scan), honoring the reference's episode-boundary masking
    (mask = 1-done only at last_step rows, ppo.py:47-54).  Unlike the
    reference — which stores raw *actions* in the old-log-prob slot
    (model.py:309) — true behaviour log-probs are used for the ratio.
    """
    cfg = model.cfg
    restore_mask_dtype = batch.state.dtype
    T = batch.reward.shape[0]

    # ---- GAE on (T, L, n) quantities with old (stored) values
    rewards = batch.reward
    if cfg.reward_normalisation:
        # normalize over the flattened batch like unpack() does, then reshape
        flat_r = batchnorm(flatten_batch(rewards))
        rewards = flat_r.reshape(rewards.shape)
    old_values = batch.value
    old_next_values = batch.next_value
    done = batch.done[..., None]       # (T, L, 1)
    last_step = batch.last_step[..., None]
    mask = jnp.where(last_step > 0, 1.0 - done, 1.0)

    advantages = gae_advantages(
        rewards, old_next_values, old_values, mask, cfg.gamma, cfg.lambda_,
        unroll=cfg.gae_unroll)

    b = model.unpack(batch)
    advantages = flatten_batch(advantages)
    rewards_f = flatten_batch(rewards)

    means, log_stds, _ = model.policy(state.policy_params, b.state, b.last_hid)
    restore_mask = (avail != 0).astype(restore_mask_dtype)
    log_prob_a = jnp.sum(
        restore_mask * policy_log_density(cfg, b.action, means, log_stds),
        axis=-1)
    old_log_prob_a = jnp.sum(restore_mask * b.log_prob_a, axis=-1)
    ratios = jnp.exp(log_prob_a - jax.lax.stop_gradient(old_log_prob_a))

    values = model.value(state.value_params, b.state, None)
    done_f = b.done[:, None]
    if cfg.ppo_value_target == "gae":
        # standard PPO: targets fixed within the update (the bootstrap
        # variant regresses V onto r + gamma*V(s') of the SAME live params —
        # reference ppo.py:56 — which runs away once the batch is big enough
        # for the critic to actually follow its own targets)
        returns = jax.lax.stop_gradient(
            advantages + flatten_batch(old_values))
    else:
        next_values = model.value(state.value_params, b.next_state, None)
        returns = rewards_f + cfg.gamma * (1.0 - done_f) * \
            jax.lax.stop_gradient(next_values)

    if cfg.normalize_advantages:
        advantages = batchnorm(advantages)
    advantages = jax.lax.stop_gradient(advantages)

    surr1 = ratios * advantages
    surr2 = jnp.clip(ratios, 1.0 - cfg.eps_clip, 1.0 + cfg.eps_clip) * advantages
    policy_loss = -jnp.mean(jnp.minimum(surr1, surr2))

    old_values_f = flatten_batch(old_values)
    values_clipped = old_values_f + jnp.clip(
        values - old_values_f, -cfg.eps_clip, cfg.eps_clip)
    vl1 = (values - returns) ** 2
    vl2 = (values_clipped - returns) ** 2
    value_loss = cfg.value_loss_coef * jnp.mean(jnp.maximum(vl1, vl2))
    return policy_loss, value_loss, (means, log_stds)
