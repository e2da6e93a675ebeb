"""Shared MARL model base: policy plumbing, targets, optimizers, transitions.

Functional JAX re-design of the reference's ``Model`` base class
(reference models/model.py).  The reference couples parameters, target nets
and optimizers inside one nn.Module and mutates them; here all learnable
state lives in an :class:`AlgoState` pytree and every method is a pure
function usable under jit/vmap/shard_map.  Structural parity points:

* shared-parameter policy with an agent-id one-hot appended to the obs
  (reference model.py:101-139)
* policy net selection MLP/RNN x deterministic/Gaussian
  (reference model.py:144-168)
* soft target updates target <- (1-tau) target + tau behaviour
  (reference model.py:27-37, tau = target_lr)
* per-head RMSprop(alpha=0.99, eps=1e-5) with global-norm grad clipping
  (reference trainer.py:26-29 and util.py:161-163)
* the 12-field Transition tuple (reference model.py:18), minus the
  always-constant action_avail (kept statically on the model instead) and
  with *true* stored log-probs (the reference stores actions in that slot,
  model.py:309 — a known quirk SURVEY.md flags for fixing)

Deliberate deviation: for multi-dim actions the reference sums means/stds
over the agent axis before sampling (e.g. maddpg.py:85-88) — an apparent
artifact; we sample per-agent from its own (mean, std) and mask by action
availability.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mapdn_tpu.learn.sampling import (
    batchnorm, select_action_continuous)
from mapdn_tpu.nets.agents import (
    MLPAgent, MLPAgentGaussian, RNNAgent, RNNAgentGaussian)
from mapdn_tpu.nets.critics import MLPCritic


@struct.dataclass
class AlgoState:
    """All learnable/optimizer state of one algorithm (a pytree)."""
    policy_params: Any
    value_params: Any
    mixer_params: Any
    target_policy_params: Any
    target_value_params: Any
    target_mixer_params: Any
    policy_opt: Any
    value_opt: Any
    mixer_opt: Any


@struct.dataclass
class Transition:
    """One (vectorized) environment transition (reference model.py:18)."""
    state: jnp.ndarray        # (n_env, n, obs)
    action: jnp.ndarray       # (n_env, n, act)  policy output pre-translate
    log_prob_a: jnp.ndarray   # (n_env, n, act)
    value: jnp.ndarray        # (n_env, n)
    next_value: jnp.ndarray   # (n_env, n)
    reward: jnp.ndarray       # (n_env, n)  team reward repeated per agent
    next_state: jnp.ndarray   # (n_env, n, obs)
    done: jnp.ndarray         # (n_env,)
    last_step: jnp.ndarray    # (n_env,)
    last_hid: jnp.ndarray     # (n_env, n, hid)
    hid: jnp.ndarray          # (n_env, n, hid)


def soft_update(target, source, tau):
    """target <- (1 - tau) target + tau source (reference model.py:27-37)."""
    return jax.tree_util.tree_map(
        lambda t, s: (1.0 - tau) * t + tau * s, target, source)


def flatten_batch(x):
    """(T, L, ...) -> (T*L, ...) for per-transition losses.

    Explicit T*L instead of -1: a zero-size trailing dim (e.g. the width-0
    Transition.hid placeholder of the PPO family) breaks -1 inference."""
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


class MARLModel:
    """Base class; subclasses define the critic and the loss.

    Instances hold only static configuration and flax module definitions;
    parameters travel in AlgoState.
    """

    on_policy = False     # COMA/IAC/IPPO/MAPPO clear the buffer post-update
    uses_mixer = False
    # True for algorithms whose get_loss reads the rollout-time critic values
    # stored in the Transition (PPO-family GAE); everything else recomputes
    # values from the batch, so the trainer skips the rollout critic forward
    stores_rollout_value = False
    # a stores_rollout_value algorithm whose value() needs actions would be
    # incompatible with the trainer's whole-chunk act=None critic forward;
    # it must set this so the trainer fails loudly instead of mis-evaluating
    rollout_value_needs_act = False
    # whether get_loss reads the NEXT-step GRU state (Transition.hid) — the
    # DDPG/AC family bootstraps next-state actions through it.  The PPO
    # family never does, and the (capacity, n_envs, n, hid) ring field is
    # the single largest replay tensor: round-4 trace showed its in-scan
    # writes + inter-phase layout copies cost ~25 ms per 8192-lane chunk,
    # so algorithms that don't read it store a width-0 placeholder instead
    stores_next_hidden = True

    def __init__(self, cfg):
        self.cfg = cfg
        self.n = cfg.agent_num
        self.obs_dim = cfg.obs_size
        self.act_dim = cfg.action_dim
        self.hid_dim = cfg.hid_size
        if not cfg.continuous:
            raise NotImplementedError(
                "discrete action spaces: the voltage-control benchmark only "
                "exercises the continuous path (reference args/default.yaml "
                "continuous: True; its discrete loss branches are broken, "
                "e.g. coma.py:83). The selection/density utilities exist in "
                "learn.sampling (select_action_discrete, "
                "multinomials_log_density) for custom discrete envs.")

        self.policy_module = self._make_policy_module()
        self.construct_value_net()

        clip = optax.clip_by_global_norm(cfg.grad_clip_eps)
        rms = lambda lr: optax.rmsprop(lr, decay=0.99, eps=1e-5)
        self.policy_tx = optax.chain(clip, rms(cfg.policy_lrate))
        self.value_tx = optax.chain(clip, rms(cfg.value_lrate))
        self.mixer_tx = optax.chain(
            clip, rms(cfg.mixer_lrate or cfg.value_lrate))

    # ------------------------------------------------------------- modules
    def _policy_input_dim(self):
        return self.obs_dim + (self.n if self.cfg.agent_id else 0)

    def _make_policy_module(self):
        cfg = self.cfg
        kw = dict(hid_size=cfg.hid_size, layernorm=cfg.layernorm,
                  hid_activation=cfg.hid_activation, init_type=cfg.init_type,
                  init_std=cfg.init_std, action_dim=cfg.action_dim)
        if cfg.agent_type == "mlp":
            if cfg.gaussian_policy:
                return MLPAgentGaussian(
                    log_std_min=cfg.LOG_STD_MIN, log_std_max=cfg.LOG_STD_MAX, **kw)
            return MLPAgent(**kw)
        if cfg.agent_type == "rnn":
            if cfg.gaussian_policy:
                return RNNAgentGaussian(
                    log_std_min=cfg.LOG_STD_MIN, log_std_max=cfg.LOG_STD_MAX, **kw)
            return RNNAgent(**kw)
        raise ValueError(f"unknown agent_type {cfg.agent_type}")

    def _mlp_critic(self, output_dim=1):
        cfg = self.cfg
        return MLPCritic(
            hid_size=cfg.hid_size, layernorm=cfg.layernorm,
            hid_activation=cfg.hid_activation, init_type=cfg.init_type,
            init_std=cfg.init_std, output_dim=output_dim)

    def construct_value_net(self):
        """Subclasses assign self.value_module (+ extras)."""
        raise NotImplementedError

    # ---------------------------------------------------------------- init
    def init_hidden(self, batch_size, dtype=jnp.float32):
        """(b, n, hid) zero GRU state (reference agents/*.py init_hidden)."""
        return jnp.zeros((batch_size, self.n, self.hid_dim), dtype)

    def _example_policy_in(self):
        return (jnp.zeros((1, self._policy_input_dim())),
                jnp.zeros((1, self.hid_dim)))

    def init_value_params(self, key):
        """Default: an MLPCritic over a flat input of self.value_in_dim
        (subclasses with exotic critics override)."""
        return self._stacked_init(
            self.value_module, key, jnp.zeros((1, self.value_in_dim)))

    # ------------------------------------------------- shared vs. per-agent
    def _stacked_init(self, module, key, *example):
        """Init module params; with ``shared_params: False`` returns a
        per-agent parameter stack (leading n axis) — the JAX analog of the
        reference's per-agent ModuleLists (reference model.py:165-168,
        iddpg.py:25-28)."""
        if self.cfg.shared_params:
            return module.init(key, *example)
        keys = jax.random.split(key, self.n)
        return jax.vmap(lambda k: module.init(k, *example))(keys)

    def _per_agent_apply(self, module, params, *inputs):
        """Apply ``module`` with a stacked (leading n axis) param tree over
        the agent axis of ``inputs`` ((b, n, ...) each), returning outputs
        with a (b, n, ...) layout.  One vmapped call instead of the
        reference's Python loop over per-agent modules (model.py:122-137)."""
        in_axes = (0,) + (1,) * len(inputs)
        return jax.vmap(module.apply, in_axes=in_axes, out_axes=1)(
            params, *inputs)

    def _apply_critic(self, params, inputs):
        """Evaluate self.value_module on per-agent inputs (b, n, d) -> (b, n).

        Shared params: one (b*n, d) batched forward.  Non-shared: stacked
        per-agent params via vmap (reference's per-agent value_dicts loop,
        e.g. iddpg.py:44-57)."""
        b, n = inputs.shape[0], inputs.shape[1]
        if self.cfg.shared_params:
            v = self.value_module.apply(params, inputs.reshape(b * n, -1))
            return v.reshape(b, n)
        return self._per_agent_apply(self.value_module, params, inputs)[..., 0]

    def init_mixer_params(self, key):
        return {}

    def init_state(self, key) -> AlgoState:
        kp, kv, km = jax.random.split(key, 3)
        x, h = self._example_policy_in()
        policy_params = self._stacked_init(self.policy_module, kp, x, h)
        value_params = self.init_value_params(kv)
        mixer_params = self.init_mixer_params(km) if self.uses_mixer else {}
        return AlgoState(
            policy_params=policy_params,
            value_params=value_params,
            mixer_params=mixer_params,
            target_policy_params=jax.tree_util.tree_map(jnp.copy, policy_params),
            target_value_params=jax.tree_util.tree_map(jnp.copy, value_params),
            target_mixer_params=jax.tree_util.tree_map(jnp.copy, mixer_params),
            policy_opt=self.policy_tx.init(policy_params),
            value_opt=self.value_tx.init(value_params),
            mixer_opt=self.mixer_tx.init(mixer_params) if self.uses_mixer else {},
        )

    # --------------------------------------------------------------- policy
    def agent_ids(self, batch_size, dtype=jnp.float32):
        return jnp.broadcast_to(
            jnp.eye(self.n, dtype=dtype), (batch_size, self.n, self.n))

    def policy(self, params, obs, last_hid):
        """(b, n, o) -> means/log_stds/hid (b, n, ·) (reference model.py:101-139).

        shared_params=False runs the per-agent parameter stack via vmap over
        the agent axis (reference model.py:122-137 loops Python modules)."""
        b = obs.shape[0]
        if self.cfg.agent_id:
            obs = jnp.concatenate([obs, self.agent_ids(b, obs.dtype)], axis=-1)
        if self.cfg.shared_params:
            flat = obs.reshape(b * self.n, -1)
            hid_flat = last_hid.reshape(b * self.n, self.hid_dim)
            means, log_stds, hid = self.policy_module.apply(
                params, flat, hid_flat)
            means = means.reshape(b, self.n, -1)
            if hid is None:
                hid = hid_flat
            hid = hid.reshape(b, self.n, -1)
            if self.cfg.gaussian_policy:
                log_stds = log_stds.reshape(b, self.n, -1)
        else:
            means, log_stds, hid = self._per_agent_apply(
                self.policy_module, params, obs, last_hid)
            if hid is None:
                hid = last_hid
        if not self.cfg.gaussian_policy:
            log_stds = jnp.full_like(
                means, jnp.log(jnp.asarray(self.cfg.fixed_policy_std,
                                           means.dtype)))
        return means, log_stds, hid

    def get_actions(self, params, obs, last_hid, key, *, status, exploration,
                    avail, clip=False):
        """Sample/evaluate actions (reference per-algorithm get_actions,
        e.g. maddpg.py:80-100).  ``avail``: (n, n_actions) mask."""
        means, log_stds, hid = self.policy(params, obs, last_hid)
        actions, log_prob = select_action_continuous(
            self.cfg, key, means, log_stds, status=status,
            exploration=exploration, clip=clip)
        restore_mask = (avail != 0).astype(actions.dtype)
        restore = restore_mask * actions
        if log_prob is None:
            log_prob = jnp.zeros_like(means)
        return actions, restore, log_prob, (means, log_stds), hid

    # ---------------------------------------------------------------- value
    def value(self, params, obs, act):
        raise NotImplementedError

    # ---------------------------------------------------------------- batch
    def unpack(self, batch: Transition):
        """Flatten (T, L, ...) -> (b, ...) and apply reward normalization
        (reference model.py:304-319)."""
        flat = jax.tree_util.tree_map(flatten_batch, batch)
        reward = flat.reward
        if self.cfg.reward_normalisation:
            reward = batchnorm(reward)
        return flat.replace(reward=reward)

    # --------------------------------------------------------------- losses
    def get_loss(self, state: AlgoState, batch: Transition, avail, key):
        """Return (policy_loss, value_loss, (means, log_stds))."""
        raise NotImplementedError
