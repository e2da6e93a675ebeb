"""PGTrainer: fused vectorized rollout + update runtime.

Re-design of the reference training runtime (reference utilities/trainer.py
+ the rollout loop in models/model.py:197-263).  The reference steps ONE
host env, ping-ponging tensors CPU<->GPU every step and pausing every 60
steps for 11 optimizer mini-steps (SURVEY.md section 3.1).  Here one jitted
`train_chunk` runs `behaviour_update_freq` vectorized env steps (lax.scan
over time, n_envs lanes, power flow on device) AND the update phase
(value/policy/mixer epochs sampling the on-HBM replay) in a single XLA
program — zero host transfers inside the hot loop.

Cadence parity (reference args/default.yaml):
  every behaviour_update_freq env steps: value_update_epochs value steps,
  policy_update_epochs policy steps (+ entropy bonus), mixer epochs if the
  algorithm has a mixer; soft target update every target_update_freq steps;
  on-policy algorithms clear the buffer after updating
  (reference model.py:39-70).
Stats names mirror the reference's tensorboard keys (mean_train_*).
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mapdn_tpu.algos.base import AlgoState, Transition, soft_update
from mapdn_tpu.learn import replay as rb
from mapdn_tpu.learn.sampling import (
    global_norm, normal_entropy, translate_action)


@struct.dataclass
class TrainerCarry:
    env_state: Any            # batched EnvState (n_envs lanes)
    obs: jnp.ndarray          # (n_envs, n_agents, obs_dim)
    last_hid: jnp.ndarray     # (n_envs, n_agents, hid)
    algo: AlgoState
    replay: rb.ReplayState
    rng: jnp.ndarray
    steps: jnp.ndarray        # () int32 env-step counter (per lane)


class PGTrainer:
    def __init__(self, cfg, model, env):
        self.cfg = cfg
        self.model = model
        self.env = env
        self.n_envs = cfg.n_envs
        self.avail = env.avail_actions
        self.steps = 0
        self.episodes = 0

        if cfg.episodic:
            # episodic mode (reference model.py:72-96): collect whole
            # episodes; cadences count episodes, not steps
            self._chunk_len = cfg.max_steps
            self._chunks_per_episode = 1
            self._ring_capacity = None
            self._stack_emit = False
        else:
            self._chunk_len = min(cfg.behaviour_update_freq, cfg.max_steps)
            self._chunks_per_episode = max(cfg.max_steps // self._chunk_len, 1)
            self._ring_capacity = max(
                cfg.batch_size, -(-int(cfg.replay_buffer_size) // cfg.n_envs))
            # rollout store strategy: when a chunk fully refills the ring
            # (chunk_len >= capacity, the usual vectorized regime), emit
            # transitions as scan outputs and write the ring ONCE post-scan
            # (rb.add_many keeps only the surviving `capacity`-row tail).
            # Carrying the ring through the scan instead costs ~8 ms of
            # whole-ring layout-conversion copies at the loop boundary (r5
            # xplane trace) regardless of write volume.  When capacity >
            # chunk_len (few lanes, big off-policy buffer) the in-scan ring
            # write remains: a (chunk, lanes, ...) stack would duplicate
            # HBM the ring already owns.
            self._stack_emit = self._chunk_len >= self._ring_capacity

        self._jit_chunk = jax.jit(self._train_chunk, donate_argnums=(0,))
        self._jit_eval = jax.jit(self._eval_rollout)
        self._jit_soft_update = jax.jit(self._soft_update)
        self._jit_episodic_update = jax.jit(self._episodic_update)
        # fuse ALL of an episode's chunks (incl. the in-between target
        # updates) into one jitted call: per-dispatch host latency is the
        # dominant cost of a 512-lane training episode on a tunneled TPU
        # (4 chunk dispatches -> 1).  ShardedPGTrainer re-jits both
        # programs with explicit in/out shardings in its setup().
        self._fuse_episode = not cfg.episodic
        self._jit_episode = jax.jit(self._train_episode, donate_argnums=(0,))

    # ------------------------------------------------------------------ init
    def init_carry(self, key) -> TrainerCarry:
        cfg = self.cfg
        k_algo, k_env, k_rng = jax.random.split(key, 3)
        algo = self.model.init_state(k_algo)
        env_keys = jax.random.split(k_env, self.n_envs)
        env_state, obs, _ = jax.vmap(self.env.reset)(env_keys)
        last_hid = self.model.init_hidden(self.n_envs, obs.dtype)

        example = self._example_transition(obs)
        if cfg.episodic:
            # replay_buffer_size counts EPISODES (reference default.yaml:21)
            # and every rollout contributes n_envs of them (one per lane), so
            # the pool holds ceil(size/n_envs) slots of n_envs episodes each.
            # At n_envs >= replay_buffer_size that is 1 slot = n_envs
            # episodes — a pool at least as large as the reference asked for
            # (sample_episodes draws uniform (slot, lane) pairs), never less;
            # the drift vs the single-env reference is only that eviction
            # granularity becomes whole rollouts.
            capacity = max(1, -(-int(cfg.replay_buffer_size) // self.n_envs))
            replay = rb.init_episode_replay(capacity, example, cfg.max_steps)
        else:
            # the reference's replay_buffer_size counts TOTAL transitions of
            # one env (replay_buffer.py:6); with n_envs lanes the
            # time-capacity is size/n_envs, floored at batch_size so window
            # sampling stays valid
            replay = rb.init_replay(self._ring_capacity, example)
        return TrainerCarry(
            env_state=env_state, obs=obs, last_hid=last_hid, algo=algo,
            replay=replay, rng=k_rng, steps=jnp.asarray(0, jnp.int32))

    def _example_transition(self, obs):
        n, a, h = self.model.n, self.model.act_dim, self.model.hid_dim
        h_next = h if self.model.stores_next_hidden else 0
        z = lambda *shape: jnp.zeros((self.n_envs,) + shape, obs.dtype)
        # bulk fields (obs pair + GRU states dominate the ring's footprint)
        # optionally stored bf16; scalars/actions/log-probs stay at compute
        # precision (the PPO ratio exp(lp - lp_old) is sensitive to log-prob
        # rounding, and they are a rounding-error share of the memory)
        bdt = jnp.bfloat16 if self.cfg.replay_bf16 else obs.dtype
        zb = lambda *shape: jnp.zeros((self.n_envs,) + shape, bdt)
        return Transition(
            state=zb(*obs.shape[1:]), action=z(n, a), log_prob_a=z(n, a),
            value=z(n), next_value=z(n), reward=z(n),
            next_state=zb(*obs.shape[1:]), done=z(), last_step=z(),
            last_hid=zb(n, h), hid=zb(n, h_next))

    def _upcast_batch(self, batch):
        """Upcast bf16-stored replay fields to the compute dtype at sample
        time (no-op unless cfg.replay_bf16)."""
        if not self.cfg.replay_bf16:
            return batch
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if x.dtype == jnp.bfloat16 else x, batch)

    # --------------------------------------------------------------- rollout
    def _rollout_value(self, algo, obs, act):
        """Scalar per-agent value for transition storage (PPO's old_values)."""
        v = self.model.value(algo.value_params, obs, act)
        if isinstance(v, tuple):
            v = v[0]
        if v.ndim == 3:
            v = jnp.mean(v, axis=1)  # e.g. SQDDPG (b, s, n)
        return v

    def _rollout_values_all(self, algo, states):
        """Rollout values for a whole (T, L, n, o) chunk in ONE critic
        forward.  Values don't feed actions, so nothing forces them into the
        sequential scan: evaluating them post-scan turns T small forwards
        into one (T*L)-batch forward (far better MXU utilization, T x fewer
        dispatches).  Params are constant across the chunk (updates happen
        after the rollout), so the result is numerically equivalent to the
        per-step one (XLA may fuse/reduce differently at the other batch
        shape, so not necessarily bitwise).

        Only valid for critics that ignore ``act`` (the PPO family that sets
        stores_rollout_value); an action-conditioned critic would need the
        rollout actions threaded through here."""
        assert not self.model.rollout_value_needs_act, (
            f"{type(self.model).__name__} stores rollout values but its "
            "critic is action-conditioned; _rollout_values_all only supports "
            "act=None critics")
        t, l = states.shape[0], states.shape[1]
        flat = states.reshape((t * l,) + states.shape[2:])
        v = self._rollout_value(algo, flat, None)
        return v.reshape(t, l, -1)

    def _rollout_step(self, carry: TrainerCarry, _):
        """One vectorized rollout step.

        Transition storage has two strategies (picked in __init__):
        ``_stack_emit`` (chunk_len >= capacity) emits the transition as a
        scan output and writes the ring once post-scan — carrying the ring
        through the scan costs ~8 ms of whole-ring layout-conversion
        copies at the loop boundary (r5 xplane trace); with replay_bf16
        the emitted bulk fields are bf16, so the stack is half-size.
        Otherwise (capacity > chunk_len: few lanes, big off-policy buffer)
        the transition is written STRAIGHT INTO THE RING inside the scan —
        a full (chunk_len, n_envs, ...) stack would duplicate HBM the ring
        already owns (the round-3 32k-lane OOM).  Rollout-time critic
        values (PPO's old_values) are filled post-scan on the ring's
        surviving rows only — the reference's rollout recomputes the
        next-state action and value every step just to throw them away
        (model.py:211-222).  Episodic mode always emits whole trajectories
        (it stores full episodes, model.py:72-96)."""
        model = self.model
        rng, k_act, k_env = jax.random.split(carry.rng, 3)

        _, action_pol, log_prob, _, hid = model.get_actions(
            carry.algo.policy_params, carry.obs, carry.last_hid, k_act,
            status="train", exploration=True, avail=self.avail)
        # rollout values (PPO's old_values) are filled in post-scan by one
        # whole-chunk critic forward (_rollout_values_all); other losses
        # recompute values from the batch, so the scan stores zeros either way
        value = jnp.zeros((self.n_envs, model.n), carry.obs.dtype)

        env_actions = jax.vmap(self.env.translate_actions)(action_pol)
        env_keys = jax.random.split(k_env, self.n_envs)
        out = self.env.batched_auto_reset_step(
            carry.env_state, env_actions, env_keys)

        reward_rep = jnp.broadcast_to(
            out.reward[:, None], (self.n_envs, model.n))
        done = out.terminated.astype(carry.obs.dtype)
        trans = Transition(
            state=carry.obs,
            action=jax.lax.stop_gradient(action_pol),
            log_prob_a=jax.lax.stop_gradient(log_prob),
            value=jax.lax.stop_gradient(value),
            next_value=jnp.zeros_like(value),
            reward=reward_rep,
            next_state=out.obs,
            done=done,
            last_step=done,
            last_hid=carry.last_hid,
            hid=hid if model.stores_next_hidden else hid[..., :0])

        # terminated lanes restart their GRU state (reference model.py:207)
        next_hid = jnp.where(out.terminated[:, None, None], 0.0, hid)

        step_stats = {"mean_train_reward": jnp.mean(out.reward)}
        for k, v in out.info.items():
            step_stats["mean_train_" + k] = jnp.mean(v)

        new_carry = carry.replace(
            env_state=out.state, obs=out.obs, last_hid=next_hid,
            rng=rng, steps=carry.steps + 1)
        if self.cfg.episodic or self._stack_emit:
            if self.cfg.replay_bf16:
                # downcast the bulk fields at emit time so the stacked
                # (chunk, lanes, ...) trajectory is half-size in HBM
                b = jnp.bfloat16
                trans = trans.replace(
                    state=trans.state.astype(b),
                    next_state=trans.next_state.astype(b),
                    last_hid=trans.last_hid.astype(b),
                    hid=trans.hid.astype(b))
            return new_carry, (trans, step_stats)
        new_carry = new_carry.replace(replay=rb.add(new_carry.replay, trans))
        return new_carry, step_stats

    # --------------------------------------------------------------- updates
    def _policy_loss_fn(self, policy_params, algo, batch, key):
        st = algo.replace(policy_params=policy_params)
        pl, _, (means, log_stds) = self.model.get_loss(
            st, batch, self.avail, key)
        ent = normal_entropy(means, log_stds)
        if self.cfg.entr > 0:
            pl = pl - self.cfg.entr * ent
        return pl, (pl, ent)

    def _value_loss_fn(self, value_params, algo, batch, key):
        st = algo.replace(value_params=value_params)
        _, vl, _ = self.model.get_loss(st, batch, self.avail, key)
        return vl, vl

    def _mixer_loss_fn(self, mixer_params, algo, batch, key):
        st = algo.replace(mixer_params=mixer_params)
        _, vl, _ = self.model.get_loss(st, batch, self.avail, key)
        return vl, vl

    def _update_epochs(self, algo, replay, key, *, which, epochs):
        """Scan `epochs` optimizer steps, each on a fresh sampled window
        (reference trainer.py:58-71).  When the ring's time-capacity equals
        batch_size (the usual vectorized regime: replay_buffer_size counts
        single-env transitions, so capacity = size/n_envs ~ batch_size) the
        "fresh" window is deterministically the whole buffer — sample it once
        outside the scan instead of re-gathering ~GBs per epoch."""
        cfg = self.cfg
        model = self.model
        if epochs <= 0:
            # a zero-epoch phase is a no-op, not a zero-length scan (whose
            # unroll clamp would otherwise evaluate to 0 and trace-error)
            return algo, {}
        capacity = jax.tree_util.tree_leaves(replay.data)[0].shape[0]
        lanes = cfg.update_lanes
        subsampling = lanes is not None and lanes < self.n_envs
        # a capacity==batch_size window is deterministically the whole
        # (un-rotated) buffer, so its roll is identical every epoch: hoist
        # it out of the scan when the epochs consume ALL lanes.  With lane
        # subsampling, sample_window instead gathers the per-epoch lane
        # subset straight from the raw ring and rolls only those lanes
        # (bitwise the same draws; the hoisted whole-ring roll forced
        # ~8 ms of full-(capacity, n_envs) relayout copies per update
        # phase in the r4 xplane trace while epochs read lanes/n_envs of
        # the data)
        fixed_window = None
        if (capacity == cfg.batch_size and not cfg.episodic
                and not subsampling):
            fixed_window = rb.sample_window(replay, key, cfg.batch_size)

        def epoch(carry, k):
            algo = carry
            k_samp, k_loss = jax.random.split(k)
            if cfg.episodic:
                # batch_size counts whole episodes (reference default.yaml:21)
                batch = rb.sample_episodes(replay, k_samp, cfg.batch_size)
            elif fixed_window is not None:
                # same RNG stream as sample_window(replay, k_samp, ...):
                # bitwise-identical lane draws, minus the redundant roll
                batch = rb.subsample_lanes(fixed_window, k_samp, lanes)
            else:
                batch = rb.sample_window(replay, k_samp, cfg.batch_size,
                                         lanes=lanes)
            batch = self._upcast_batch(batch)
            if which == "value":
                grads, vl = jax.grad(self._value_loss_fn, has_aux=True)(
                    algo.value_params, algo, batch, k_loss)
                gn = global_norm(grads)
                updates, opt = model.value_tx.update(
                    grads, algo.value_opt, algo.value_params)
                algo = algo.replace(
                    value_params=optax_apply(algo.value_params, updates),
                    value_opt=opt)
                stats = {"mean_train_value_loss": vl,
                         "mean_train_value_grad_norm": gn}
            elif which == "policy":
                grads, (pl, ent) = jax.grad(self._policy_loss_fn, has_aux=True)(
                    algo.policy_params, algo, batch, k_loss)
                gn = global_norm(grads)
                updates, opt = model.policy_tx.update(
                    grads, algo.policy_opt, algo.policy_params)
                algo = algo.replace(
                    policy_params=optax_apply(algo.policy_params, updates),
                    policy_opt=opt)
                stats = {"mean_train_policy_loss": pl,
                         "mean_train_policy_grad_norm": gn,
                         "mean_train_entropy": ent}
            else:
                grads, vl = jax.grad(self._mixer_loss_fn, has_aux=True)(
                    algo.mixer_params, algo, batch, k_loss)
                gn = global_norm(grads)
                updates, opt = model.mixer_tx.update(
                    grads, algo.mixer_opt, algo.mixer_params)
                algo = algo.replace(
                    mixer_params=optax_apply(algo.mixer_params, updates),
                    mixer_opt=opt)
                stats = {"mean_train_mixer_loss": vl,
                         "mean_train_mixer_grad_norm": gn}
            return algo, stats

        keys = jax.random.split(key, epochs)
        algo, stats = jax.lax.scan(
            epoch, algo, keys,
            unroll=min(max(cfg.update_epoch_unroll, 1), epochs))
        return algo, jax.tree_util.tree_map(jnp.mean, stats)

    def _update_phase(self, algo, replay, key):
        cfg = self.cfg
        kv, kp, km = jax.random.split(key, 3)
        algo, v_stats = self._update_epochs(
            algo, replay, kv, which="value", epochs=cfg.value_update_epochs)
        algo, p_stats = self._update_epochs(
            algo, replay, kp, which="policy", epochs=cfg.policy_update_epochs)
        stats = {**v_stats, **p_stats}
        if self.model.uses_mixer and cfg.mixer_update_epochs:
            algo, m_stats = self._update_epochs(
                algo, replay, km, which="mixer", epochs=cfg.mixer_update_epochs)
            stats.update(m_stats)
        return algo, stats

    def _episodic_update(self, carry: TrainerCarry, key):
        """Update phase on whole-episode batches (reference episode_update,
        model.py:72-96), invoked every behaviour_update_freq EPISODES."""
        algo, stats = self._update_phase(carry.algo, carry.replay, key)
        replay = carry.replay
        if self.model.on_policy:
            replay = rb.clear(replay)
        return carry.replace(algo=algo, replay=replay), stats

    def _soft_update(self, algo: AlgoState) -> AlgoState:
        tau = self.cfg.target_lr
        return algo.replace(
            target_policy_params=soft_update(
                algo.target_policy_params, algo.policy_params, tau),
            target_value_params=soft_update(
                algo.target_value_params, algo.value_params, tau),
            target_mixer_params=soft_update(
                algo.target_mixer_params, algo.mixer_params, tau))

    # ----------------------------------------------------------- train chunk
    def _fill_ring_values(self, carry: TrainerCarry) -> TrainerCarry:
        """Fill value[t] = V(state[t]) and next_value[t] = value[t+1] on the
        ring's rows with ONE whole-ring critic forward (+ one forward on the
        current obs for the newest row's bootstrap).  Ring row i's temporal
        successor is (i+1) % capacity except the newest row, whose successor
        is the live obs.  On done steps GAE masks next_value out, and the
        bootstrap at an auto-reset boundary values the fresh obs — both
        correct.

        Values are recomputed at chunk end rather than stored per step;
        for the on-policy algorithms that consume them (PPO family) this is
        exactly the rollout-time value: parameters only change in updates,
        and every update is followed by an on-policy buffer clear, so no
        sampled row can predate the last parameter change."""
        replay = carry.replay
        data = replay.data
        values = self._rollout_values_all(
            carry.algo, self._upcast_batch(data.state))
        v_last = self._rollout_value(carry.algo, carry.obs, None)
        cap = values.shape[0]
        next_values = jnp.roll(values, -1, axis=0)
        newest = (replay.ptr - 1) % cap
        next_values = next_values.at[newest].set(v_last)
        data = data.replace(
            value=jax.lax.stop_gradient(values).astype(data.value.dtype),
            next_value=jax.lax.stop_gradient(next_values).astype(
                data.next_value.dtype))
        return carry.replace(replay=replay.replace(data=data))

    def _train_chunk(self, carry: TrainerCarry):
        cfg = self.cfg
        if cfg.episodic or self._stack_emit:
            carry, (trans, roll_stats) = jax.lax.scan(
                self._rollout_step, carry, None, length=self._chunk_len,
                unroll=min(max(cfg.rollout_unroll, 1), self._chunk_len))
        else:
            carry, roll_stats = jax.lax.scan(
                self._rollout_step, carry, None, length=self._chunk_len,
                unroll=min(max(cfg.rollout_unroll, 1), self._chunk_len))
        roll_stats = jax.tree_util.tree_map(jnp.mean, roll_stats)

        if cfg.episodic:
            if self.model.stores_rollout_value:
                values = self._rollout_values_all(
                    carry.algo, self._upcast_batch(trans.state))
                v_last = self._rollout_value(carry.algo, carry.obs, None)
                next_values = jnp.concatenate(
                    [values[1:], v_last[None]], axis=0)
                trans = trans.replace(
                    value=jax.lax.stop_gradient(values),
                    next_value=jax.lax.stop_gradient(next_values))
            # store the whole episode; updates run on the episode cadence
            # from run_episode (reference model.py:72-96)
            carry = carry.replace(replay=rb.add_episode(carry.replay, trans))
            return carry, roll_stats

        if self._stack_emit:
            # one post-scan ring write; only the `capacity`-row tail of the
            # stacked trajectory materializes (rb.add_many)
            carry = carry.replace(replay=rb.add_many(carry.replay, trans))
        # ring written (in-scan or just above)
        if self.model.stores_rollout_value:
            carry = self._fill_ring_values(carry)

        rng, k_upd = jax.random.split(carry.rng)
        carry = carry.replace(rng=rng)

        ready = jnp.logical_and(
            carry.replay.size >= cfg.batch_size,
            carry.steps > cfg.replay_warmup)

        # zero-stats skeleton for the warmup branch (eval_shape: no compute)
        stats_shape = jax.eval_shape(
            lambda a, r: self._update_phase(a, r, k_upd)[1],
            carry.algo, carry.replay)

        def do_update(args):
            algo, replay = args
            return self._update_phase(algo, replay, k_upd)

        def no_update(args):
            algo, _ = args
            zeros = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), stats_shape)
            return algo, zeros

        algo, upd_stats = jax.lax.cond(
            ready, do_update, no_update, (carry.algo, carry.replay))

        replay = carry.replay
        if self.model.on_policy:
            # clear after update (reference model.py:55-56), only if updated
            replay = replay.replace(
                ptr=jnp.where(ready, 0, replay.ptr).astype(jnp.int32),
                size=jnp.where(ready, 0, replay.size).astype(jnp.int32))

        carry = carry.replace(algo=algo, replay=replay)
        return carry, {**roll_stats, **upd_stats}

    def _train_episode(self, carry: TrainerCarry):
        """One full training episode = `_chunks_per_episode` train chunks +
        boundary-crossing target updates, as a single XLA program.

        Semantics identical to the python per-chunk loop in
        :meth:`run_episode`: after each chunk, the soft target update fires
        iff the chunk crossed a target_update_freq boundary (the same
        steps//freq comparison, evaluated in-graph on the carried step
        counter)."""
        cfg = self.cfg

        def chunk_step(carry, _):
            prev_steps = carry.steps
            carry, stats = self._train_chunk(carry)
            if cfg.target:
                crossed = (carry.steps // cfg.target_update_freq
                           > prev_steps // cfg.target_update_freq)
                algo = jax.lax.cond(
                    crossed, self._soft_update, lambda a: a, carry.algo)
                carry = carry.replace(algo=algo)
            return carry, stats

        carry, stats = jax.lax.scan(
            chunk_step, carry, None, length=self._chunks_per_episode)
        return carry, jax.tree_util.tree_map(jnp.mean, stats)

    # ------------------------------------------------------------- eval loop
    def _eval_rollout(self, algo: AlgoState, key):
        """num_eval_episodes greedy episodes, vectorized
        (reference model.py:265-302).

        Aggregation parity: the reference sums reward/info over each
        episode's alive steps (terminal step included), divides by that
        episode's own length (model.py:293-294 `/ float(t+1)`), THEN
        averages the per-episode means over episodes (model.py:299-301).
        With early destroys the two orders differ — a flat mean over all
        alive samples would over-weight long-surviving episodes — so we
        keep per-lane sums/counts and average per-episode means."""
        cfg = self.cfg
        n_eval = cfg.num_eval_episodes
        k_env, k_roll = jax.random.split(key)
        env_keys = jax.random.split(k_env, n_eval)
        env_state, obs, _ = jax.vmap(self.env.reset)(env_keys)
        last_hid = self.model.init_hidden(n_eval, obs.dtype)

        def step(carry, k):
            env_state, obs, hid, alive = carry
            k_act, k_env = jax.random.split(k)
            _, action_pol, _, _, hid2 = self.model.get_actions(
                algo.policy_params, obs, hid, k_act,
                status="test", exploration=False, avail=self.avail)
            env_actions = jax.vmap(self.env.translate_actions)(action_pol)
            env_keys = jax.random.split(k_env, n_eval)
            out = jax.vmap(self.env.step)(env_state, env_actions, env_keys)
            stats = {"mean_test_reward": out.reward}
            for kk, v in out.info.items():
                stats["mean_test_" + kk] = v
            # per-lane masked samples (shape (n_eval,)); lanes past their
            # terminal step contribute nothing, like the reference's break
            stats = {k2: v * alive for k2, v in stats.items()}
            n_alive = alive
            alive = alive * (1.0 - out.terminated.astype(alive.dtype))
            return (out.state, out.obs, hid2, alive), (stats, n_alive)

        keys = jax.random.split(k_roll, cfg.max_steps)
        alive0 = jnp.ones(n_eval, obs.dtype)
        _, (stats, n_alive) = jax.lax.scan(
            step, (env_state, obs, last_hid, alive0), keys)
        # (T, n_eval) -> per-episode mean over that episode's own steps,
        # then mean over episodes (reference's mean-of-means)
        ep_len = jnp.maximum(jnp.sum(n_alive, axis=0), 1.0)
        return {k: jnp.mean(jnp.sum(v, axis=0) / ep_len)
                for k, v in stats.items()}

    # -------------------------------------------------------------- user API
    def run_episode(self) -> Dict[str, float]:
        """One training 'episode' = max_steps vectorized env steps with the
        reference's update cadence; returns the stat dict.

        Transition mode: updates fire inside the jitted chunk every
        behaviour_update_freq STEPS and target updates every
        target_update_freq steps.  Episodic mode: both cadences count
        EPISODES (reference model.py:39-96)."""
        cfg = self.cfg
        stats_acc = []
        if self._fuse_episode:
            self.carry, stats = self._jit_episode(self.carry)
            self.steps += self._chunk_len * self._chunks_per_episode
            stats_acc.append(stats)
        else:
            for _ in range(self._chunks_per_episode):
                self.carry, stats = self._jit_chunk(self.carry)
                prev_steps = self.steps
                self.steps += self._chunk_len
                # fire on every target_update_freq boundary the chunk
                # crossed — exact divisibility would silently never update
                # when the chunk length doesn't divide the freq
                # (e.g. freq=100, chunk=60)
                if not cfg.episodic and cfg.target and (
                        self.steps // cfg.target_update_freq
                        > prev_steps // cfg.target_update_freq):
                    self.carry = self.carry.replace(
                        algo=self._jit_soft_update(self.carry.algo))
                stats_acc.append(stats)
        self.episodes += 1
        if cfg.episodic:
            if self.episodes % cfg.behaviour_update_freq == 0:
                rng, k_upd = jax.random.split(self.carry.rng)
                self.carry = self.carry.replace(rng=rng)
                self.carry, upd_stats = self._jit_episodic_update(
                    self.carry, k_upd)
                stats_acc.append(upd_stats)
            if cfg.target and self.episodes % cfg.target_update_freq == 0:
                self.carry = self.carry.replace(
                    algo=self._jit_soft_update(self.carry.algo))
        out = {}
        all_keys = {k for s in stats_acc for k in s}
        for k in all_keys:
            out[k] = float(np.mean(
                [float(s[k]) for s in stats_acc if k in s]))
        return out

    def evaluate(self) -> Dict[str, float]:
        rng, k_eval = jax.random.split(self.carry.rng)
        self.carry = self.carry.replace(rng=rng)
        stats = self._jit_eval(self.carry.algo, k_eval)
        return {k: float(v) for k, v in stats.items()}

    def setup(self, seed=0):
        self.carry = self.init_carry(jax.random.PRNGKey(seed))
        return self


def optax_apply(params, updates):
    import optax
    return optax.apply_updates(params, updates)
