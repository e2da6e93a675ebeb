"""Pure-functional vectorized active-voltage-control environment.

The TPU-native redesign of the reference's ``VoltageControl`` class
(reference environments/var_voltage_control/voltage_control_env.py).  The
reference mutates a pandapower net and pandas frames per step on the host;
here the environment is a set of pure functions over an :class:`EnvState`
pytree so the whole rollout runs under ``jit``/``vmap`` on device:

    reset : key                -> (EnvState, obs, global_state)
    step  : (EnvState, a, key) -> StepOutput(EnvState', obs, gs, r, done, info)

Semantics parity (file:line cites into the reference):

* action map  q = a * sqrt(s_max^2 - p^2)     voltage_control_env.py:548-572
* reward      -(mean barrier(v) * w_v + q_weight * mean|q|), or line_weight
              alternative                      voltage_control_env.py:574-623
* divergence  reward -200, grid rollback, terminate, info destroy=1
              — via the solver's converged mask voltage_control_env.py:183-196
* reset       solvability retry with fresh episode windows (bounded)
                                              voltage_control_env.py:107-134
* data noise  truncated gaussian std/100       voltage_control_env.py:491-513
* obs         zone-masked, zero-padded, bus p/q with PV injections added
              back (the intent of voltage_control_env.py:232-316; the
              reference's pandas chained-indexing there was unreliable and
              patched upstream in 2024 — we implement the fixed semantics)
* state       concat of res-bus p/q, sgen p/q, vm [pu], va [deg] gated by
              state_space                      voltage_control_env.py:213-230
* both task modes: distributed (agent = PV) and decentralised (agent = zone
  with per-agent action-availability mask)     voltage_control_env.py:79-84,345-362

Known deliberate deviation: the reference's step advances its data pointer
such that the first episode window row is consumed twice
(voltage_control_env.py:199-202 sets data *before* incrementing ``steps``);
we advance exactly one row per step.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from mapdn_tpu.envs.barriers import get_barrier
from mapdn_tpu.envs.timeseries import TimeSeries


@struct.dataclass
class EnvConfig:
    """Static environment configuration (python values; static under jit).

    Defaults mirror args/env_args/var_voltage_control.yaml in the reference.
    """
    mode: str = struct.field(pytree_node=False, default="distributed")
    voltage_barrier_type: str = struct.field(pytree_node=False, default="l1")
    voltage_weight: float = struct.field(pytree_node=False, default=1.0)
    q_weight: float = struct.field(pytree_node=False, default=0.1)
    line_weight: Any = struct.field(pytree_node=False, default=None)
    v_upper: float = struct.field(pytree_node=False, default=1.05)
    v_lower: float = struct.field(pytree_node=False, default=0.95)
    episode_limit: int = struct.field(pytree_node=False, default=240)
    history: int = struct.field(pytree_node=False, default=1)
    action_scale: float = struct.field(pytree_node=False, default=0.8)
    action_bias: float = struct.field(pytree_node=False, default=0.0)
    reset_action: bool = struct.field(pytree_node=False, default=True)
    state_space: Tuple[str, ...] = struct.field(
        pytree_node=False,
        default=("pv", "demand", "reactive", "vm_pu", "va_degree"))
    destroy_penalty: float = struct.field(pytree_node=False, default=200.0)
    pf_tol: float = struct.field(pytree_node=False, default=1e-7)
    pf_max_iter: int = struct.field(pytree_node=False, default=20)
    reset_retries: int = struct.field(pytree_node=False, default=4)
    # power-flow solver dispatch: 'auto' routes batched solves (>=
    # pf_min_batch vmapped lanes on TPU) to the fused Pallas VMEM kernel
    # (mapdn_tpu.pf.pallas_nr) and everything else to the XLA matrix-free
    # solver; 'xla' / 'pallas' force one path
    pf_backend: str = struct.field(pytree_node=False, default="auto")
    pf_min_batch: int = struct.field(pytree_node=False, default=64)
    # fixed-iteration unrolled Newton on the XLA path (None = while-loop
    # with early exit).  See pf.newton.nr_solve(fixed_iter=...): an XLA
    # While is a scheduling barrier inside the fused rollout, so the
    # straight-line solver pipelines with the policy/obs work around it.
    # 10 matches pandapower's own NR iteration cap; lanes needing more
    # report diverged either way.
    pf_fixed_iter: Any = struct.field(pytree_node=False, default=None)
    # Richardson refinement steps per Newton direction (pf.newton.nr_solve
    # inner_iters): more inner steps -> a more exact Newton step -> fewer
    # outer iterations, at 2 extra matmuls per inner step.  3 is the
    # measured sweet spot at the bench config (r5 sweep, /tmp lab job 07).
    pf_inner_iters: int = struct.field(pytree_node=False, default=3)


@struct.dataclass
class EnvState:
    """Per-environment dynamic state (one lane; batch via vmap)."""
    t: jnp.ndarray          # () int32 absolute data row backing current demand
    step: jnp.ndarray      # () int32 in-episode step counter (starts at 1)
    load_p: jnp.ndarray    # (n_load,) pending demand P [MW] (noise applied)
    load_q: jnp.ndarray    # (n_load,) pending demand Q [Mvar]
    pv_p: jnp.ndarray      # (n_sgen,) pending PV P [MW]
    sgen_q: jnp.ndarray    # (n_sgen,) last applied PV Q [Mvar]
    vm: jnp.ndarray        # (n_bus,) last solved voltage magnitude [pu]
    va: jnp.ndarray        # (n_bus,) last solved voltage angle [rad]
    p_bus: jnp.ndarray     # (n_bus,) last res-bus P [MW], consumption>0
    q_bus: jnp.ndarray     # (n_bus,) last res-bus Q [Mvar]
    pl_mw: jnp.ndarray     # (n_branch,) last per-branch loss [MW]
    solved_pv_p: jnp.ndarray  # (n_sgen,) PV P used in the last solve
    sum_rewards: jnp.ndarray  # () cumulative episode reward
    terminated: jnp.ndarray   # () bool
    obs_hist: jnp.ndarray     # (history-1, n_agents, obs_base) or (0,) if history==1


@struct.dataclass
class StepOutput:
    state: EnvState
    obs: jnp.ndarray          # (n_agents, obs_dim)
    global_state: jnp.ndarray  # (state_dim,)
    reward: jnp.ndarray       # ()
    terminated: jnp.ndarray   # () bool
    info: Dict[str, jnp.ndarray]


def _pad_gather_indices(groups, n_total):
    """Build (n_groups, width) gather indices + mask for ragged zone layouts."""
    width = max(len(g) for g in groups)
    idx = np.zeros((len(groups), width), np.int32)
    mask = np.zeros((len(groups), width), np.float64)
    for i, g in enumerate(groups):
        idx[i, : len(g)] = g
        mask[i, : len(g)] = 1.0
    return idx, mask, width


class VoltageControlEnv:
    """Factory of pure env functions bound to (grid, timeseries, config).

    All instance attributes are static (numpy/python); methods close over
    them, so `jax.jit(env.step)` / `jax.vmap(env.step)` trace cleanly.
    """

    def __init__(self, grid, ts: TimeSeries, cfg: EnvConfig):
        self.grid = grid
        self.ts = ts
        self.cfg = cfg
        self.barrier = get_barrier(cfg.voltage_barrier_type)
        self.dtype = np.dtype(np.asarray(grid.g_mat).dtype)

        # production solver: per-lane callable whose custom-vmap rule routes
        # whole batches to the fused Pallas TPU kernel (pf_backend gates it)
        from mapdn_tpu.pf.pallas_nr import make_auto_solver
        self._solver = make_auto_solver(
            grid, tol=cfg.pf_tol, max_iter=cfg.pf_max_iter,
            backend=cfg.pf_backend, min_batch=cfg.pf_min_batch,
            fixed_iter=cfg.pf_fixed_iter, inner_iters=cfg.pf_inner_iters)

        # line-vs-trafo branch mask for the reward's line-loss term
        # (reference reads res_line only, voltage_control_env.py:599-600)
        line_mask = np.asarray(grid.is_line, np.float64)
        self._line_mask = jnp.asarray(line_mask, self.dtype)
        self._n_lines = float(max(line_mask.sum(), 1.0))

        bus_zone = np.asarray(grid.bus_zone)
        sgen_zone = np.asarray(grid.sgen_zone)
        n_zone = grid.n_zone

        # agent structure (reference voltage_control_env.py:79-84)
        if cfg.mode == "distributed":
            self.n_agents = grid.n_sgen
            self.n_actions = 1
        elif cfg.mode == "decentralised":
            self.n_agents = n_zone
            self.n_actions = grid.n_sgen
        else:
            raise ValueError(f"unknown mode '{cfg.mode}'")

        # zone bus groups, ascending bus order (reference sort_index semantics,
        # voltage_control_env.py:536,540)
        zone_buses = [np.nonzero(bus_zone == z)[0] for z in range(1, n_zone + 1)]
        if cfg.mode == "distributed":
            groups = [zone_buses[sgen_zone[i] - 1] for i in range(grid.n_sgen)]
        else:
            groups = zone_buses
        self._zb_idx, self._zb_mask, self._zb_width = _pad_gather_indices(
            groups, grid.n_bus)

        # per-zone sgen groups (decentralised obs + avail-actions mask)
        zone_sgens = [np.nonzero(sgen_zone == z)[0] for z in range(1, n_zone + 1)]
        if cfg.mode == "decentralised":
            if any(len(s) == 0 for s in zone_sgens):
                raise ValueError("decentralised mode requires >=1 PV per zone")
            self._zs_idx, self._zs_mask, self._zs_width = _pad_gather_indices(
                zone_sgens, grid.n_sgen)
            avail = np.zeros((self.n_agents, grid.n_sgen), np.float64)
            for z, s in enumerate(zone_sgens):
                avail[z, s] = 1.0
            self.avail_actions = jnp.asarray(avail, self.dtype)
        else:
            self.avail_actions = jnp.ones((self.n_agents, 1), self.dtype)

        # observation layout (widths per state_space component)
        w = self._zb_width
        parts = []
        for comp in cfg.state_space:
            if comp == "demand":
                parts.append(2 * w)
            elif comp == "pv":
                parts.append(1 if cfg.mode == "distributed" else self._zs_width)
            elif comp == "reactive":
                parts.append(1 if cfg.mode == "distributed" else self._zs_width)
            elif comp == "vm_pu":
                parts.append(w)
            elif comp == "va_degree":
                parts.append(w)
        self.obs_base_size = int(sum(parts))
        self.obs_size = self.obs_base_size * cfg.history

        self.state_size = 0
        for comp in cfg.state_space:
            self.state_size += {
                "demand": 2 * grid.n_bus,
                "pv": grid.n_sgen,
                "reactive": grid.n_sgen,
                "vm_pu": grid.n_bus,
                "va_degree": grid.n_bus,
            }[comp]

        # episode-window sampling bounds (reference voltage_control_env.py:381-398)
        self.steps_per_hour = 60 // ts.time_delta
        self.steps_per_day = 24 * self.steps_per_hour
        total_days = ts.n_steps // self.steps_per_day
        episode_days = cfg.episode_limit // self.steps_per_day + 1
        self.max_start_day = max(total_days - episode_days, 1)

        self.action_low = cfg.action_bias - cfg.action_scale
        self.action_high = cfg.action_bias + cfg.action_scale

    # ------------------------------------------------------------------ data
    def _data_at(self, t):
        t = jnp.clip(t, 0, self.ts.n_steps - 1)
        return (self.ts.pv[t], self.ts.load_p[t], self.ts.load_q[t])

    def _noisy_data_at(self, t, key, add_noise):
        """Truncated-gaussian perturbation, std = column-std/100 (reference
        voltage_control_env.py:491-513; noise is always added, onto |N(0,1)|)."""
        pv, lp, lq = self._data_at(t)
        if add_noise:
            k1, k2, k3 = jax.random.split(key, 3)
            pv = pv + self.ts.pv_std * jnp.abs(
                jax.random.normal(k1, pv.shape, pv.dtype))
            lp = lp + self.ts.load_p_std * jnp.abs(
                jax.random.normal(k2, lp.shape, lp.dtype))
            lq = lq + self.ts.load_q_std * jnp.abs(
                jax.random.normal(k3, lq.shape, lq.dtype))
        return pv, lp, lq

    # ------------------------------------------------------------- power flow
    def _injections(self, load_p, load_q, pv_p, sgen_q):
        g = self.grid
        p = (g.sgen_inc @ pv_p - g.load_inc @ load_p) / g.sn_mva
        q = (g.sgen_inc @ sgen_q - g.load_inc @ load_q) / g.sn_mva
        return p, q

    def _solve(self, load_p, load_q, pv_p, sgen_q, vm0=None, va0=None):
        p, q = self._injections(load_p, load_q, pv_p, sgen_q)
        if vm0 is None:  # flat start (pandapower init='auto' for PQ nets)
            vm0 = jnp.ones_like(p).at[..., 0].set(
                self.grid.slack_vm.astype(p.dtype))
        if va0 is None:
            va0 = jnp.zeros_like(p)
        return self._solver(p, q, vm0, va0)

    def clip_reactive_power(self, actions, pv_p):
        """q = a * sqrt(s_max^2 - p^2) (reference voltage_control_env.py:568-572),
        guarded against noise pushing p above s_max."""
        cap = jnp.sqrt(jnp.maximum(self.ts.s_max**2 - pv_p**2, 0.0))
        return cap * actions

    # ------------------------------------------------------------------ reset
    def _sample_start(self, key):
        """day/hour/interval decomposition (voltage_control_env.py:381-398)."""
        kd, kh, ki = jax.random.split(key, 3)
        day = jax.random.randint(kd, (), 0, self.max_start_day)
        hour = jax.random.randint(kh, (), 0, 24)
        interval = jax.random.randint(ki, (), 0, self.steps_per_hour)
        return (interval + hour * self.steps_per_hour
                + day * self.steps_per_day).astype(jnp.int32)

    def _attempt_reset(self, t0, key, add_noise, vm0=None, va0=None):
        kn, ka = jax.random.split(key)
        # the reference consumes window row `history` (steps=1 at reset with
        # history=1 margin semantics, voltage_control_env.py:440-489)
        t = t0 + self.cfg.history
        pv, lp, lq = self._noisy_data_at(t, kn, add_noise)
        if self.cfg.reset_action:
            a0 = jax.random.uniform(
                ka, (self.grid.n_sgen,), pv.dtype,
                self.action_low, self.action_high)
            q0 = self.clip_reactive_power(a0, pv)
        else:
            q0 = jnp.zeros((self.grid.n_sgen,), pv.dtype)
        res = self._solve(lp, lq, pv, q0, vm0=vm0, va0=va0)
        # a failed solve must not leak NaNs into observations: fall back to a
        # flat profile (the caller handles retry via the converged flag)
        ok = res.converged
        fin = lambda x, fb: jnp.where(ok, jnp.where(jnp.isfinite(x), x, fb), fb)
        state = EnvState(
            t=t,
            step=jnp.asarray(1, jnp.int32),
            load_p=lp, load_q=lq, pv_p=pv, sgen_q=q0,
            vm=fin(res.vm, jnp.ones_like(res.vm)),
            va=fin(res.va, jnp.zeros_like(res.va)),
            p_bus=fin(res.p_bus, jnp.zeros_like(res.p_bus)),
            q_bus=fin(res.q_bus, jnp.zeros_like(res.q_bus)),
            pl_mw=fin(res.pl_mw, jnp.zeros_like(res.pl_mw)),
            solved_pv_p=pv,
            sum_rewards=jnp.asarray(0.0, pv.dtype),
            terminated=jnp.asarray(False),
            obs_hist=jnp.zeros(
                (max(self.cfg.history - 1, 0), self.n_agents,
                 self.obs_base_size), pv.dtype),
        )
        return state, res.converged

    def reset(self, key):
        """Random-window reset with bounded solvability retry
        (voltage_control_env.py:96-135 retries unboundedly; we cap at
        cfg.reset_retries and keep the last attempt)."""
        def attempt(carry):
            _, _, key, i = carry
            key, k1, k2 = jax.random.split(key, 3)
            t0 = self._sample_start(k1)
            state, ok = self._attempt_reset(t0, k2, add_noise=True)
            return state, ok, key, i + 1

        def cond(carry):
            _, ok, _, i = carry
            return jnp.logical_and(~ok, i < self.cfg.reset_retries)

        init = attempt((None, None, key, jnp.asarray(0, jnp.int32)))
        state, ok, _, _ = jax.lax.while_loop(cond, attempt, init)
        # retry exhaustion: mark the lane terminated so nothing trains on the
        # flat-profile fallback — step() propagates the flag and the
        # auto-reset path re-resets the lane on its next step
        state = state.replace(terminated=~ok)
        obs, state = self._obs_and_push_hist(state)
        return state, obs, self.get_state(state)

    def manual_reset(self, day, hour, interval):
        """Deterministic start, no noise (voltage_control_env.py:137-176)."""
        t0 = jnp.asarray(
            interval + hour * self.steps_per_hour + day * self.steps_per_day,
            jnp.int32)
        state, _ = self._attempt_reset(
            t0, jax.random.PRNGKey(0), add_noise=False)
        obs, state = self._obs_and_push_hist(state)
        return state, obs, self.get_state(state)

    # ------------------------------------------------------------------- step
    def translate_actions(self, agent_actions):
        """Map per-agent network outputs in [-1,1] to per-sgen actions in
        [low, high] (utilities/util.py:123-132 in the reference), handling the
        decentralised mode's zone->sgen routing via the availability mask."""
        a = jnp.clip(agent_actions, -1.0, 1.0)
        a = 0.5 * (a + 1.0) * (self.action_high - self.action_low) + self.action_low
        if self.cfg.mode == "distributed":
            return a[..., :, 0] if a.ndim >= 2 else a
        # decentralised: each agent emits n_sgen entries; take its zone's
        return jnp.sum(a * self.avail_actions, axis=-2)

    def step(self, state: EnvState, sgen_actions, key, add_noise=True):
        """One transition. ``sgen_actions``: (n_sgen,) values in [low, high]."""
        cfg = self.cfg
        # cast to the env dtype: an x64-context caller handing f64 actions
        # must not promote the solver's packed while-loop carries
        sgen_actions = jnp.asarray(sgen_actions, state.pv_p.dtype)
        q_cmd = self.clip_reactive_power(sgen_actions, state.pv_p)
        # warm start from the previous solved operating point: consecutive
        # 3-min rows differ little, halving Newton iterations vs flat start
        # (the solution within tol is the same fixed point either way)
        res = self._solve(state.load_p, state.load_q, state.pv_p, q_cmd,
                          vm0=state.vm, va0=state.va)
        ok = res.converged

        # masked rollback on divergence (voltage_control_env.py:183-196)
        sel = lambda a, b: jnp.where(ok, a, b)
        vm = sel(res.vm, state.vm)
        va = sel(res.va, state.va)
        p_bus = sel(res.p_bus, state.p_bus)
        q_bus = sel(res.q_bus, state.q_bus)
        pl = sel(res.pl_mw, state.pl_mw)
        sgen_q = sel(q_cmd, state.sgen_q)
        solved_pv = sel(state.pv_p, state.solved_pv_p)

        reward, info = self._calc_reward(vm, pl, sgen_q)
        attempted_q_loss = jnp.mean(jnp.abs(q_cmd))
        reward = jnp.where(ok, reward, reward - cfg.destroy_penalty)
        info = dict(info)
        info["destroy"] = jnp.where(ok, 0.0, 1.0).astype(vm.dtype)
        info["totally_controllable_ratio"] = jnp.where(
            ok, info["totally_controllable_ratio"], 0.0)
        info["q_loss"] = jnp.where(ok, info["q_loss"], attempted_q_loss)

        # advance the data window for the next step
        t_next = state.t + 1
        pv, lp, lq = self._noisy_data_at(t_next, key, add_noise)

        step = state.step + 1
        # an incoming terminated flag (failed reset attempt / already-dead
        # lane) propagates so the auto-reset path re-resets it next step
        terminated = jnp.logical_or(
            state.terminated,
            jnp.logical_or(step >= cfg.episode_limit, ~ok))

        new_state = state.replace(
            t=t_next, step=step, load_p=lp, load_q=lq, pv_p=pv,
            sgen_q=sgen_q, vm=vm, va=va, p_bus=p_bus, q_bus=q_bus,
            pl_mw=pl, solved_pv_p=solved_pv,
            sum_rewards=state.sum_rewards + reward,
            terminated=terminated,
        )
        obs, new_state = self._obs_and_push_hist(new_state)
        return StepOutput(
            state=new_state, obs=obs, global_state=self.get_state(new_state),
            reward=reward, terminated=terminated, info=info)

    # ------------------------------------------------------------ reward/info
    def _calc_reward(self, vm, pl_mw, sgen_q):
        """Barrier + q/line loss and the engineering info metrics
        (voltage_control_env.py:574-623)."""
        cfg = self.cfg
        v = vm
        n = v.shape[-1]
        below = jnp.sum(v < cfg.v_lower, axis=-1).astype(v.dtype)
        above = jnp.sum(v > cfg.v_upper, axis=-1).astype(v.dtype)
        pct_out = (below + above) / n
        v_ref = 0.5 * (cfg.v_lower + cfg.v_upper)

        # the reference's line-loss terms read res_line only — trafo-branch
        # losses are excluded (voltage_control_env.py:599-600); no-op for the
        # built-in pure-line feeders, load-bearing for converted grids
        line_loss = jnp.sum(pl_mw * self._line_mask, axis=-1)
        avg_line_loss = line_loss / self._n_lines
        q_loss = jnp.mean(jnp.abs(sgen_q), axis=-1)

        v_loss = jnp.mean(self.barrier(v), axis=-1) * cfg.voltage_weight
        if cfg.line_weight is not None:
            loss = avg_line_loss * cfg.line_weight + v_loss
        elif cfg.q_weight is not None:
            loss = q_loss * cfg.q_weight + v_loss
        else:
            raise ValueError("need q_weight or line_weight")

        info = {
            "percentage_of_v_out_of_control": pct_out,
            "percentage_of_lower_than_lower_v": below / n,
            "percentage_of_higher_than_upper_v": above / n,
            "totally_controllable_ratio": (pct_out <= 1e-3).astype(v.dtype),
            "average_voltage_deviation": jnp.mean(jnp.abs(v - v_ref), axis=-1),
            "average_voltage": jnp.mean(v, axis=-1),
            "max_voltage_drop_deviation": jnp.max(
                jnp.where(v < cfg.v_lower, cfg.v_lower - v, 0.0), axis=-1),
            "max_voltage_rise_deviation": jnp.max(
                jnp.where(v > cfg.v_upper, v - cfg.v_upper, 0.0), axis=-1),
            "total_line_loss": line_loss,
            "q_loss": q_loss,
            "destroy": jnp.zeros_like(q_loss),
        }
        return -loss, info

    # ------------------------------------------------------- obs/global state
    def _base_obs(self, state: EnvState):
        """(n_agents, obs_base_size) zone-masked observation.

        Bus p/q include the PV injections added back (so the demand block
        reports pure load), per the reference's patched intent
        (voltage_control_env.py:232-316); va in radians (:266)."""
        g = self.grid
        pv_back = g.sgen_inc @ state.pv_p
        q_back = g.sgen_inc @ state.sgen_q
        p_obs = state.p_bus + pv_back
        q_obs = state.q_bus + q_back

        idx, mask = self._zb_idx, jnp.asarray(self._zb_mask, state.vm.dtype)
        take = lambda arr: arr[idx] * mask  # (n_agents, width)

        parts = []
        for comp in self.cfg.state_space:
            if comp == "demand":
                parts.append(take(p_obs))
                parts.append(take(q_obs))
            elif comp == "pv":
                if self.cfg.mode == "distributed":
                    parts.append(state.pv_p[:, None])
                else:
                    zmask = jnp.asarray(self._zs_mask, state.vm.dtype)
                    parts.append(state.pv_p[self._zs_idx] * zmask)
            elif comp == "reactive":
                if self.cfg.mode == "distributed":
                    parts.append(state.sgen_q[:, None])
                else:
                    zmask = jnp.asarray(self._zs_mask, state.vm.dtype)
                    parts.append(state.sgen_q[self._zs_idx] * zmask)
            elif comp == "vm_pu":
                parts.append(take(state.vm))
            elif comp == "va_degree":
                # stored in radians; reference converts deg->rad for obs (:266)
                parts.append(take(state.va))
        return jnp.concatenate(parts, axis=-1)

    def _obs_and_push_hist(self, state: EnvState):
        base = self._base_obs(state)
        if self.cfg.history <= 1:
            return base, state
        frames = jnp.concatenate([state.obs_hist, base[None]], axis=0)
        obs = jnp.moveaxis(frames, 0, 1).reshape(self.n_agents, -1)
        return obs, state.replace(obs_hist=frames[1:])

    def get_state(self, state: EnvState):
        """Global state vector (voltage_control_env.py:213-230; va in degrees)."""
        parts = []
        for comp in self.cfg.state_space:
            if comp == "demand":
                parts.append(state.p_bus)
                parts.append(state.q_bus)
            elif comp == "pv":
                parts.append(state.pv_p)
            elif comp == "reactive":
                parts.append(state.sgen_q)
            elif comp == "vm_pu":
                parts.append(state.vm)
            elif comp == "va_degree":
                parts.append(state.va * (180.0 / jnp.pi))
        return jnp.concatenate(parts, axis=-1)

    # ------------------------------------------------------------- auto-reset
    def auto_reset_step(self, state, sgen_actions, key, add_noise=True):
        """step() that transparently re-resets terminated lanes — the
        vectorized-training analog of the reference's per-episode reset loop
        (models/model.py:204).  The returned obs/global_state on a reset
        boundary come from the fresh episode.

        Branchless by design: under vmap a lane-level lax.cond lowers to
        executing both branches anyway (and the nested retry while_loop
        provokes a full-timeseries broadcast in XLA), so a single
        warm-started reset attempt is computed unconditionally and selected
        per lane.  A failed reset solve (rare: windows are drawn from
        historically solvable data) leaves the fresh lane terminated so it
        simply re-resets on the next step — a bounded retry spread over
        steps instead of the reference's unbounded in-place loop
        (voltage_control_env.py:107-134)."""
        k_step, k_reset, k_t = jax.random.split(key, 3)
        out = self.step(state, sgen_actions, k_step, add_noise)

        t0 = self._sample_start(k_t)
        fresh, ok = self._attempt_reset(
            t0, k_reset, add_noise=add_noise, vm0=state.vm, va0=state.va)
        fresh = fresh.replace(terminated=~ok)
        obs_fresh, fresh = self._obs_and_push_hist(fresh)
        gs_fresh = self.get_state(fresh)

        sel = out.terminated

        def pick(a, b):
            mask = sel
            while mask.ndim < a.ndim:
                mask = mask[..., None]
            return jnp.where(mask, a, b)

        new_state = jax.tree_util.tree_map(pick, fresh, out.state)
        return out.replace(
            state=new_state,
            obs=pick(obs_fresh, out.obs),
            global_state=pick(gs_fresh, out.global_state))

    def batched_auto_reset_step(self, states, sgen_actions, keys,
                                add_noise=True):
        """Batch-level auto-resetting step: vmapped :meth:`step`, with the
        reset attempt (a second NR solve + obs build per lane) gated behind a
        batch-wide ``lax.cond`` so it only runs on chunks where some lane
        actually terminated.  Episodes start synchronized and share
        episode_limit, so the reset branch fires ~once per episode_limit
        steps (plus divergence destroys) instead of every step — per-lane
        :meth:`auto_reset_step` (kept for single-lane use) cannot skip it
        because ``lax.cond`` under vmap lowers to a select of both branches."""
        ks = jax.vmap(lambda k: jax.random.split(k, 3))(keys)
        k_step, k_reset, k_t = ks[:, 0], ks[:, 1], ks[:, 2]
        out = jax.vmap(lambda s, a, k: self.step(s, a, k, add_noise))(
            states, sgen_actions, k_step)

        def do_reset(out):
            def fresh_lane(state, kr, kt):
                t0 = self._sample_start(kt)
                fresh, ok = self._attempt_reset(
                    t0, kr, add_noise=add_noise, vm0=state.vm, va0=state.va)
                fresh = fresh.replace(terminated=~ok)
                obs_f, fresh = self._obs_and_push_hist(fresh)
                return fresh, obs_f, self.get_state(fresh)

            fresh, obs_f, gs_f = jax.vmap(fresh_lane)(states, k_reset, k_t)
            sel = out.terminated

            def pick(a, b):
                mask = sel
                while mask.ndim < a.ndim:
                    mask = mask[..., None]
                return jnp.where(mask, a, b)

            new_state = jax.tree_util.tree_map(pick, fresh, out.state)
            return out.replace(
                state=new_state,
                obs=pick(obs_f, out.obs),
                global_state=pick(gs_f, out.global_state))

        return jax.lax.cond(
            jnp.any(out.terminated), do_reset, lambda o: o, out)

    # -------------------------------------------------------------- env info
    def get_env_info(self):
        """PyMARL-style env info (reference multiagentenv.py:62-67)."""
        return {
            "state_shape": self.state_size,
            "obs_shape": self.obs_size,
            "n_actions": self.n_actions,
            "n_agents": self.n_agents,
            "episode_limit": self.cfg.episode_limit,
        }


def make_env(case="case33", cfg: EnvConfig | None = None, *, data_path=None,
             days=40, seed=0, dtype=jnp.float32,
             pv_scale=1.0, demand_scale=1.0):
    """Build (env, grid, ts) for a named case, with real data if available."""
    from mapdn_tpu.grid.cases import make_case
    from mapdn_tpu.envs.timeseries import dataset_for_case

    cfg = cfg or EnvConfig()
    grid, load_p, load_q, pv_max = make_case(case, dtype=dtype)
    ts = dataset_for_case(case, load_p, load_q, pv_max, data_path=data_path,
                          days=days, seed=seed, dtype=dtype,
                          pv_scale=pv_scale, demand_scale=demand_scale)
    return VoltageControlEnv(grid, ts, cfg)
