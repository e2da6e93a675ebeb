"""PyMARL-compatible object wrapper around the functional env.

Gives users of the reference's ``MultiAgentEnv`` API
(reference environments/multiagentenv.py:1-67 and the usage pattern in
reference code_examples.py:40-66) a drop-in, single-environment interface:

    env = VoltageControlWrapper(case="case33", cfg=EnvConfig(...))
    obs, state = env.reset()
    reward, terminated, info = env.step(actions)

Internally it drives the jitted pure functions and keeps the EnvState; the
heavy path (power flow) still runs on device.  For training at scale use the
functional API + vmap instead (mapdn_tpu.learn.trainer).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mapdn_tpu.envs.voltage_control import EnvConfig, VoltageControlEnv, make_env


class ActionSpace:
    """Mirror of the reference's ActionSpace (voltage_control_env.py:18-21)."""

    def __init__(self, low, high):
        self.low = low
        self.high = high


class VoltageControlWrapper:
    def __init__(self, case="case33", cfg: EnvConfig | None = None, *,
                 seed=0, data_path=None, days=40, dtype=jnp.float32):
        self.cfg = cfg or EnvConfig()
        self.env: VoltageControlEnv = make_env(
            case, self.cfg, data_path=data_path, days=days, seed=seed,
            dtype=dtype)
        self.n_agents = self.env.n_agents
        self.n_actions = self.env.n_actions
        self.episode_limit = self.cfg.episode_limit
        self.action_space = ActionSpace(
            low=self.env.action_low, high=self.env.action_high)
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._obs = None
        self._gs = None

        self._jit_reset = jax.jit(self.env.reset)
        # day/hour/interval are traced (plain arithmetic into a dynamic
        # gather), so replaying many test days reuses ONE compiled program
        self._jit_manual = jax.jit(self.env.manual_reset)
        self._jit_step = jax.jit(self.env.step, static_argnames=("add_noise",))

    def _split(self):
        self._key, k = jax.random.split(self._key)
        return k

    # --- reference API (multiagentenv.py) ----------------------------------
    def reset(self):
        self._state, self._obs, self._gs = self._jit_reset(self._split())
        return self.get_obs(), self.get_state()

    def manual_reset(self, day, hour, interval):
        self._state, self._obs, self._gs = self._jit_manual(day, hour, interval)
        return self.get_obs(), self.get_state()

    def step(self, actions, add_noise=True):
        actions = jnp.asarray(np.asarray(actions, np.float64).reshape(-1),
                              self._obs.dtype)
        out = self._jit_step(self._state, actions, self._split(),
                             add_noise=add_noise)
        self._state, self._obs, self._gs = out.state, out.obs, out.global_state
        info = {k: float(v) for k, v in out.info.items()}
        return float(out.reward), bool(out.terminated), info

    def get_obs(self):
        return [np.asarray(self._obs[i]) for i in range(self.n_agents)]

    def get_obs_agent(self, agent_id):
        return np.asarray(self._obs[agent_id])

    def get_obs_size(self):
        return self.env.obs_size

    def get_state(self):
        return np.asarray(self._gs)

    def get_state_size(self):
        return self.env.state_size

    def get_avail_actions(self):
        # (1, n_agents, n_actions) like reference voltage_control_env.py:345-351
        return np.expand_dims(np.asarray(self.env.avail_actions), axis=0)

    def get_avail_agent_actions(self, agent_id):
        return np.asarray(self.env.avail_actions[agent_id])

    def get_total_actions(self):
        return self.n_actions

    def get_num_of_agents(self):
        return self.n_agents

    def get_action(self):
        """Uniform random action over the env range (voltage_control_env.py:334-338)."""
        k = self._split()
        return np.asarray(jax.random.uniform(
            k, (self.env.grid.n_sgen,),
            minval=self.env.action_low, maxval=self.env.action_high))

    def get_env_info(self):
        return self.env.get_env_info()

    # --- telemetry accessors used by the tester (reference tester.py:34-55) --
    def _get_res_bus_v(self):
        return np.asarray(self._state.vm)

    def _get_res_bus_active(self):
        return np.asarray(self._state.p_bus)

    def _get_res_bus_reactive(self):
        return np.asarray(self._state.q_bus)

    def _get_res_line_loss(self):
        return np.asarray(self._state.pl_mw)

    def _get_sgen_active(self):
        return np.asarray(self._state.pv_p)

    def _get_sgen_reactive(self):
        return np.asarray(self._state.sgen_q)

    def render(self, mode="rgb_array"):
        """RGB frame of the current grid state
        (reference voltage_control_env.py:654-657)."""
        from mapdn_tpu.envs.rendering import render
        return render(self.env, self._state, mode=mode)

    def res_pf_plot(self, path="plot_save/pf_res_plot"):
        """Write PNG + HTML network heatmap
        (reference voltage_control_env.py:659-674)."""
        from mapdn_tpu.envs.rendering import pf_res_plot
        return pf_res_plot(self.env, self._state, path)

    def close(self):
        pass
