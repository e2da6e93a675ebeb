"""PGTester: evaluation harness producing the reference's telemetry records.

Re-design of reference utilities/tester.py: ``run(day, hour, quarter)``
replays one fixed day (no noise) recording per-step grid telemetry
(pv p/q, bus p/q/v, line loss — reference tester.py:27-55), `batch_run`
aggregates info metrics over random episodes to mean +- 2*std
(reference tester.py:65-99).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


class PGTester:
    def __init__(self, cfg, model, env, algo_state):
        self.cfg = cfg
        self.model = model
        self.env = env
        self.algo = algo_state
        self.avail = env.avail_actions

    def _greedy_actions(self, obs, hid, key):
        _, action_pol, _, _, hid2 = self.model.get_actions(
            self.algo.policy_params, obs[None], hid, key,
            status="test", exploration=False, avail=self.avail)
        return self.env.translate_actions(action_pol[0]), hid2

    def run(self, day, hour, quarter) -> Dict[str, list]:
        """Single-day replay with telemetry record (reference tester.py:19-63)."""
        env = self.env
        state, obs, _ = env.manual_reset(day, hour, quarter)
        hid = self.model.init_hidden(1, obs.dtype)
        record = {k: [] for k in (
            "pv_active", "pv_reactive", "bus_active", "bus_reactive",
            "bus_voltage", "line_loss")}

        def snap(s):
            record["pv_active"].append(np.asarray(s.pv_p))
            record["pv_reactive"].append(np.asarray(s.sgen_q))
            record["bus_active"].append(np.asarray(s.p_bus))
            record["bus_reactive"].append(np.asarray(s.q_bus))
            record["bus_voltage"].append(np.asarray(s.vm))
            record["line_loss"].append(np.asarray(s.pl_mw))

        snap(state)
        key = jax.random.PRNGKey(0)
        step = jax.jit(env.step, static_argnames=("add_noise",))
        for t in range(self.cfg.max_steps):
            key, k_act, k_env = jax.random.split(key, 3)
            actions, hid = self._greedy_actions(obs, hid, k_act)
            out = step(state, actions, k_env, add_noise=False)
            state, obs = out.state, out.obs
            snap(state)
            if bool(out.terminated):
                break
        return record

    def batch_run(self, num_episodes=100) -> Dict[str, tuple]:
        """Aggregate info metrics over random episodes
        (reference tester.py:65-99): {metric: (mean, 2*std)}."""
        env = self.env
        results: Dict[str, list] = {}
        key = jax.random.PRNGKey(1)
        reset = jax.jit(env.reset)
        step = jax.jit(env.step, static_argnames=("add_noise",))
        for _ in range(num_episodes):
            key, k_reset = jax.random.split(key)
            state, obs, _ = reset(k_reset)
            hid = self.model.init_hidden(1, obs.dtype)
            for t in range(self.cfg.max_steps):
                key, k_act, k_env = jax.random.split(key, 3)
                actions, hid = self._greedy_actions(obs, hid, k_act)
                out = step(state, actions, k_env, add_noise=False)
                state, obs = out.state, out.obs
                for k, v in out.info.items():
                    results.setdefault("mean_test_" + k, []).append(float(v))
                if bool(out.terminated):
                    break
        return {k: (float(np.mean(v)), 2.0 * float(np.std(v)))
                for k, v in results.items()}
