"""Generate tests/fixtures/golden_trajectory.json — the env-semantics pin.

A fixed-day, no-noise manual_reset replay of the case33 environment (reset_action=False so the
initial operating point is dtype-independent) under
the float64 XLA solver path with seeded deterministic actions: the strongest
available analog of validating against the reference's pickled telemetry
record (reference utilities/tester.py:19-63) in an environment where
pandapower itself cannot be installed.  The committed obs/state/reward/info
sequences lock the full step semantics — action clipping, power flow,
reward/barrier math, obs masking, data advance — so any behavioural drift
in the env shows up as a fixture mismatch, and the f32 production path is
asserted against the same numbers within documented tolerances.

Run on CPU: python scripts/make_golden_trajectory.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mapdn_tpu.envs import EnvConfig, make_env  # noqa: E402

N_STEPS = 48
DAY, HOUR, QUARTER = 1, 10, 0
SEED = 123


def main():
    env = make_env("case33", EnvConfig(episode_limit=240, reset_action=False),
                   days=8, seed=0, dtype=jnp.float64)
    state, obs, gs = env.manual_reset(DAY, HOUR, QUARTER)

    rng = np.random.default_rng(SEED)
    actions = rng.uniform(env.action_low, env.action_high,
                          size=(N_STEPS, env.grid.n_sgen))

    rec = {
        "day": DAY, "hour": HOUR, "quarter": QUARTER, "seed": SEED,
        "n_steps": N_STEPS,
        "actions": actions.tolist(),
        "obs0": np.asarray(obs).tolist(),
        "state0": np.asarray(gs).tolist(),
        "rewards": [], "obs": [], "states": [],
        "info_total_line_loss": [], "info_q_loss": [],
        "info_pct_out": [], "vm": [],
    }

    step = jax.jit(env.step, static_argnames=("add_noise",))
    for t in range(N_STEPS):
        out = step(state, jnp.asarray(actions[t]), jax.random.PRNGKey(0),
                   add_noise=False)
        state = out.state
        assert not bool(out.terminated), f"unexpected termination at {t}"
        rec["rewards"].append(float(out.reward))
        rec["obs"].append(np.asarray(out.obs).tolist())
        rec["states"].append(np.asarray(out.global_state).tolist())
        rec["info_total_line_loss"].append(float(out.info["total_line_loss"]))
        rec["info_q_loss"].append(float(out.info["q_loss"]))
        rec["info_pct_out"].append(
            float(out.info["percentage_of_v_out_of_control"]))
        rec["vm"].append(np.asarray(out.state.vm).tolist())

    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "golden_trajectory.json")
    with open(dest, "w") as f:
        json.dump(rec, f)
    print(f"wrote {dest}: {N_STEPS} steps, "
          f"reward[0]={rec['rewards'][0]:.6f}")


if __name__ == "__main__":
    main()
