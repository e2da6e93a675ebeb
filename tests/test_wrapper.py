"""Drop-in MultiAgentEnv wrapper parity with the reference interaction demo
(reference code_examples.py:40-66)."""
import numpy as np
import jax.numpy as jnp

from mapdn_tpu.envs import EnvConfig, VoltageControlWrapper


def test_random_interaction_loop():
    env = VoltageControlWrapper(
        "case33", EnvConfig(episode_limit=6), days=8, dtype=jnp.float64)
    info = env.get_env_info()
    obs, state = env.reset()
    assert len(obs) == info["n_agents"]
    assert obs[0].shape == (info["obs_shape"],)
    assert state.shape == (info["state_shape"],)
    total = 0.0
    for t in range(10):
        actions = env.get_action()
        reward, terminated, step_info = env.step(actions)
        total += reward
        assert set(step_info) >= {
            "percentage_of_v_out_of_control", "totally_controllable_ratio",
            "total_line_loss", "q_loss", "destroy"}
        if terminated:
            break
    assert terminated
    assert np.isfinite(total)
    avail = env.get_avail_actions()
    assert avail.shape == (1, info["n_agents"], info["n_actions"])
