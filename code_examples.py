#!/usr/bin/env python
"""Interaction examples (reference code_examples.py:1-66 analog).

1. the drop-in OO interface with random actions (reference's demo), and
2. the TPU-native way: jit + vmap over thousands of environments.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mapdn_tpu.envs import EnvConfig, VoltageControlWrapper, make_env


def oo_example():
    """Reference-style single-env loop (reference code_examples.py:40-66)."""
    env = VoltageControlWrapper("case33", EnvConfig(episode_limit=24), days=8)
    info = env.get_env_info()
    print("env info:", info)

    obs, state = env.reset()
    total = 0.0
    for t in range(info["episode_limit"]):
        actions = env.get_action()           # uniform random in env range
        reward, terminated, step_info = env.step(actions)
        total += reward
        if terminated:
            break
    print(f"random policy return over {t + 1} steps: {total:.3f}")
    print("last-step metrics:",
          {k: round(v, 4) for k, v in list(step_info.items())[:4]})


def vectorized_example(n_envs=512):
    """The TPU-native path: whole rollout jitted and vectorized."""
    env = make_env("case33", EnvConfig(episode_limit=24), days=8)

    @jax.jit
    def rollout(key):
        k_reset, k_run = jax.random.split(key)
        state, obs, _ = jax.vmap(env.reset)(
            jax.random.split(k_reset, n_envs))

        def step(carry, k):
            st = carry
            k_act, k_env = jax.random.split(k)
            a = jax.random.uniform(
                k_act, (n_envs, env.grid.n_sgen),
                minval=env.action_low, maxval=env.action_high)
            out = jax.vmap(env.auto_reset_step)(
                st, a, jax.random.split(k_env, n_envs))
            return out.state, out.reward

        _, rewards = jax.lax.scan(
            step, state, jax.random.split(k_run, 24))
        return rewards

    rewards = rollout(jax.random.PRNGKey(0))
    print(f"{n_envs} envs x 24 steps: mean reward "
          f"{float(jnp.mean(rewards)):.4f}")


if __name__ == "__main__":
    oo_example()
    vectorized_example()
