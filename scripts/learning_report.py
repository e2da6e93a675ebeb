"""Summarize committed learning curves + compute the random-action baseline.

Produces artifacts/learning/summary.json consumed by tests/test_learning.py:
for each trained run (artifacts/learning/<alg>/tensorboard/*/metrics.jsonl)
the eval-curve milestones, plus a uniform-random-policy baseline evaluated on
the identical env build (case33 synthetic dataset, same seed/days as
train.py defaults) — the role the reference's RandomAgent plays
(reference models/random.py:7-18).

Runs on CPU so it never contends with TPU training jobs.
Usage: python scripts/learning_report.py
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "learning")


def random_baseline(n_episodes=256, max_steps=240, seed=7):
    """Uniform-random actions, vectorized episodes; mirrors the env build in
    train.py (--scenario case33_3min_final, synthetic days=40)."""
    from mapdn_tpu.envs import EnvConfig, make_env

    env = make_env("case33", EnvConfig(episode_limit=max_steps), days=40,
                   seed=seed, dtype=jnp.float32)

    def rollout(key):
        k_env, k_roll = jax.random.split(key)
        env_keys = jax.random.split(k_env, n_episodes)
        state, obs, _ = jax.vmap(env.reset)(env_keys)

        def step(carry, k):
            state, alive = carry
            k_act, k_step = jax.random.split(k)
            a = jax.random.uniform(
                k_act, (n_episodes, env.grid.n_sgen), jnp.float32,
                env.action_low, env.action_high)
            keys = jax.random.split(k_step, n_episodes)
            out = jax.vmap(env.step)(state, a, keys)
            stats = {k2: jnp.sum(v * alive) for k2, v in out.info.items()}
            stats["reward"] = jnp.sum(out.reward * alive)
            n_alive = jnp.sum(alive)
            alive = alive * (1.0 - out.terminated.astype(alive.dtype))
            return (out.state, alive), (stats, n_alive)

        keys = jax.random.split(k_roll, max_steps)
        _, (stats, n_alive) = jax.lax.scan(
            step, (state, jnp.ones(n_episodes, jnp.float32)), keys)
        total = jnp.maximum(jnp.sum(n_alive), 1.0)
        return {k: jnp.sum(v) / total for k, v in stats.items()}

    stats = jax.jit(rollout)(jax.random.PRNGKey(seed))
    return {"mean_test_" + k if k != "reward" else "mean_test_reward":
            float(v) for k, v in stats.items()}


def curve_summary(path):
    recs = [json.loads(l) for l in open(path)]
    evals = [r for r in recs if "mean_test_reward" in r]
    if not evals:
        return None

    def pick(r):
        return {"episode": r["step"],
                "mean_test_reward": r["mean_test_reward"],
                "mean_test_totally_controllable_ratio":
                    r.get("mean_test_totally_controllable_ratio")}

    best = max(evals, key=lambda r: r["mean_test_reward"])
    tail = evals[-3:]
    return {
        "n_episodes": recs[-1]["step"],
        "n_evals": len(evals),
        "first": pick(evals[0]),
        "best": pick(best),
        "final": pick(evals[-1]),
        "late_mean_test_reward": sum(
            r["mean_test_reward"] for r in tail) / len(tail),
        "late_mean_test_totally_controllable_ratio": sum(
            r.get("mean_test_totally_controllable_ratio", 0.0)
            for r in tail) / len(tail),
    }


def main():
    out = {"random_baseline": random_baseline()}
    for path in sorted(glob.glob(os.path.join(
            ART, "*", "tensorboard", "*", "metrics.jsonl"))):
        alg = path[len(ART) + 1:].split(os.sep)[0]
        s = curve_summary(path)
        if s:
            s["metrics_path"] = os.path.relpath(
                path, os.path.dirname(os.path.dirname(ART)))
            out[alg] = s
    dest = os.path.join(ART, "summary.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"\nwrote {dest}")


if __name__ == "__main__":
    main()
