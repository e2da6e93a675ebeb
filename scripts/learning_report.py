"""Summarize committed learning curves + compute comparison baselines.

Produces artifacts/learning/summary.json consumed by tests/test_learning.py:
for each trained run (artifacts/learning/<run>/metrics.jsonl, written by
scripts/train_zoo.py) the eval-curve milestones, plus:

* a uniform-random-policy baseline evaluated on the identical env build —
  the role the reference's RandomAgent plays (reference models/random.py:
  7-18) — with the same per-episode mean-of-means weighting as the
  trainer's evaluation (reference models/model.py:281-301);
* droop and OPF engineering baselines (mapdn_tpu.traditional — the TPU
  redesign of the reference's Matlab traditional_control/*.m) over sampled
  operating points, contextualizing controller quality.

Run names: '<alg>' = case33 distributed; '<alg>_decentralised' = case33
decentralised; '<alg>_case322' = case322 distributed.

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
import numpy as np  # noqa: E402

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "learning")


def _build_env(case):
    from mapdn_tpu.envs import EnvConfig, make_env

    return make_env(case, EnvConfig(episode_limit=240), days=40, seed=7,
                    dtype=jnp.float32)


def random_baseline(case="case33", n_episodes=256, max_steps=240, seed=7):
    """Uniform-random actions, vectorized episodes; mirrors the env build in
    train.py and the trainer's per-episode mean-of-means eval weighting."""
    env = _build_env(case)

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
            stats = {k2: v * alive for k2, v in out.info.items()}
            stats["reward"] = out.reward * alive
            n_alive = alive
            alive = alive * (1.0 - out.terminated.astype(alive.dtype))
            return (out.state, alive), (stats, n_alive)

        keys = jax.random.split(k_roll, max_steps)
        _, (stats, n_alive) = jax.lax.scan(
            step, (state, jnp.ones(n_episodes, jnp.float32)), keys)
        ep_len = jnp.maximum(jnp.sum(n_alive, axis=0), 1.0)
        return {k: jnp.mean(jnp.sum(v, axis=0) / ep_len)
                for k, v in stats.items()}

    stats = jax.jit(rollout)(jax.random.PRNGKey(seed))
    return {"mean_test_" + k if k != "reward" else "mean_test_reward":
            float(v) for k, v in stats.items()}


def engineering_baselines(case="case33", n_samples=256, seed=7):
    """Droop + OPF dispatch metrics over sampled dataset rows (quasi-static
    operating points, no noise) — per-step engineering context for the RL
    metrics (the role of reference traditional_control/*.m)."""
    from mapdn_tpu.traditional.droop import droop_solve
    from mapdn_tpu.traditional.opf import opf_solve

    env = _build_env(case)
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, env.ts.n_steps, size=n_samples)
    load_p = env.ts.load_p[rows]
    load_q = env.ts.load_q[rows]
    pv_p = env.ts.pv[rows]

    out = {}
    for name, solver in (("droop_baseline", droop_solve),
                         ("opf_baseline", opf_solve)):
        def one(lp, lq, pv):
            q, res, _ = solver(env, lp, lq, pv)
            reward, info = env._calc_reward(res.vm, res.pl_mw, q)
            info["reward"] = reward
            info["converged"] = res.converged.astype(res.vm.dtype)
            return info

        info = jax.jit(jax.vmap(one))(load_p, load_q, pv_p)
        ok = np.asarray(info.pop("converged")) > 0
        out[name] = {
            ("mean_test_" + k if k != "reward" else "mean_test_reward"):
                float(np.mean(np.asarray(v)[ok])) for k, v in info.items()}
        out[name]["n_samples"] = int(ok.sum())
    return out


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
    runs = {}
    cases_needed = {"case33"}
    for path in sorted(glob.glob(os.path.join(ART, "*", "metrics.jsonl"))):
        name = os.path.basename(os.path.dirname(path))
        s = curve_summary(path)
        if s:
            s["metrics_path"] = os.path.relpath(
                path, os.path.dirname(os.path.dirname(ART)))
            runs[name] = s
            for suffix in ("case322", "case141", "case69"):
                if name.endswith("_" + suffix):
                    cases_needed.add(suffix)

    out = {}
    for case in sorted(cases_needed):
        key = "random_baseline" if case == "case33" else (
            "random_baseline_" + case)
        print(f"computing {key}...", flush=True)
        out[key] = random_baseline(case)
    print("computing droop/opf baselines...", flush=True)
    out.update(engineering_baselines("case33"))
    out.update(runs)

    dest = os.path.join(ART, "summary.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"\nwrote {dest}")


if __name__ == "__main__":
    main()
