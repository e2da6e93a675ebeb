"""Per-scenario training throughput: case33 / case141 / case322.

Same fused-MAPPO measurement as bench.py (reference cadence: update every 60
steps, 10 value + 1 policy epochs, batch 32) across all three reference
scenarios (reference train_case{33,141,322}.sh).  On TPU the case322 run
exercises the Pallas npad=384 kernel tile through the env's auto-dispatch.

Usage: python scripts/bench_cases.py [out.json]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp

from bench import measure_baseline_oracle, pinned_baseline

from mapdn_tpu.algos import make_model
from mapdn_tpu.envs import EnvConfig, make_env
from mapdn_tpu.grid import make_case
from mapdn_tpu.learn.trainer import PGTrainer
from mapdn_tpu.utils.config import load_config

# lanes sized to keep replay + rollout well inside one chip's HBM;
# case69 is the bonus REAL Baran-Wu feeder (not a reference scenario).
# case322 moved 2048->4096 lanes in r5 (bf16 ring halves the footprint):
# 492k -> 582k env-steps/s
CASES = [("case33", 8192), ("case69", 8192), ("case141", 4096),
         ("case322", 4096)]


def baseline_for(case):
    """Per-scenario reference-class baseline: the PINNED oracle number from
    BASELINE_ORACLE.json (scripts/pin_baseline.py; one protocol, one number
    per case — VERDICT r4 weak #7), measured live only if the pin is
    missing."""
    pinned = pinned_baseline(case)
    if pinned is not None:
        return pinned
    grid, load_p, load_q, _ = make_case(case)
    return measure_baseline_oracle(grid, load_p, load_q)


def measure(case, n_envs, chunks=3, pf_backend="auto"):
    env = make_env(case, EnvConfig(episode_limit=240, pf_backend=pf_backend),
                   days=40, dtype=jnp.float32)
    info = env.get_env_info()
    cfg, _ = load_config("mappo")
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], n_envs=n_envs,
        behaviour_update_freq=60, batch_size=32,
        value_update_epochs=10, policy_update_epochs=1,
        update_lanes=min(1024, n_envs), replay_bf16=True)
    model = make_model("mappo", cfg)
    trainer = PGTrainer(cfg, model, env).setup(seed=0)

    trainer.carry, _ = trainer._jit_chunk(trainer.carry)
    jax.block_until_ready(trainer.carry.obs)
    t0 = time.perf_counter()
    for _ in range(chunks):
        trainer.carry, stats = trainer._jit_chunk(trainer.carry)
    jax.block_until_ready(trainer.carry.obs)
    dt = time.perf_counter() - t0
    sps = chunks * trainer._chunk_len * n_envs / dt
    return {
        "case": case, "n_envs": n_envs, "n_agents": info["n_agents"],
        "n_bus": env.grid.n_bus, "pf_backend": pf_backend,
        "env_steps_per_s": round(sps, 1),
        "train_reward": round(float(stats["mean_train_reward"]), 5),
    }


def main():
    rows = []
    for case, n_envs in CASES:
        row = measure(case, n_envs)
        base = baseline_for(case)
        row["baseline_env_steps_per_s"] = round(base, 1)
        row["vs_baseline"] = round(row["env_steps_per_s"] / base, 1)
        rows.append(row)
        print(row, flush=True)
    # end-to-end A/B for the auto-dispatch policy: case322 is where 'auto'
    # routes the env's solves to the fused Pallas kernel (solver-level +39%,
    # BENCH_SOLVERS.json); record the TRAINING-throughput delta vs forcing
    # the XLA matrix-free path so the dispatch policy is justified
    # end-to-end, not just at the solver microbench
    if jax.default_backend() == "tpu":
        row = measure("case322", 4096, pf_backend="xla")
        rows.append(row)
        print(row, flush=True)
        auto = next(r for r in rows
                    if r["case"] == "case322" and r["pf_backend"] == "auto")
        row["auto_vs_xla"] = round(
            auto["env_steps_per_s"] / row["env_steps_per_s"], 3)
    out = {"metric": "train env-steps/s/chip per scenario "
                     "(fused MAPPO, reference cadence)",
           "platform": jax.default_backend(), "rows": rows}
    path = sys.argv[1] if len(sys.argv) > 1 else None
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
