"""One-process perf lab: A/B scheduling variants of the fused train chunk.

Sweeps scan-unroll factors (and optionally the PRNG implementation) on the
bench configuration (8192 case33 envs, MAPPO, reference cadence), all in a
single process so the TPU lease is paid once.  Used to pick the committed
defaults in utils/config.py; results land in artifacts/PERF_LAB.json.

Usage: python scripts/perf_lab.py [out.json]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp

from mapdn_tpu.algos import make_model
from mapdn_tpu.envs import EnvConfig, make_env
from mapdn_tpu.learn.trainer import PGTrainer
from mapdn_tpu.utils.config import load_config

N_ENVS = 8192

VARIANTS = [
    ("baseline", dict(gae_unroll=1, update_epoch_unroll=1, rollout_unroll=1)),
    ("gae8", dict(gae_unroll=8, update_epoch_unroll=1, rollout_unroll=1)),
    ("gae8+epochs", dict(gae_unroll=8, update_epoch_unroll=10,
                         rollout_unroll=1)),
    ("gae8+epochs+roll2", dict(gae_unroll=8, update_epoch_unroll=10,
                               rollout_unroll=2)),
    ("gae8+epochs+roll4", dict(gae_unroll=8, update_epoch_unroll=10,
                               rollout_unroll=4)),
]


def measure(env, overrides, chunks=4):
    info = env.get_env_info()
    cfg, _ = load_config("mappo")
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], n_envs=N_ENVS,
        behaviour_update_freq=60, batch_size=32,
        value_update_epochs=10, policy_update_epochs=1,
        update_lanes=1024, **overrides)
    model = make_model("mappo", cfg)
    trainer = PGTrainer(cfg, model, env).setup(seed=0)
    t_c = time.perf_counter()
    trainer.carry, _ = trainer._jit_chunk(trainer.carry)
    jax.block_until_ready(trainer.carry.obs)
    compile_s = time.perf_counter() - t_c
    t0 = time.perf_counter()
    for _ in range(chunks):
        trainer.carry, stats = trainer._jit_chunk(trainer.carry)
    jax.block_until_ready(trainer.carry.obs)
    dt = (time.perf_counter() - t0) / chunks
    del trainer
    return {"chunk_ms": round(dt * 1e3, 2),
            "env_steps_per_s": round(60 * N_ENVS / dt, 1),
            "compile_s": round(compile_s, 1),
            "reward": round(float(stats["mean_train_reward"]), 5)}


def main():
    env = make_env("case33", EnvConfig(episode_limit=240), days=40,
                   dtype=jnp.float32)
    results = {}
    for name, ov in VARIANTS:
        results[name] = {**measure(env, ov), "overrides": ov}
        print(name, results[name], flush=True)
    path = sys.argv[1] if len(sys.argv) > 1 else None
    if path:
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
