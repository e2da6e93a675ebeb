"""Lane-scaling sweep: where does throughput stop scaling in n_envs?

Round-3 left an unexplained cliff (8192 lanes fastest; 16384 slower; 32768
failed to compile).  This harness commits the curve as an artifact: for each
lane count it records env-steps/s, the per-chunk wall time, and the compile
outcome (ok / error string), so the sweet spot in README is a measurement,
not folklore.

All lane counts run in ONE process (the tunneled TPU pays a multi-minute
lease reacquisition per fresh process).

Usage: python scripts/bench_lanes.py [out.json] [case]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time
import traceback

import jax
import jax.numpy as jnp

from mapdn_tpu.algos import make_model
from mapdn_tpu.envs import EnvConfig, make_env
from mapdn_tpu.learn.trainer import PGTrainer
from mapdn_tpu.utils.config import load_config

LANES = [2048, 4096, 8192, 16384, 32768]


def measure(case, n_envs, chunks=3):
    env = make_env(case, EnvConfig(episode_limit=240), days=40,
                   dtype=jnp.float32)
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

    t_c = time.perf_counter()
    trainer.carry, _ = trainer._jit_chunk(trainer.carry)
    jax.block_until_ready(trainer.carry.obs)
    compile_s = time.perf_counter() - t_c

    t0 = time.perf_counter()
    for _ in range(chunks):
        trainer.carry, stats = trainer._jit_chunk(trainer.carry)
    jax.block_until_ready(trainer.carry.obs)
    dt = time.perf_counter() - t0
    return {
        "n_envs": n_envs,
        "env_steps_per_s": round(chunks * trainer._chunk_len * n_envs / dt, 1),
        "chunk_ms": round(dt / chunks * 1e3, 2),
        "compile_s": round(compile_s, 1),
        "status": "ok",
    }


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else None
    case = sys.argv[2] if len(sys.argv) > 2 else "case33"
    rows = []
    for n in LANES:
        try:
            row = measure(case, n)
        except Exception as e:
            row = {"n_envs": n, "status": "error",
                   "error": f"{type(e).__name__}: {str(e)[:400]}"}
            traceback.print_exc()
        rows.append(row)
        print(row, flush=True)
    ok = [r for r in rows if r["status"] == "ok"]
    best = max(ok, key=lambda r: r["env_steps_per_s"]) if ok else None
    out = {
        "metric": f"lane-scaling sweep ({case}, fused MAPPO, reference cadence)",
        "platform": jax.default_backend(),
        "rows": rows,
        "best_n_envs": best and best["n_envs"],
    }
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
