"""Weak-scaling efficiency harness for the sharded trainer.

Measures fused-train-chunk throughput at mesh sizes 1, 2, 4, ... N with a
fixed per-device env count (weak scaling), and reports efficiency
  eff(N) = throughput(N) / (N * throughput(1)).

The north star (BASELINE.json) asks for >=80% efficiency from 1 host to
N>=2 hosts; on a single-chip dev box this harness runs on a virtual CPU
device mesh (xla_force_host_platform_device_count) — the same code path a
real multi-chip/multi-host run takes (NamedSharding over the 'env' axis,
XLA-inserted all-reduce for learner gradients), minus real ICI latency.
On a pod slice, run it unmodified under JAX_PLATFORMS=tpu after
jax.distributed.initialize().

Usage: python scripts/bench_scaling.py [envs_per_device] [max_devices]
"""
import json
import os
import sys
import time

if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    # default: virtual CPU mesh (dev box); on a real slice export
    # JAX_PLATFORMS=tpu and drop the flag
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8").strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

from mapdn_tpu.algos import make_model
from mapdn_tpu.envs import EnvConfig, make_env
from mapdn_tpu.parallel import ShardedPGTrainer, make_env_mesh
from mapdn_tpu.utils.config import load_config


CHUNK = 20   # short chunk: keeps CPU-mesh compiles fast; ratio is what matters


def throughput(n_devices, envs_per_device, reps=3):
    env = make_env("case33", EnvConfig(episode_limit=240), days=8,
                   dtype=jnp.float32)
    info = env.get_env_info()
    cfg, _ = load_config("mappo")
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], n_envs=n_devices * envs_per_device,
        behaviour_update_freq=CHUNK, batch_size=16, value_update_epochs=4,
        policy_update_epochs=4,
        update_lanes=min(64, n_devices * envs_per_device))
    model = make_model("mappo", cfg)
    mesh = make_env_mesh(jax.devices()[:n_devices])
    trainer = ShardedPGTrainer(cfg, model, env, mesh=mesh).setup(seed=0)

    carry, _ = trainer._jit_chunk(trainer.carry)   # compile + warm
    jax.block_until_ready(carry.obs)
    t0 = time.perf_counter()
    for _ in range(reps):
        carry, _ = trainer._jit_chunk(carry)
    jax.block_until_ready(carry.obs)
    dt = (time.perf_counter() - t0) / reps
    return CHUNK * cfg.n_envs / dt


def main():
    envs_per_device = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    max_devices = int(sys.argv[2]) if len(sys.argv) > 2 else len(jax.devices())

    sizes = []
    n = 1
    while n <= max_devices:
        sizes.append(n)
        n *= 2

    base = None
    rows = []
    for n in sizes:
        tp = throughput(n, envs_per_device)
        if base is None:
            base = tp
        eff = tp / (n * base)
        rows.append({"devices": n, "env_steps_per_s": round(tp, 1),
                     "weak_scaling_efficiency": round(eff, 3)})
        print(f"devices={n:3d}  {tp:12.1f} env-steps/s   eff={eff:6.1%}",
              flush=True)
    print(json.dumps({"metric": "weak_scaling", "platform": jax.default_backend(),
                      "envs_per_device": envs_per_device, "rows": rows}))


if __name__ == "__main__":
    main()
