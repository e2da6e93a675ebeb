"""Capture an op-level xplane trace of the fused rollout scan.

VERDICT r4 item 1: rollout costs ~110 ms at 8192 lanes while env-only (36)
+ policy-only (~14) = ~50 ms.  This script traces three programs —
rollout-only, env-steps-only, and the full fused chunk — and dumps the
xplane protos for op-level analysis (scripts/parse_xplane.py).

Usage: python scripts/trace_rollout.py [n_envs] [trace_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp

from mapdn_tpu.algos import make_model
from mapdn_tpu.envs import EnvConfig, make_env
from mapdn_tpu.learn.trainer import PGTrainer
from mapdn_tpu.utils.config import load_config


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xplane_rollout"
    env = make_env("case33", EnvConfig(episode_limit=240), days=40,
                   dtype=jnp.float32)
    info = env.get_env_info()
    cfg, _ = load_config("mappo")
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], n_envs=n_envs,
        behaviour_update_freq=60, batch_size=32,
        value_update_epochs=10, policy_update_epochs=1, update_lanes=1024)
    model = make_model("mappo", cfg)
    trainer = PGTrainer(cfg, model, env).setup(seed=0)

    carry, _ = trainer._jit_chunk(trainer.carry)
    jax.block_until_ready(carry.obs)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rollout_only(carry):
        c, _ = jax.lax.scan(trainer._rollout_step, carry, None, length=60,
                            unroll=cfg.rollout_unroll)
        return c

    acts = jnp.zeros((n_envs, env.grid.n_sgen), jnp.float32)

    @jax.jit
    def env_only(env_state, key):
        def body(c, _):
            st, k = c
            k, k2 = jax.random.split(k)
            ks = jax.random.split(k2, n_envs)
            out = env.batched_auto_reset_step(st, acts, ks)
            return (out.state, k), None
        (st, _), _ = jax.lax.scan(body, (env_state, key), None, length=60)
        return st

    # warm everything up (compile outside the trace)
    c2 = rollout_only(jax.tree_util.tree_map(jnp.copy, carry))
    jax.block_until_ready(c2.obs)
    st = env_only(carry.env_state, jax.random.PRNGKey(0))
    jax.block_until_ready(st.vm)

    t0 = time.perf_counter()
    for _ in range(3):
        c2 = rollout_only(c2)
    jax.block_until_ready(c2.obs)
    print(f"rollout only : {(time.perf_counter()-t0)/3*1e3:.1f} ms")

    t0 = time.perf_counter()
    for _ in range(3):
        st = env_only(st, jax.random.PRNGKey(0))
    jax.block_until_ready(st.vm)
    print(f"env only     : {(time.perf_counter()-t0)/3*1e3:.1f} ms")

    jax.profiler.start_trace(trace_dir)
    with jax.profiler.TraceAnnotation("rollout_only"):
        c2 = rollout_only(c2)
        jax.block_until_ready(c2.obs)
    with jax.profiler.TraceAnnotation("env_only"):
        st = env_only(st, jax.random.PRNGKey(0))
        jax.block_until_ready(st.vm)
    with jax.profiler.TraceAnnotation("full_chunk"):
        carry, _ = trainer._jit_chunk(carry)
        jax.block_until_ready(carry.obs)
    jax.profiler.stop_trace()
    print("trace written to", trace_dir)


if __name__ == "__main__":
    main()
