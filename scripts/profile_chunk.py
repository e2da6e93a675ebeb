"""Profile the fused train chunk: rollout vs update vs bare NR solve + MFU.

The MXU-utilization estimate is analytic: every Dense/GRU kernel of shape
(in, out) contributes 2*in*out matmul FLOPs per sample forward and ~2x that
backward (input grads + weight grads), summed over the chunk's policy/critic
invocations, divided by measured wall time and the chip's peak.  The NR
solver is matrix-free (matvecs over the sparse branch incidence), so its
FLOPs are NOT in the numerator — this is the *neural-net* MFU of a program
dominated by the physics solve; the honest conclusion is which phase owns
the time, not a marketing number.

Usage: python scripts/profile_chunk.py [n_envs] [out.json]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import json
import time

import jax
import jax.numpy as jnp

# bf16/fp32-on-MXU peak for one TPU v5e (v5 lite) chip; fp32 inputs are
# passed through the MXU with bf16x3-style decomposition, so treat this as
# the ceiling and report the ratio
PEAK_FLOPS = 197e12


def kernel_flops_per_sample(params):
    """2 * sum(in*out) over every 2-D kernel leaf (matmul FLOPs/sample)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        if getattr(leaf, "ndim", 0) == 2:
            total += 2 * leaf.shape[0] * leaf.shape[1]
    return total

from mapdn_tpu.algos import make_model
from mapdn_tpu.envs import EnvConfig, make_env
from mapdn_tpu.learn.trainer import PGTrainer
from mapdn_tpu.utils.config import load_config


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    env = make_env("case33", EnvConfig(episode_limit=240), days=40,
                   dtype=jnp.float32)
    info = env.get_env_info()
    cfg, _ = load_config("mappo")
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], n_envs=n_envs,
        behaviour_update_freq=60, batch_size=32,
        value_update_epochs=10, policy_update_epochs=1, update_lanes=1024,
        replay_bf16=True)  # bench.py config (parity A/B: artifacts/bf16_ab)
    model = make_model("mappo", cfg)
    trainer = PGTrainer(cfg, model, env).setup(seed=0)

    # full chunk (donates carry: thread it through)
    carry, _ = trainer._jit_chunk(trainer.carry)
    jax.block_until_ready(carry.obs)
    t0 = time.perf_counter()
    for _ in range(3):
        carry, _ = trainer._jit_chunk(carry)
    jax.block_until_ready(carry.obs)
    dt_full = (time.perf_counter() - t0) / 3
    print(f"full chunk      : {dt_full*1e3:8.1f} ms  "
          f"({60*n_envs/dt_full/1e6:.2f}M steps/s)")

    # rollout only (donated carry: the in-scan ring writes must update in
    # place, exactly as in the fused chunk — without donation every
    # .at[].set copies the whole ring)
    import copy as _copy
    @functools.partial(jax.jit, donate_argnums=(0,))
    def rollout_only(carry):
        c, _ = jax.lax.scan(trainer._rollout_step, carry, None, length=60,
                            unroll=cfg.rollout_unroll)
        return c
    c2 = rollout_only(jax.tree_util.tree_map(jnp.copy, carry))
    jax.block_until_ready(c2.obs)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        c2 = rollout_only(c2)
    jax.block_until_ready(c2.obs)
    dt_roll = (time.perf_counter() - t0) / reps
    print(f"rollout only    : {dt_roll*1e3:8.1f} ms")

    # env step only (no policy).  Actions are RESAMPLED noisy draws each
    # step, not zeros: with frozen actions the warm-started NR converges in
    # ~1.5 iterations vs ~3.1 under realistic action churn, which made the
    # round-4 env-only baseline understate the env by ~25 ms and
    # manufactured a phantom "interleave penalty" (r5 xplane trace).  The
    # 0.3 noise scale matches the policy's exploration std; full-range
    # random actions overshoot to ~4+ iterations.
    @jax.jit
    def env_only(env_state, key):
        def body(c, _):
            st, k = c
            k, k2, k3 = jax.random.split(k, 3)
            acts = jnp.tanh(0.3 * jax.random.normal(
                k3, (n_envs, env.grid.n_sgen), jnp.float32))
            ks = jax.random.split(k2, n_envs)
            out = env.batched_auto_reset_step(st, acts, ks)
            return (out.state, k), None
        (st, _), _ = jax.lax.scan(body, (env_state, key), None, length=60)
        return st
    dt_env, _ = timeit(env_only, carry.env_state, jax.random.PRNGKey(0))
    print(f"env steps only  : {dt_env*1e3:8.1f} ms  (exploration-scale churn)")

    # bare NR solve, 60 sequential batched solves
    from mapdn_tpu.pf.newton import nr_solve
    g = env.grid
    p = jnp.tile(carry.env_state.p_bus[:, :] / -g.sn_mva, (1, 1))

    @jax.jit
    def nr_only(p):
        def body(p, _):
            res = nr_solve(g, p, p * 0.3)
            return p * 0.999 + 1e-6 * res.vm.mean(), res.n_iter
        p, iters = jax.lax.scan(body, p, None, length=60)
        return p, iters
    dt_nr, (_, iters) = timeit(nr_only, p)
    print(f"bare NR x60     : {dt_nr*1e3:8.1f} ms   (mean iters "
          f"{jnp.mean(iters.astype(jnp.float32)):.1f})")

    # update phase only
    @jax.jit
    def update_only(carry):
        algo, stats = trainer._update_phase(
            carry.algo, carry.replay, jax.random.PRNGKey(1))
        return stats
    dt_upd, _ = timeit(update_only, carry)
    print(f"update only     : {dt_upd*1e3:8.1f} ms")

    # ---- analytic neural-net MFU over the full chunk
    algo = carry.algo
    k_pol = kernel_flops_per_sample(algo.policy_params)
    k_val = kernel_flops_per_sample(algo.value_params)
    chunk = trainer._chunk_len
    n_agents = cfg.agent_num
    # rollout: policy fwd per step per agent lane + one whole-chunk critic fwd
    fl_roll = chunk * n_envs * n_agents * k_pol + chunk * n_envs * k_val
    # update: value epochs (critic fwd+bwd ~= 3x fwd) + policy epochs
    # (policy fwd+bwd + critic fwd for the ratio/values)
    b_upd = cfg.batch_size * (cfg.update_lanes or n_envs)
    fl_val = cfg.value_update_epochs * b_upd * 3 * (k_val + k_pol / 3)
    fl_pol = cfg.policy_update_epochs * b_upd * (
        3 * n_agents * k_pol + 2 * k_val)
    flops = fl_roll + fl_val + fl_pol
    mfu = flops / dt_full / PEAK_FLOPS
    print(f"\nneural-net matmul FLOPs/chunk : {flops/1e9:.2f} GFLOP")
    print(f"achieved                      : {flops/dt_full/1e12:.3f} TFLOP/s")
    print(f"MFU vs {PEAK_FLOPS/1e12:.0f} TFLOP/s peak     : {mfu:.2%}")
    print("(matrix-free NR matvecs excluded from the numerator; the chunk "
          "is physics-dominated by design)")

    out = {
        "metric": "fused-chunk profile (case33, MAPPO, reference cadence)",
        "platform": jax.default_backend(), "n_envs": n_envs,
        "full_chunk_ms": round(dt_full * 1e3, 2),
        "rollout_ms": round(dt_roll * 1e3, 2),
        "env_steps_only_ms": round(dt_env * 1e3, 2),
        "bare_nr_x60_ms": round(dt_nr * 1e3, 2),
        "update_ms": round(dt_upd * 1e3, 2),
        "env_steps_per_s": round(chunk * n_envs / dt_full, 1),
        "nn_matmul_gflop_per_chunk": round(flops / 1e9, 2),
        "nn_achieved_tflops": round(flops / dt_full / 1e12, 4),
        "nn_mfu_vs_peak": round(mfu, 5),
    }
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
