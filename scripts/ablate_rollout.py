"""Ablation decomposition of the fused rollout's ~60ms interleave penalty.

Variants timed at the bench config (case33, MAPPO, 8192 lanes, 60-step
chunk):
  env_only     : env scan, fixed actions, no ring, no policy
  env_policy   : env + policy in one scan, NO ring writes, no stats
  env_ring     : env + ring writes, zero actions (policy ablated)
  full         : the production _rollout_step scan
  full_u{1,4}  : production scan at rollout_unroll 1 / 4

Usage: python scripts/ablate_rollout.py [n_envs] [out.json]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import json
import time

import jax
import jax.numpy as jnp

from mapdn_tpu.algos import make_model
from mapdn_tpu.envs import EnvConfig, make_env
from mapdn_tpu.learn import replay as rb
from mapdn_tpu.learn.trainer import PGTrainer
from mapdn_tpu.utils.config import load_config


def bench(fn, carry, reps=5):
    carry = fn(carry)
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        carry = fn(carry)
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    return (time.perf_counter() - t0) / reps * 1e3


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
        value_update_epochs=10, policy_update_epochs=1, update_lanes=1024)
    model = make_model("mappo", cfg)
    trainer = PGTrainer(cfg, model, env).setup(seed=0)
    carry0, _ = trainer._jit_chunk(trainer.carry)
    jax.block_until_ready(carry0.obs)
    results = {}

    def scan_jit(body, unroll):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(carry):
            c, _ = jax.lax.scan(body, carry, None, length=60, unroll=unroll)
            return c
        return run

    # -- env_only: fixed actions, carry = (env_state, rng)
    acts = jnp.zeros((n_envs, env.grid.n_sgen), jnp.float32)

    def env_body(c, _):
        st, k = c
        k, k2 = jax.random.split(k)
        ks = jax.random.split(k2, n_envs)
        out = env.batched_auto_reset_step(st, acts, ks)
        return (out.state, k), None

    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    results["env_only"] = bench(
        scan_jit(env_body, cfg.rollout_unroll),
        (copy(carry0.env_state), jax.random.PRNGKey(0)))
    print("env_only   :", round(results["env_only"], 1), "ms", flush=True)

    # -- env_policy: policy in the loop, no ring / no transition
    def env_policy_body(carry, _):
        rng, k_act, k_env = jax.random.split(carry.rng, 3)
        _, action_pol, log_prob, _, hid = model.get_actions(
            carry.algo.policy_params, carry.obs, carry.last_hid, k_act,
            status="train", exploration=True, avail=env.avail_actions)
        env_actions = jax.vmap(env.translate_actions)(action_pol)
        env_keys = jax.random.split(k_env, n_envs)
        out = env.batched_auto_reset_step(carry.env_state, env_actions,
                                          env_keys)
        next_hid = jnp.where(out.terminated[:, None, None], 0.0, hid)
        return carry.replace(env_state=out.state, obs=out.obs,
                             last_hid=next_hid, rng=rng), None

    results["env_policy"] = bench(
        scan_jit(env_policy_body, cfg.rollout_unroll), copy(carry0))
    print("env_policy :", round(results["env_policy"], 1), "ms", flush=True)

    # -- env_ring: ring writes with policy ablated (fixed zero actions)
    from mapdn_tpu.algos.base import Transition

    def env_ring_body(carry, _):
        rng, k_env = jax.random.split(carry.rng)
        env_keys = jax.random.split(k_env, n_envs)
        out = env.batched_auto_reset_step(carry.env_state, acts, env_keys)
        n, a, h = model.n, model.act_dim, model.hid_dim
        z = lambda *s: jnp.zeros((n_envs,) + s, carry.obs.dtype)
        reward_rep = jnp.broadcast_to(out.reward[:, None], (n_envs, n))
        done = out.terminated.astype(carry.obs.dtype)
        trans = Transition(
            state=carry.obs, action=z(n, a), log_prob_a=z(n, a),
            value=z(n), next_value=z(n), reward=reward_rep,
            next_state=out.obs, done=done, last_step=done,
            last_hid=carry.last_hid,
            hid=carry.last_hid if model.stores_next_hidden
            else carry.last_hid[..., :0])
        new = carry.replace(env_state=out.state, obs=out.obs, rng=rng,
                            replay=rb.add(carry.replay, trans))
        return new, None

    results["env_ring"] = bench(
        scan_jit(env_ring_body, cfg.rollout_unroll), copy(carry0))
    print("env_ring   :", round(results["env_ring"], 1), "ms", flush=True)

    # -- full production rollout at several unrolls
    for unroll, tag in [(cfg.rollout_unroll, "full"), (1, "full_u1"),
                        (4, "full_u4")]:
        results[tag] = bench(
            scan_jit(trainer._rollout_step, unroll), copy(carry0))
        print(f"{tag:11s}:", round(results[tag], 1), "ms", flush=True)

    results["n_envs"] = n_envs
    print(json.dumps(results))
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
