"""Worker for the 2-process multi-host CPU test (tests/test_multiprocess.py).

Each process owns 2 virtual CPU devices (XLA_FLAGS from the parent test) and
joins a jax.distributed job; the sharded trainer then spans the 4-device
global mesh, so the learner's gradient all-reduce crosses the process
boundary — the same code path a real multi-host TPU pod takes
(mapdn_tpu/parallel/mesh.py), minus ICI.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    args = ap.parse_args()

    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes, process_id=args.process_id)
    assert jax.process_count() == args.num_processes
    print(f"global_devices: {jax.device_count()}", flush=True)

    import jax.numpy as jnp
    from mapdn_tpu.algos import make_model
    from mapdn_tpu.envs import EnvConfig, make_env
    from mapdn_tpu.parallel import ShardedPGTrainer
    from mapdn_tpu.utils.config import load_config

    env = make_env("case33", EnvConfig(episode_limit=4), days=2,
                   dtype=jnp.float32)
    info = env.get_env_info()
    cfg, _ = load_config("iddpg")
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], max_steps=4, behaviour_update_freq=4,
        batch_size=4, value_update_epochs=1, policy_update_epochs=1,
        target_update_freq=4, n_envs=4, num_eval_episodes=2,
        replay_buffer_size=64, hid_size=16)
    model = make_model("iddpg", cfg)
    trainer = ShardedPGTrainer(cfg, model, env).setup(seed=0)

    p0 = jax.tree_util.tree_leaves(trainer.carry.algo.policy_params)[0].copy()
    for _ in range(2):
        stats = trainer.run_episode()
    assert jnp.isfinite(stats["mean_train_value_loss"]), stats
    p1 = jax.tree_util.tree_leaves(trainer.carry.algo.policy_params)[0]
    assert float(jnp.max(jnp.abs(jnp.asarray(p1) - jnp.asarray(p0)))) > 0, \
        "params never updated"

    norm = sum(float(jnp.sum(jnp.abs(l))) for l in
               jax.tree_util.tree_leaves(trainer.carry.algo.policy_params))
    print(f"final_policy_param_l1: {norm:.10e}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
