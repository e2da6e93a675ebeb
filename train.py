#!/usr/bin/env python
"""Training CLI — flag-compatible with the reference's train.py.

    python train.py --alg maddpg --mode distributed --scenario case33_3min_final \
        --voltage-barrier-type l1 --save-path ./out

Reference parity (reference train.py): the same CLI surface, the 3-layer
config merge, per-scenario action ranges, model/strategy registry lookup,
log/model directory layout, per-episode stat logging and rolling model
saves.  TPU extensions: --n-envs (vectorized lanes), --episodes override,
--data-path to point at a real MAPDN dataset directory, full-state
checkpointing for resume.
"""
import argparse
import os
import time

import jax
import jax.numpy as jnp


def build_env_cfg(env_dict):
    from mapdn_tpu.envs import EnvConfig
    return EnvConfig(
        mode=env_dict["mode"],
        voltage_barrier_type=env_dict["voltage_barrier_type"],
        voltage_weight=env_dict.get("voltage_weight", 1.0),
        q_weight=env_dict.get("q_weight", 0.1),
        line_weight=env_dict.get("line_weight"),
        v_upper=env_dict.get("v_upper", 1.05),
        v_lower=env_dict.get("v_lower", 0.95),
        episode_limit=env_dict.get("episode_limit", 240),
        history=env_dict.get("history", 1),
        action_scale=env_dict["action_scale"],
        action_bias=env_dict["action_bias"],
        reset_action=env_dict.get("reset_action", True),
        state_space=tuple(env_dict.get(
            "state_space", ("pv", "demand", "reactive", "vm_pu", "va_degree"))),
    )


def _save(save_model, save_checkpoint, model_dir, ckpt_dir, trainer):
    """Weights export always; full-state checkpoint single-process only.

    The learner state (params/targets/optimizers) is replicated, so the
    main process can serialize model.pt alone even under jax.distributed.
    The full carry, however, holds env/replay arrays SHARDED across
    processes: a main-only orbax save of those blocks fetching
    non-addressable shards and deadlocks the shutdown barrier (caught by
    tests/test_multiprocess.py), so the resumable checkpoint is written
    only when this process owns everything."""
    import os as _os

    import jax as _jax
    save_model(_os.path.join(model_dir, "model.pt"), trainer.carry.algo)
    if _jax.process_count() == 1:
        save_checkpoint(ckpt_dir, trainer.carry, trainer.steps,
                        trainer.episodes)
    else:
        print("multi-process run: skipping the full resume checkpoint "
              "(sharded carry; model.pt weights saved)")


def main():
    parser = argparse.ArgumentParser(description="Train a MARL agent (TPU).")
    parser.add_argument("--save-path", type=str, default="./")
    parser.add_argument("--alg", type=str, default="maddpg")
    parser.add_argument("--env", type=str, default="var_voltage_control")
    parser.add_argument("--alias", type=str, default="")
    parser.add_argument("--mode", type=str, default="distributed",
                        choices=["distributed", "decentralised"])
    parser.add_argument("--scenario", type=str, default="case33_3min_final")
    parser.add_argument("--voltage-barrier-type", type=str, default="l1")
    # TPU extensions
    parser.add_argument("--n-envs", type=int, default=None,
                        help="vectorized env lanes (default from config)")
    parser.add_argument("--episodes", type=int, default=None,
                        help="override train_episodes_num")
    parser.add_argument("--data-path", type=str, default=None,
                        help="real MAPDN csv dataset directory")
    parser.add_argument("--days", type=int, default=40,
                        help="synthetic dataset length in days")
    parser.add_argument("--seed", type=int, default=0)
    # multi-host / multi-chip (no reference analog: its launch scripts farm
    # independent single-GPU processes, train_case33.sh:7-21)
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize; on TPU "
                             "pods arguments are auto-detected, elsewhere "
                             "pass --coordinator/--num-processes/--process-id")
    parser.add_argument("--coordinator", type=str, default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax backend (e.g. cpu for fake-mesh "
                             "multi-process tests)")
    parser.add_argument("--max-steps", type=int, default=None,
                        help="override episode length (smoke tests)")
    parser.add_argument("--resume", action="store_true",
                        help="restore the newest checkpoint generation under "
                             "the run's model dir and continue training")
    argv = parser.parse_args()

    if argv.platform:
        jax.config.update("jax_platforms", argv.platform)
    # persistent XLA compile cache, opt-in: repeated same-shape runs skip the
    # first-compile of the fused chunk.  NOT enabled by default — the
    # tunneled TPU backend in this environment deadlocks when the cache is
    # active (verified empirically), and plain runs only pay ~2min once.
    cache_dir = os.environ.get("MAPDN_JAX_CACHE", "")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if argv.distributed:
        kw = {}
        if argv.coordinator is not None:
            kw = dict(coordinator_address=argv.coordinator,
                      num_processes=argv.num_processes,
                      process_id=argv.process_id)
        jax.distributed.initialize(**kw)
    is_main = jax.process_index() == 0

    # imported after jax.distributed.initialize (importing the package must
    # not touch the XLA backend first)
    from mapdn_tpu.algos import STRATEGY_REGISTRY, make_model
    from mapdn_tpu.envs import make_env
    from mapdn_tpu.learn.trainer import PGTrainer
    from mapdn_tpu.utils.checkpoint import (
        restore_checkpoint, save_checkpoint, save_model)
    from mapdn_tpu.utils.config import load_config
    from mapdn_tpu.utils.logging import MetricsLogger

    overrides = {"seed": argv.seed}
    if argv.n_envs:
        overrides["n_envs"] = argv.n_envs
    if argv.episodes:
        overrides["train_episodes_num"] = argv.episodes
    cfg, env_dict = load_config(
        argv.alg, env=argv.env, scenario=argv.scenario, mode=argv.mode,
        voltage_barrier_type=argv.voltage_barrier_type, overrides=overrides)

    env = make_env(argv.scenario, build_env_cfg(env_dict),
                   data_path=argv.data_path or env_dict.get("data_path"),
                   days=argv.days, seed=argv.seed)
    info = env.get_env_info()
    cfg = cfg.replace(agent_num=info["n_agents"], obs_size=info["obs_shape"],
                      action_dim=info["n_actions"],
                      max_steps=min(cfg.max_steps, info["episode_limit"]))
    if argv.max_steps:
        cfg = cfg.replace(max_steps=argv.max_steps)

    log_name = "-".join(filter(None, [
        argv.env, argv.scenario, argv.mode, argv.alg,
        argv.voltage_barrier_type, argv.alias]))
    save_path = argv.save_path.rstrip("/") + "/"
    model_dir = os.path.join(save_path, "model_save", log_name)
    tb_dir = os.path.join(save_path, "tensorboard", log_name)
    logger = None
    if is_main:
        os.makedirs(model_dir, exist_ok=True)
        logger = MetricsLogger(tb_dir)
        logger.log_config(cfg, env_dict)

    strategy = STRATEGY_REGISTRY[argv.alg]
    if strategy != "pg":
        raise NotImplementedError(f"strategy {strategy}")

    model = make_model(argv.alg, cfg)
    if jax.device_count() > 1:
        # shard the env batch over every chip in the job (ICI/DCN
        # collectives for the learner all-reduce); params replicated
        from mapdn_tpu.parallel import ShardedPGTrainer
        trainer = ShardedPGTrainer(cfg, model, env).setup(seed=argv.seed)
    else:
        trainer = PGTrainer(cfg, model, env).setup(seed=argv.seed)
    print(f"{cfg}\n")
    print(f"devices: {jax.device_count()} ({jax.process_count()} processes) "
          f"n_envs={cfg.n_envs}")

    ckpt_dir = os.path.join(model_dir, "checkpoint")
    start_episode = 0
    if argv.resume:
        # full-state resume: params, targets, optimizer/replay/env state and
        # RNG all live in the carry, so a restored run continues the exact
        # stat stream of the interrupted one (no reference analog: its
        # model.pt holds net weights only, reference train.py:117-119)
        carry, steps, episodes = restore_checkpoint(ckpt_dir, trainer.carry)
        trainer.carry, trainer.steps, trainer.episodes = (
            carry, steps, episodes)
        start_episode = episodes
        print(f"resumed from {ckpt_dir} at episode {episodes} "
              f"({steps} env steps)")

    t0 = time.time()
    steps0 = trainer.steps
    for i in range(start_episode, cfg.train_episodes_num):
        stat = trainer.run_episode()
        if i % cfg.eval_freq == cfg.eval_freq - 1 or i == 0:
            stat.update(trainer.evaluate())
        if not is_main:
            continue
        logger.log(stat, trainer.episodes)
        if i % cfg.save_model_freq == cfg.save_model_freq - 1:
            env_sps = ((trainer.steps - steps0) * cfg.n_envs) / (time.time() - t0)
            print(f"\nEpisode: {trainer.episodes}  "
                  f"({env_sps:,.0f} env-steps/s aggregate)")
            for k, v in sorted(stat.items()):
                print(f"{k}: {v:2.4f}")
            _save(save_model, save_checkpoint, model_dir, ckpt_dir, trainer)
            print("The model is saved!\n")
    if is_main and cfg.train_episodes_num % cfg.save_model_freq != 0:
        # final save: a run shorter than (or not divisible by) the save
        # cadence must still leave a loadable model.pt for test.py — the
        # reference's every-40-episodes rolling save silently loses runs
        # under 40 episodes (reference train.py:117-119)
        _save(save_model, save_checkpoint, model_dir, ckpt_dir, trainer)
    # every process prints this (replication check for multi-process tests)
    leaves = jax.tree_util.tree_leaves(trainer.carry.algo.policy_params)
    norm = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    print(f"final_policy_param_l1: {norm:.10e}", flush=True)
    if logger is not None:
        logger.close()


if __name__ == "__main__":
    main()
