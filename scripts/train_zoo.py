"""Train the full algorithm zoo and commit learning-curve artifacts.

The reference's core deliverable is reproducible trained controllers for
every algorithm (reference train_case33.sh:7-21 launches the zoo;
README.md:253-291 reproduces the paper curves).  This driver reruns that
sweep on the TPU rebuild IN ONE PROCESS — a fresh process per run would pay
a multi-minute TPU-lease reacquisition through the tunnel every time — and
writes each run's metrics.jsonl + log.txt into artifacts/learning/<run>/
(a layout deliberately outside any .gitignore pattern so the curves are
actually committed).

Runs: all 10 algorithms on case33 (distributed, 400 episodes, n_envs 512,
seed 7) + one decentralised run + one case322 run.  Training protocol
mirrors train.py exactly (same config plumbing, eval cadence, stat names).

Usage:
  python scripts/train_zoo.py             # everything missing
  python scripts/train_zoo.py maddpg coma # just these runs
  python scripts/train_zoo.py --force     # rerun everything
Afterwards: python scripts/learning_report.py
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
ART = os.path.join(ROOT, "artifacts", "learning")

ALGS = ["iddpg", "maddpg", "matd3", "ippo", "mappo", "iac", "coma",
        "sqddpg", "maac", "facmaddpg"]

# run name -> (alg, scenario, mode)
RUNS = {a: (a, "case33_3min_final", "distributed") for a in ALGS}
RUNS["maddpg_decentralised"] = ("maddpg", "case33_3min_final",
                                "decentralised")
RUNS["mappo_case322"] = ("mappo", "case322_3min_final", "distributed")
# case69 is the second REAL published feeder (Baran & Wu 1989 69-bus,
# validated against its published solution in tests/test_env.py): give it
# the full case33 evidence protocol (VERDICT r4 item 7)
RUNS["maddpg_case69"] = ("maddpg", "case69", "distributed")
RUNS["mappo_case69"] = ("mappo", "case69", "distributed")

EPISODES = 400
N_ENVS = 512
SEED = 7

_ENV_CACHE = {}


def get_env(scenario, mode, env_dict):
    from train import build_env_cfg
    from mapdn_tpu.envs import make_env

    key = (scenario, mode)
    if key not in _ENV_CACHE:
        _ENV_CACHE[key] = make_env(scenario, build_env_cfg(env_dict),
                                   days=40, seed=SEED)
    return _ENV_CACHE[key]


def run_one(name, alg, scenario, mode):
    import jax
    from mapdn_tpu.algos import make_model
    from mapdn_tpu.learn.trainer import PGTrainer
    from mapdn_tpu.utils.config import load_config
    from mapdn_tpu.utils.logging import MetricsLogger

    cfg, env_dict = load_config(
        alg, scenario=scenario, mode=mode, voltage_barrier_type="l1",
        overrides={"seed": SEED, "n_envs": N_ENVS,
                   "train_episodes_num": EPISODES})
    env = get_env(scenario, mode, env_dict)
    info = env.get_env_info()
    cfg = cfg.replace(agent_num=info["n_agents"], obs_size=info["obs_shape"],
                      action_dim=info["n_actions"],
                      max_steps=min(cfg.max_steps, info["episode_limit"]))

    dest = os.path.join(ART, name)
    os.makedirs(dest, exist_ok=True)
    logger = MetricsLogger(dest, use_tensorboard=False)
    logger.log_config(cfg, env_dict)

    model = make_model(alg, cfg)
    trainer = PGTrainer(cfg, model, env).setup(seed=SEED)
    t0 = time.time()
    for i in range(cfg.train_episodes_num):
        stat = trainer.run_episode()
        if i % cfg.eval_freq == cfg.eval_freq - 1 or i == 0:
            stat.update(trainer.evaluate())
        logger.log(stat, trainer.episodes)
    dt = time.time() - t0
    logger.close()
    ev = {k: round(v, 4) for k, v in stat.items() if k in (
        "mean_test_reward", "mean_test_totally_controllable_ratio")}
    print(f"[{name}] done in {dt:.0f}s  final {ev} -> {dest}", flush=True)
    # free HBM between runs (params/replay of this run are dead weight)
    del trainer
    return True


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    force = "--force" in sys.argv
    wanted = args or list(RUNS)
    failed = []
    for name in wanted:
        alg, scenario, mode = RUNS[name]
        path = os.path.join(ART, name, "metrics.jsonl")
        # a crashed run leaves a partial/empty file: only a curve with
        # eval records counts as done
        done = os.path.exists(path) and any(
            "mean_test_reward" in l for l in open(path))
        if done and not force:
            print(f"[{name}] already present, skipping", flush=True)
            continue
        print(f"[{name}] training {alg} on {scenario} ({mode})...",
              flush=True)
        try:
            run_one(name, alg, scenario, mode)
        except Exception as e:  # keep sweeping; report at the end
            print(f"[{name}] FAILED: {e!r}", flush=True)
            failed.append(name)
    if failed:
        print(f"FAILED runs: {failed}", flush=True)
        sys.exit(1)
    print("zoo complete", flush=True)


if __name__ == "__main__":
    main()
