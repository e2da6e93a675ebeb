"""FACMADDPG hyperparameter sweep: close or explain the weak-learner gap.

Round-3 evidence: facmaddpg's late controllable ratio is 0.678 vs 0.99+ for
the other nine algorithms, with loss wiring verified against reference
models/facmaddpg.py:90-119 and hyperparameters matching reference
args/alg_args/facmaddpg.yaml exactly.  This sweep varies the knobs most
likely to matter (target cadence, learning rates, double-Q, advantage
normalization, mixer embed) at the zoo's own training protocol, in ONE
process (TPU lease).  Output: artifacts/facmaddpg_sweep/<tag>/metrics.jsonl
+ artifacts/facmaddpg_sweep/summary.json ranking late evals.

Usage: python scripts/sweep_facmaddpg.py [tag ...]   # default: all
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
ART = os.path.join(ROOT, "artifacts", "facmaddpg_sweep")

EPISODES = 400
N_ENVS = 512
SEED = 7

# tag -> config overrides on top of configs/alg/facmaddpg.yaml
# (baseline = the reference's exact hyperparameters, curve already
# committed under artifacts/learning/facmaddpg)
SWEEP = {
    "fast_targets": {"target_update_freq": 120},
    "soft_targets": {"target_update_freq": 120, "target_lr": 0.1},
    "low_lr": {"policy_lrate": 1e-4, "value_lrate": 1e-4,
               "mixer_lrate": 1e-4},
    "no_double_q": {"double_q": False},
    "norm_adv": {"normalize_advantages": True},
    "small_mixer": {"mixing_embed_dim": 32, "hypernet_embed": 32,
                    "hypernet_layers": 1},
}


def run_one(tag, overrides):
    import jax
    from train import build_env_cfg
    from mapdn_tpu.algos import make_model
    from mapdn_tpu.envs import make_env
    from mapdn_tpu.learn.trainer import PGTrainer
    from mapdn_tpu.utils.config import load_config
    from mapdn_tpu.utils.logging import MetricsLogger

    cfg, env_dict = load_config(
        "facmaddpg", scenario="case33_3min_final", mode="distributed",
        voltage_barrier_type="l1",
        overrides={"seed": SEED, "n_envs": N_ENVS,
                   "train_episodes_num": EPISODES, **overrides})
    env = make_env("case33_3min_final", build_env_cfg(env_dict),
                   days=40, seed=SEED)
    info = env.get_env_info()
    cfg = cfg.replace(agent_num=info["n_agents"], obs_size=info["obs_shape"],
                      action_dim=info["n_actions"],
                      max_steps=min(cfg.max_steps, info["episode_limit"]))

    dest = os.path.join(ART, tag)
    os.makedirs(dest, exist_ok=True)
    logger = MetricsLogger(dest, use_tensorboard=False)
    logger.log_config(cfg, env_dict)

    model = make_model("facmaddpg", cfg)
    trainer = PGTrainer(cfg, model, env).setup(seed=SEED)
    t0 = time.time()
    evals = []
    for i in range(cfg.train_episodes_num):
        stat = trainer.run_episode()
        if i % cfg.eval_freq == cfg.eval_freq - 1 or i == 0:
            stat.update(trainer.evaluate())
            evals.append({k: stat[k] for k in
                          ("mean_test_reward",
                           "mean_test_totally_controllable_ratio")})
        logger.log(stat, trainer.episodes)
    logger.close()
    late = evals[-3:]
    result = {
        "late_mean_test_reward": round(sum(
            e["mean_test_reward"] for e in late) / len(late), 5),
        "late_ratio": round(sum(
            e["mean_test_totally_controllable_ratio"] for e in late)
            / len(late), 4),
        "first_ratio": round(evals[0]["mean_test_totally_controllable_ratio"], 4),
        "wall_s": round(time.time() - t0, 1),
        "overrides": overrides,
    }
    print(f"[{tag}] {result}", flush=True)
    del trainer
    return result


def main():
    wanted = [a for a in sys.argv[1:] if not a.startswith("-")] or list(SWEEP)
    os.makedirs(ART, exist_ok=True)
    path = os.path.join(ART, "summary.json")
    summary = json.load(open(path)) if os.path.exists(path) else {}
    for tag in wanted:
        if tag in summary and "--force" not in sys.argv:
            print(f"[{tag}] already present, skipping", flush=True)
            continue
        summary[tag] = run_one(tag, SWEEP[tag])
        with open(path, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps(summary, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
