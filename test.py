#!/usr/bin/env python
"""Evaluation CLI — flag-compatible with the reference's test.py.

    python test.py --alg maddpg --mode distributed --scenario case33_3min_final \
        --test-mode single --test-day 10

Reference parity (reference test.py): episode_limit forced to 480 (one
day), checkpoint restore, single-day replay dumping a pickled telemetry
record, or batch mode aggregating metrics over 10 random episodes.
"""
import argparse
import os
import pickle

from mapdn_tpu.algos import make_model
from mapdn_tpu.envs import make_env
from mapdn_tpu.learn.tester import PGTester
from mapdn_tpu.utils.checkpoint import load_model
from mapdn_tpu.utils.config import load_config

from train import build_env_cfg


def main():
    parser = argparse.ArgumentParser(description="Evaluate a trained agent.")
    parser.add_argument("--save-path", type=str, default="./")
    parser.add_argument("--alg", type=str, default="maddpg")
    parser.add_argument("--env", type=str, default="var_voltage_control")
    parser.add_argument("--alias", type=str, default="")
    parser.add_argument("--mode", type=str, default="distributed",
                        choices=["distributed", "decentralised"])
    parser.add_argument("--scenario", type=str, default="case33_3min_final")
    parser.add_argument("--voltage-barrier-type", type=str, default="l1")
    parser.add_argument("--test-mode", type=str, default="single",
                        choices=["single", "batch", "day_sweep"])
    parser.add_argument("--test-day", type=int, default=10)
    # day_sweep: replay [test-day, test-day + sweep-days) vectorized in
    # one jitted scan (every day is a lane) and dump per-day summaries —
    # the reference's single mode needs one full CLI run per day
    parser.add_argument("--sweep-days", type=int, default=28)
    parser.add_argument("--test-episodes", type=int, default=10)
    parser.add_argument("--data-path", type=str, default=None)
    parser.add_argument("--days", type=int, default=40)
    parser.add_argument("--seed", type=int, default=0)
    # reference test.py:23 --render: frames are rendered post-hoc from the
    # recorded telemetry (the day replays as ONE fused scan; a per-step
    # host render loop has no place in it)
    parser.add_argument("--render", action="store_true",
                        help="write PNG frames of the single-day replay")
    argv = parser.parse_args()

    cfg, env_dict = load_config(
        argv.alg, env=argv.env, scenario=argv.scenario, mode=argv.mode,
        voltage_barrier_type=argv.voltage_barrier_type)
    # one-day test episodes (reference test.py:51-56)
    env_dict["episode_limit"] = 480
    cfg = cfg.replace(max_steps=480)

    env = make_env(argv.scenario, build_env_cfg(env_dict),
                   data_path=argv.data_path or env_dict.get("data_path"),
                   days=argv.days, seed=argv.seed)
    info = env.get_env_info()
    cfg = cfg.replace(agent_num=info["n_agents"], obs_size=info["obs_shape"],
                      action_dim=info["n_actions"])

    log_name = "-".join(filter(None, [
        argv.env, argv.scenario, argv.mode, argv.alg,
        argv.voltage_barrier_type, argv.alias]))
    load_path = os.path.join(
        argv.save_path, "model_save", log_name, "model.pt")

    import jax
    model = make_model(argv.alg, cfg)
    algo_state = model.init_state(jax.random.PRNGKey(0))
    if os.path.exists(load_path):
        algo_state = load_model(load_path, algo_state)
        print(f"loaded checkpoint: {load_path}")
    else:
        print(f"WARNING: no checkpoint at {load_path}; evaluating an "
              "untrained (randomly initialized) policy")

    tester = PGTester(cfg, model, env, algo_state)
    if argv.test_mode == "day_sweep":
        days = list(range(argv.test_day, argv.test_day + argv.sweep_days))
        out_stats = tester.run_days(days, 23, 2)
        out = f"test_record_{log_name}_days{days[0]}-{days[-1]}.pickle"
        with open(out, "wb") as f:
            pickle.dump(out_stats, f, pickle.HIGHEST_PROTOCOL)
        rw = out_stats["reward"]
        print(f"wrote {out}: {len(days)} days, mean reward "
              f"{sum(rw)/len(rw):.4f}, worst day "
              f"{days[min(range(len(rw)), key=lambda i: rw[i])]}")
    elif argv.test_mode == "single":
        record = tester.run(argv.test_day, 23, 2)
        out = f"test_record_{log_name}_day{argv.test_day}.pickle"
        with open(out, "wb") as f:
            pickle.dump(record, f, pickle.HIGHEST_PROTOCOL)
        print(f"wrote {out} ({len(record['bus_voltage'])} steps)")
        if argv.render:
            from mapdn_tpu.envs.rendering import render_record
            frames = render_record(
                env, record, f"render_{log_name}_day{argv.test_day}")
            print(f"wrote {len(frames)} frames to "
                  f"{os.path.dirname(frames[0])}")
    else:
        results = tester.batch_run(argv.test_episodes)
        print("Test Results:")
        for k, (m, s2) in sorted(results.items()):
            print(f"{k}: mean: {m:2.4f}, \t2std: {s2:2.4f}")
        out = f"test_record_{log_name}_{argv.test_mode}.pickle"
        with open(out, "wb") as f:
            pickle.dump(results, f, pickle.HIGHEST_PROTOCOL)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
