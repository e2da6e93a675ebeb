"""Aux subsystems: checkpoint round-trip, config merge, rendering, tester,
profiling (SURVEY.md section 5 rebuild items)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from mapdn_tpu.algos import make_model
from mapdn_tpu.envs import EnvConfig, make_env
from mapdn_tpu.learn.tester import PGTester
from mapdn_tpu.learn.trainer import PGTrainer
from mapdn_tpu.utils.config import AlgoConfig, load_config


def _tiny_trainer(alg="iddpg"):
    env = make_env("case33", EnvConfig(episode_limit=8), days=8,
                   dtype=jnp.float32)
    info = env.get_env_info()
    cfg, _ = load_config(alg)
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], max_steps=8, behaviour_update_freq=4,
        batch_size=4, value_update_epochs=1, policy_update_epochs=1,
        replay_buffer_size=64, n_envs=2, num_eval_episodes=2, hid_size=32)
    model = make_model(alg, cfg)
    return env, model, cfg, PGTrainer(cfg, model, env).setup(seed=0)


def test_config_three_layer_merge():
    cfg, env_cfg = load_config("mappo", scenario="case141_3min_final",
                               mode="decentralised",
                               voltage_barrier_type="bowl")
    # alg yaml wins over default
    assert cfg.behaviour_update_freq == 240 and cfg.eps_clip == 0.6
    # scenario action range (reference train.py:37-39: case141 -> 0.6)
    assert cfg.action_scale == 0.6 and env_cfg["action_scale"] == 0.6
    assert env_cfg["mode"] == "decentralised"
    assert env_cfg["voltage_barrier_type"] == "bowl"
    # defaults preserved
    assert cfg.gamma == 0.99 and cfg.hid_size == 64


def test_checkpoint_roundtrip(tmp_path):
    from mapdn_tpu.utils.checkpoint import (
        load_model, restore_checkpoint, save_checkpoint, save_model)

    env, model, cfg, trainer = _tiny_trainer()
    trainer.run_episode()

    mpath = str(tmp_path / "model.pt")
    save_model(mpath, trainer.carry.algo)
    fresh = model.init_state(jax.random.PRNGKey(123))
    restored = load_model(mpath, fresh)
    a = jax.tree_util.tree_leaves(trainer.carry.algo.policy_params)[0]
    b = jax.tree_util.tree_leaves(restored.policy_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cpath = str(tmp_path / "ckpt")
    save_checkpoint(cpath, trainer.carry, trainer.steps, trainer.episodes)
    carry2, steps, episodes = restore_checkpoint(cpath, trainer.carry)
    assert steps == trainer.steps and episodes == trainer.episodes
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(carry2.algo.value_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(
            trainer.carry.algo.value_params)[0]))
    # restored state continues training
    trainer.carry = carry2
    stats = trainer.run_episode()
    assert np.isfinite(stats["mean_train_reward"])


def test_rendering_and_plot(tmp_path):
    from mapdn_tpu.envs.rendering import pf_res_plot, render

    env = make_env("case33", EnvConfig(episode_limit=8), days=8)
    state, obs, _ = env.reset(jax.random.PRNGKey(0))
    frame = render(env, state)
    assert frame.ndim == 3 and frame.shape[2] == 3 and frame.dtype == np.uint8
    out = pf_res_plot(env, state, str(tmp_path / "pf"))
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "pf.html"))


def test_tester_single_and_batch():
    env, model, cfg, trainer = _tiny_trainer()
    tester = PGTester(cfg, model, env, trainer.carry.algo)
    record = tester.run(2, 10, 1)
    assert set(record) == {"pv_active", "pv_reactive", "bus_active",
                           "bus_reactive", "bus_voltage", "line_loss"}
    assert len(record["bus_voltage"]) >= 2
    assert record["bus_voltage"][0].shape == (33,)
    results = tester.batch_run(2)
    assert "mean_test_q_loss" in results
    m, s2 = results["mean_test_q_loss"]
    assert np.isfinite(m) and np.isfinite(s2)


def test_phase_timer():
    from mapdn_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("a"):
        x = jnp.sum(jnp.ones((16, 16)))
    with t.phase("a", block_on=x):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0


def test_kill_and_resume_matches_unkilled_run(tmp_path):
    """Full-state resume: train 3 episodes, checkpoint, build a FRESH
    trainer (simulating a new process after a kill), restore, continue to 6
    episodes — counters and the entire carry must match a straight
    6-episode run bitwise (all RNG/replay/env/optimizer state lives in the
    checkpointed carry)."""
    from mapdn_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    cdir = str(tmp_path / "ckpt")

    env, model, cfg, t_a = _tiny_trainer()
    for _ in range(3):
        t_a.run_episode()
    save_checkpoint(cdir, t_a.carry, t_a.steps, t_a.episodes)
    # a later generation that is also pruned-from (keep=2): save again at 3
    # episodes to exercise generation layout, then continue the reference run
    stats_a = [t_a.run_episode() for _ in range(3)]

    # "new process": fresh trainer with its own setup, then restore
    t_b = PGTrainer(cfg, model, env).setup(seed=99)  # different seed on purpose
    carry, steps, episodes = restore_checkpoint(cdir, t_b.carry)
    t_b.carry, t_b.steps, t_b.episodes = carry, steps, episodes
    assert episodes == 3 and steps == t_a.steps - 3 * cfg.max_steps
    stats_b = [t_b.run_episode() for _ in range(3)]

    assert t_b.episodes == t_a.episodes and t_b.steps == t_a.steps
    # the stat stream continues identically
    for sa, sb in zip(stats_a, stats_b):
        assert abs(sa["mean_train_reward"] - sb["mean_train_reward"]) < 1e-6
    # and the full training state is bitwise identical
    la = jax.tree_util.tree_leaves(t_a.carry)
    lb = jax.tree_util.tree_leaves(t_b.carry)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_keeps_two_generations(tmp_path):
    """save_checkpoint prunes to the newest `keep` generations and restore
    picks the newest (falling back past corrupt ones)."""
    import shutil

    from mapdn_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    cdir = str(tmp_path / "gens")
    _, _, _, trainer = _tiny_trainer()
    for ep in (1, 2, 3):
        save_checkpoint(cdir, trainer.carry, ep * 8, ep)
    gens = sorted(os.listdir(cdir))
    assert gens == ["ckpt_00000002", "ckpt_00000003"]

    _, steps, episodes = restore_checkpoint(cdir, trainer.carry)
    assert (steps, episodes) == (24, 3)

    # corrupt the newest generation: restore falls back to the older one
    shutil.rmtree(os.path.join(cdir, "ckpt_00000003"))
    os.makedirs(os.path.join(cdir, "ckpt_00000003"))
    _, steps, episodes = restore_checkpoint(cdir, trainer.carry)
    assert (steps, episodes) == (16, 2)


def test_tester_day_sweep():
    """run_days: vectorized multi-day greedy replay — per-day stats agree
    with batch machinery shapes and are finite; days are distinguishable."""
    import jax.numpy as jnp

    from mapdn_tpu.algos import make_model
    from mapdn_tpu.envs import EnvConfig, make_env
    from mapdn_tpu.utils.config import load_config

    env = make_env("case33", EnvConfig(episode_limit=12), days=8,
                   dtype=jnp.float64)
    info = env.get_env_info()
    cfg, _ = load_config("mappo")
    cfg = cfg.replace(agent_num=info["n_agents"], obs_size=info["obs_shape"],
                      action_dim=info["n_actions"], max_steps=12, n_envs=2)
    model = make_model("mappo", cfg)
    import jax
    algo = model.init_state(jax.random.PRNGKey(0))
    tester = PGTester(cfg, model, env, algo)
    out = tester.run_days([0, 2, 5], hour=6, quarter=0)
    assert out["days"] == [0, 2, 5]
    assert len(out["reward"]) == 3
    import numpy as np
    assert np.isfinite(out["reward"]).all()
    assert np.isfinite(out["average_voltage"]).all()
    # different days see different data -> different telemetry
    assert not (out["average_voltage"][0] == out["average_voltage"][1]
                == out["average_voltage"][2])


def test_checkpoint_nine_digit_generations(tmp_path):
    """Past 1e8 episodes the zero padding overflows to 9-digit names:
    pruning must still count them and restore must rank them numerically
    newest (lexicographic order would rank 'ckpt_099999999' after
    'ckpt_100000000') — ADVICE r4 checkpoint.py finding."""
    from mapdn_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    cdir = str(tmp_path / "gens9")
    _, _, _, trainer = _tiny_trainer()
    for ep in (99_999_998, 99_999_999, 100_000_000):
        save_checkpoint(cdir, trainer.carry, ep * 2, ep)
    # pruned to keep=2, and the 9-digit generation counted as NEWEST
    # (lexicographically 'ckpt_100000000' < 'ckpt_99999999')
    assert set(os.listdir(cdir)) == {"ckpt_99999999", "ckpt_100000000"}
    _, steps, episodes = restore_checkpoint(cdir, trainer.carry)
    assert (steps, episodes) == (200_000_000, 100_000_000)


def test_zero_epoch_phase_is_noop():
    """A phase configured with 0 epochs must be skipped, not traced as a
    zero-length scan (whose unroll clamp would evaluate to 0 and error) —
    ADVICE r4 trainer.py finding."""
    env = make_env("case33", EnvConfig(episode_limit=8), days=8,
                   dtype=jnp.float32)
    info = env.get_env_info()
    cfg, _ = load_config("iddpg")
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], max_steps=8, behaviour_update_freq=4,
        batch_size=4, value_update_epochs=0, policy_update_epochs=1,
        replay_buffer_size=64, n_envs=2, num_eval_episodes=2, hid_size=32)
    model = make_model("iddpg", cfg)
    trainer = PGTrainer(cfg, model, env).setup(seed=0)
    stats = trainer.run_episode()
    assert np.isfinite(stats["mean_train_reward"])
    # the value phase emitted no stats; the policy phase still ran
    assert "mean_train_policy_loss" in stats


def test_pallas_ctx_cache_keyed_by_content():
    """get_ctx caches on a content fingerprint, not id(grid): two grids
    with identical shapes but different impedances must get different
    operator contexts, and an equal-content copy must hit the cache —
    ADVICE r4 pallas_nr.py finding."""
    from mapdn_tpu.grid.cases import make_case
    from mapdn_tpu.pf.pallas_nr import get_ctx

    g1 = make_case("case33", dtype=jnp.float32)[0]
    g2 = make_case("case33", dtype=jnp.float32)[0]  # same content, new object
    assert get_ctx(g1) is get_ctx(g2)

    # perturb the Y-bus: same shapes/name, different physics
    g3 = g1.replace(g_mat=g1.g_mat * 1.5)
    assert get_ctx(g3) is not get_ctx(g1)


def test_render_record_frames(tmp_path):
    """--render parity (reference test.py:23): a tester telemetry record
    renders post-hoc to evenly-spaced PNG frames."""
    from mapdn_tpu.envs.rendering import render_record

    env, model, cfg, trainer = _tiny_trainer()
    tester = PGTester(cfg, model, env, trainer.carry.algo)
    record = tester.run(2, 10, 1)
    outdir = str(tmp_path / "frames")
    paths = render_record(env, record, outdir, max_frames=4)
    assert 1 <= len(paths) <= 5
    assert all(os.path.exists(p) and os.path.getsize(p) > 0 for p in paths)
    gif = os.path.join(outdir, "replay.gif")
    assert os.path.exists(gif) and os.path.getsize(gif) > 0
