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
