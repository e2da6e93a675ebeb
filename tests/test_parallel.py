"""Multi-device sharded training on the fake 8-device CPU mesh
(SURVEY.md section 4e: the TPU analog of multi-node tests w/o a cluster)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapdn_tpu.algos import make_model
from mapdn_tpu.envs import EnvConfig, make_env
from mapdn_tpu.parallel import ShardedPGTrainer, make_env_mesh
from mapdn_tpu.learn.trainer import PGTrainer
from mapdn_tpu.utils.config import load_config


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_chunk_runs_and_matches_structure():
    env = make_env("case33", EnvConfig(episode_limit=16), days=8,
                   dtype=jnp.float32)
    info = env.get_env_info()
    cfg, _ = load_config("iddpg")
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], max_steps=8, behaviour_update_freq=4,
        batch_size=4, value_update_epochs=1, policy_update_epochs=1,
        replay_buffer_size=128, n_envs=16, num_eval_episodes=2, hid_size=32)
    model = make_model("iddpg", cfg)
    mesh = make_env_mesh(jax.devices()[:8])
    trainer = ShardedPGTrainer(cfg, model, env, mesh=mesh).setup(seed=0)

    # env batch is actually sharded over the mesh
    shard_devs = {d for s in trainer.carry.obs.addressable_shards
                  for d in [s.device]}
    assert len(shard_devs) == 8

    carry, stats = trainer._jit_chunk(trainer.carry)
    assert np.isfinite(float(stats["mean_train_reward"]))
    assert np.isfinite(float(stats["mean_train_value_loss"]))
    # learner params remain replicated (single shard spanning the mesh)
    p0 = jax.tree_util.tree_leaves(carry.algo.policy_params)[0]
    assert p0.sharding.is_fully_replicated


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_chunk_with_bf16_ring():
    """replay_bf16 composes with explicit sharding: the bf16 ring leaves
    get lane-axis shardings like their f32 counterparts and a sharded
    chunk still produces finite stats."""
    env = make_env("case33", EnvConfig(episode_limit=16), days=8,
                   dtype=jnp.float32)
    info = env.get_env_info()
    cfg, _ = load_config("mappo")
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], max_steps=8, behaviour_update_freq=4,
        batch_size=4, value_update_epochs=1, policy_update_epochs=1,
        replay_buffer_size=64, n_envs=16, num_eval_episodes=2, hid_size=32,
        replay_bf16=True)
    model = make_model("mappo", cfg)
    mesh = make_env_mesh(jax.devices()[:8])
    trainer = ShardedPGTrainer(cfg, model, env, mesh=mesh).setup(seed=0)
    assert trainer.carry.replay.data.state.dtype == jnp.bfloat16
    carry, stats = trainer._jit_chunk(trainer.carry)
    carry, stats = trainer._jit_chunk(carry)
    assert all(np.isfinite(float(v)) for v in stats.values()), stats
    shard_devs = {d for s in carry.replay.data.state.addressable_shards
                  for d in [s.device]}
    assert len(shard_devs) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_uneven_envs_rejected():
    env = make_env("case33", EnvConfig(episode_limit=8), days=8)
    info = env.get_env_info()
    cfg, _ = load_config("iddpg")
    cfg = cfg.replace(agent_num=info["n_agents"], obs_size=info["obs_shape"],
                      action_dim=info["n_actions"], n_envs=12)
    model = make_model("iddpg", cfg)
    with pytest.raises(ValueError, match="divisible"):
        ShardedPGTrainer(cfg, model, env, mesh=make_env_mesh(jax.devices()[:8]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("alg,mode,episodic", [
    ("maddpg", "distributed", False),
    ("mappo", "distributed", False),
    ("facmaddpg", "distributed", False),
    ("coma", "distributed", True),
    ("maddpg", "decentralised", False),
])
def test_sharded_chunk_numerically_matches_unsharded(alg, mode, episodic):
    """The sharded train chunk computes the SAME math as the single-device
    one — sharding only changes layout (VERDICT r3 missing #3; r4 weak #2
    extends this to all five dryrun profiles).  Same seed, same shapes,
    f64: every carry leaf (params, opt state, env state, replay contents)
    must agree to collective-reordering tolerance.

      maddpg                — off-policy action-conditioned critic
      mappo                 — on-policy post-scan ring-value-fill
      facmaddpg             — QMIX mixer third-optimizer gradient path
      coma episodic         — EpisodeReplay (capacity, lanes, T, ...) layout
      maddpg decentralised  — zone agents + availability masking
    """
    env = make_env("case33", EnvConfig(episode_limit=16, mode=mode), days=8,
                   dtype=jnp.float64)
    info = env.get_env_info()
    cfg, _ = load_config(alg)
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], max_steps=8, behaviour_update_freq=4,
        batch_size=4, value_update_epochs=2, policy_update_epochs=1,
        replay_buffer_size=64, n_envs=16, num_eval_episodes=2, hid_size=32,
        episodic=episodic)
    model = make_model(alg, cfg)

    def run(trainer):
        carry, stats = trainer._jit_chunk(trainer.carry)
        # second chunk: update phase with a warm buffer (episodic mode:
        # second stored episode batch)
        carry, stats = trainer._jit_chunk(carry)
        if episodic:
            # the episodic update runs outside the chunk on the episode
            # cadence (reference model.py:72-96) — same fixed key both ways
            carry, upd = trainer._jit_episodic_update(
                carry, jax.random.PRNGKey(7))
            stats = {**stats, **upd}
        return carry, stats

    ref_carry, ref_stats = run(PGTrainer(cfg, model, env).setup(seed=0))

    mesh = make_env_mesh(jax.devices()[:8])
    sh_carry, sh_stats = run(
        ShardedPGTrainer(cfg, model, env, mesh=mesh).setup(seed=0))

    ref_leaves, treedef = jax.tree_util.tree_flatten(ref_carry)
    sh_leaves, sh_treedef = jax.tree_util.tree_flatten(sh_carry)
    assert treedef == sh_treedef
    for i, (a, b) in enumerate(zip(ref_leaves, sh_leaves)):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=1e-9, atol=1e-9,
            err_msg=f"carry leaf {i} diverged between sharded/unsharded")
    for k in ref_stats:
        np.testing.assert_allclose(float(ref_stats[k]), float(sh_stats[k]),
                                   rtol=1e-9, atol=1e-9, err_msg=k)
