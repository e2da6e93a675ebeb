"""Algorithm zoo: loss/grad smoke for all 10 algorithms + trainer smoke.

The reference has no tests; this is SURVEY.md section 4 item (d): algorithm
smoke tests on case33.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapdn_tpu.algos import MODEL_REGISTRY, make_model
from mapdn_tpu.algos.base import Transition
from mapdn_tpu.utils.config import load_config

N_AGENTS, OBS, ACT, HID = 4, 12, 1, 16


def tiny_cfg(alg):
    cfg, _ = load_config(alg)
    return cfg.replace(
        agent_num=N_AGENTS, obs_size=OBS, action_dim=ACT, hid_size=HID,
        sample_size=3)


def fake_batch(key, T=4, L=2):
    ks = jax.random.split(key, 8)
    f = jnp.float32
    z = lambda k, *s: jax.random.normal(k, (T, L) + s, f)
    done = (jax.random.uniform(ks[6], (T, L)) < 0.2).astype(f)
    return Transition(
        state=z(ks[0], N_AGENTS, OBS),
        action=jnp.tanh(z(ks[1], N_AGENTS, ACT)),
        log_prob_a=z(ks[2], N_AGENTS, ACT) * 0.1,
        value=z(ks[3], N_AGENTS),
        next_value=z(ks[4], N_AGENTS),
        reward=jnp.broadcast_to(z(ks[5], 1), (T, L, N_AGENTS)),
        next_state=z(ks[7], N_AGENTS, OBS),
        done=done,
        last_step=done,
        last_hid=jnp.zeros((T, L, N_AGENTS, HID), f),
        hid=jnp.zeros((T, L, N_AGENTS, HID), f))


@pytest.mark.parametrize("alg", sorted(MODEL_REGISTRY))
def test_loss_and_grads_finite(alg):
    cfg = tiny_cfg(alg)
    model = make_model(alg, cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    batch = fake_batch(jax.random.PRNGKey(1))
    avail = jnp.ones((N_AGENTS, ACT))
    key = jax.random.PRNGKey(2)

    pl, vl, (means, log_stds) = model.get_loss(state, batch, avail, key)
    assert np.isfinite(float(pl)) and np.isfinite(float(vl))
    assert means.shape[-1] == ACT

    if alg == "random":
        return

    def ploss(p):
        return model.get_loss(
            state.replace(policy_params=p), batch, avail, key)[0]

    def vloss(p):
        return model.get_loss(
            state.replace(value_params=p), batch, avail, key)[1]

    g_p = jax.grad(ploss)(state.policy_params)
    g_v = jax.grad(vloss)(state.value_params)
    for g, name in [(g_p, "policy"), (g_v, "value")]:
        norms = [float(jnp.sum(jnp.abs(x)))
                 for x in jax.tree_util.tree_leaves(g)]
        assert all(np.isfinite(n) for n in norms), f"{alg} {name} grads NaN"
        assert sum(norms) > 0, f"{alg} {name} grads all zero"


def test_trainer_smoke_iddpg():
    from mapdn_tpu.envs import EnvConfig, make_env
    from mapdn_tpu.learn.trainer import PGTrainer

    env = make_env("case33", EnvConfig(episode_limit=8), days=8,
                   dtype=jnp.float32)
    info = env.get_env_info()
    cfg, _ = load_config("iddpg")
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], max_steps=8, behaviour_update_freq=4,
        batch_size=4, value_update_epochs=2, policy_update_epochs=1,
        target_update_freq=8, n_envs=2, num_eval_episodes=2,
        replay_buffer_size=64, hid_size=32)
    model = make_model("iddpg", cfg)
    trainer = PGTrainer(cfg, model, env).setup(seed=0)

    p0 = jax.tree_util.tree_leaves(trainer.carry.algo.policy_params)[0].copy()
    stats = trainer.run_episode()
    assert np.isfinite(stats["mean_train_reward"])
    assert np.isfinite(stats["mean_train_value_loss"])
    stats2 = trainer.run_episode()
    p1 = jax.tree_util.tree_leaves(trainer.carry.algo.policy_params)[0]
    assert float(jnp.max(jnp.abs(p1 - p0))) > 0, "policy params never updated"

    ev = trainer.evaluate()
    assert np.isfinite(ev["mean_test_reward"])


def test_trainer_smoke_mappo_onpolicy():
    from mapdn_tpu.envs import EnvConfig, make_env
    from mapdn_tpu.learn.trainer import PGTrainer

    env = make_env("case33", EnvConfig(episode_limit=8), days=8,
                   dtype=jnp.float32)
    info = env.get_env_info()
    cfg, _ = load_config("mappo")
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], max_steps=8, behaviour_update_freq=8,
        batch_size=8, value_update_epochs=2, policy_update_epochs=2,
        target_update_freq=8, n_envs=2, num_eval_episodes=2,
        replay_buffer_size=32, hid_size=32)
    model = make_model("mappo", cfg)
    trainer = PGTrainer(cfg, model, env).setup(seed=0)
    stats = trainer.run_episode()
    assert np.isfinite(stats["mean_train_policy_loss"])
    # on-policy: buffer cleared after the update
    assert int(trainer.carry.replay.size) == 0


def test_target_update_fires_on_boundary_crossing():
    """target_update_freq that the chunk length does NOT divide must still
    fire soft updates (on every crossed boundary), not silently never
    (regression: exact-divisibility check missed freq=6 with chunk=4)."""
    from mapdn_tpu.envs import EnvConfig, make_env
    from mapdn_tpu.learn.trainer import PGTrainer

    env = make_env("case33", EnvConfig(episode_limit=8), days=4,
                   dtype=jnp.float32)
    info = env.get_env_info()
    cfg, _ = load_config("iddpg")
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], max_steps=8, behaviour_update_freq=4,
        batch_size=4, value_update_epochs=1, policy_update_epochs=1,
        target_update_freq=6,  # 4 and 8 are not multiples of 6
        n_envs=2, num_eval_episodes=2, replay_buffer_size=64, hid_size=16,
        replay_warmup=0)
    model = make_model("iddpg", cfg)
    trainer = PGTrainer(cfg, model, env).setup(seed=0)

    t0 = jax.tree_util.tree_leaves(
        trainer.carry.algo.target_policy_params)[0].copy()
    trainer.run_episode()   # chunks end at steps 4, 8; 8//6 > 4//6 -> fires
    t1 = jax.tree_util.tree_leaves(trainer.carry.algo.target_policy_params)[0]
    assert float(jnp.max(jnp.abs(t1 - t0))) > 0, (
        "soft target update never fired across the freq boundary")


def test_episodic_mode_trains():
    """cfg.episodic: whole-episode replay + episode-cadence updates
    (reference model.py:72-96 / replay_buffer.py:33-58)."""
    from mapdn_tpu.envs import EnvConfig, make_env
    from mapdn_tpu.algos import make_model
    from mapdn_tpu.learn.trainer import PGTrainer
    from mapdn_tpu.utils.config import load_config

    env = make_env("case33", EnvConfig(episode_limit=6), days=2)
    info = env.get_env_info()
    cfg, _ = load_config("iddpg")
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], n_envs=3, max_steps=6,
        episodic=True, behaviour_update_freq=2, target_update_freq=4,
        batch_size=2, replay_buffer_size=12,
        value_update_epochs=2, policy_update_epochs=1, num_eval_episodes=2)
    model = make_model("iddpg", cfg)
    trainer = PGTrainer(cfg, model, env).setup(seed=0)
    s1 = trainer.run_episode()          # no update yet (1 % 2 != 0)
    assert "mean_train_value_loss" not in s1
    s2 = trainer.run_episode()          # update fires at episode 2
    assert "mean_train_value_loss" in s2
    assert np.isfinite(s2["mean_train_value_loss"])
    assert np.isfinite(s2["mean_train_reward"])
