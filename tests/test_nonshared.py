"""Non-shared per-agent parameters (``shared_params: False``).

The reference builds one module per agent in Python ModuleLists
(reference models/model.py:111-139 for policies, per-algo value_dicts e.g.
iddpg.py:25-28); here the same function class is realized as a stacked
leading-agent-axis parameter tree applied with vmap.  These tests pin:
params really are per-agent (stacked + functionally distinct), losses and
gradients stay finite for every supporting algorithm, and training runs
end-to-end for IDDPG (off-policy) and MAPPO (on-policy central critic).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapdn_tpu.algos import MODEL_REGISTRY, make_model
from mapdn_tpu.utils.config import load_config

from test_algos import N_AGENTS, OBS, ACT, HID, fake_batch, tiny_cfg

NONSHARED_ALGS = sorted(a for a in MODEL_REGISTRY if a not in ("maac", "random"))


def nonshared_cfg(alg):
    return tiny_cfg(alg).replace(shared_params=False)


def test_policy_params_are_stacked_per_agent():
    cfg = nonshared_cfg("iddpg")
    model = make_model("iddpg", cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    for leaf in jax.tree_util.tree_leaves(state.policy_params):
        assert leaf.shape[0] == N_AGENTS, leaf.shape
    for leaf in jax.tree_util.tree_leaves(state.value_params):
        assert leaf.shape[0] == N_AGENTS, leaf.shape


def test_agents_with_identical_obs_act_differently():
    """Distinct per-agent params must break the symmetry that shared params
    + agent-id one-hots would otherwise carry entirely."""
    cfg = nonshared_cfg("iddpg").replace(agent_id=False)
    model = make_model("iddpg", cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    obs = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(1), (1, 1, OBS)),
        (1, N_AGENTS, OBS))
    hid = model.init_hidden(1)
    means, _, _ = model.policy(state.policy_params, obs, hid)
    spread = float(jnp.max(jnp.abs(means - means[:, :1])))
    assert spread > 1e-6, "per-agent policies collapsed to one function"


def test_shared_and_nonshared_same_function_class():
    """A non-shared stack whose every slice holds the SAME params must
    reproduce the shared forward exactly (the vmap is a pure re-indexing)."""
    cfg_s = tiny_cfg("iddpg")
    model_s = make_model("iddpg", cfg_s)
    state = model_s.init_state(jax.random.PRNGKey(0))

    cfg_n = nonshared_cfg("iddpg")
    model_n = make_model("iddpg", cfg_n)
    stacked = jax.tree_util.tree_map(
        lambda p: jnp.broadcast_to(p[None], (N_AGENTS,) + p.shape),
        state.policy_params)

    obs = jax.random.normal(jax.random.PRNGKey(1), (3, N_AGENTS, OBS))
    hid = model_s.init_hidden(3)
    m_s, ls_s, h_s = model_s.policy(state.policy_params, obs, hid)
    m_n, ls_n, h_n = model_n.policy(stacked, obs, hid)
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_n), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_s), np.asarray(h_n), atol=1e-6)


@pytest.mark.parametrize("alg", NONSHARED_ALGS)
def test_nonshared_loss_and_grads_finite(alg):
    cfg = nonshared_cfg(alg)
    model = make_model(alg, cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    batch = fake_batch(jax.random.PRNGKey(1))
    avail = jnp.ones((N_AGENTS, ACT))
    key = jax.random.PRNGKey(2)

    pl, vl, _ = model.get_loss(state, batch, avail, key)
    assert np.isfinite(float(pl)) and np.isfinite(float(vl))

    g_p = jax.grad(lambda p: model.get_loss(
        state.replace(policy_params=p), batch, avail, key)[0])(
            state.policy_params)
    g_v = jax.grad(lambda p: model.get_loss(
        state.replace(value_params=p), batch, avail, key)[1])(
            state.value_params)
    for g, name in [(g_p, "policy"), (g_v, "value")]:
        norms = [float(jnp.sum(jnp.abs(x)))
                 for x in jax.tree_util.tree_leaves(g)]
        assert all(np.isfinite(n) for n in norms), f"{alg} {name} grads NaN"
        assert sum(norms) > 0, f"{alg} {name} grads all zero"


def test_maac_nonshared_raises():
    with pytest.raises(NotImplementedError):
        make_model("maac", nonshared_cfg("maac"))


@pytest.mark.parametrize("alg", ["iddpg", "mappo"])
def test_trainer_smoke_nonshared(alg):
    from mapdn_tpu.envs import EnvConfig, make_env
    from mapdn_tpu.learn.trainer import PGTrainer

    env = make_env("case33", EnvConfig(episode_limit=8), days=8,
                   dtype=jnp.float32)
    info = env.get_env_info()
    cfg, _ = load_config(alg)
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], max_steps=8, behaviour_update_freq=4,
        batch_size=4, value_update_epochs=2, policy_update_epochs=1,
        target_update_freq=8, n_envs=2, num_eval_episodes=2,
        replay_buffer_size=64, hid_size=32, shared_params=False)
    model = make_model(alg, cfg)
    trainer = PGTrainer(cfg, model, env).setup(seed=0)

    p0 = jax.tree_util.tree_leaves(trainer.carry.algo.policy_params)[0].copy()
    stats = trainer.run_episode()
    assert np.isfinite(stats["mean_train_reward"])
    p1 = jax.tree_util.tree_leaves(trainer.carry.algo.policy_params)[0]
    assert float(jnp.max(jnp.abs(p1 - p0))) > 0, "policy params never updated"
    ev = trainer.evaluate()
    assert np.isfinite(ev["mean_test_reward"])
