"""Coverage for implemented-but-previously-untested paths.

Pins the behaviours VERDICT r1 flagged as dark: every remaining algorithm
family driven through the fused train chunk (MAAC soft-AC, FACMADDPG's
third mixer-optimizer epochs, SQDDPG coalition sampling, COMA's
counterfactual baseline), obs-history stacking (reference
voltage_control_env.py:303-315), decentralised-mode end-to-end training
(reference mode switch :79-84), and the trainer's whole-chunk critic
forward matching the per-step one.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapdn_tpu.algos import make_model
from mapdn_tpu.envs import EnvConfig, make_env
from mapdn_tpu.learn.trainer import PGTrainer
from mapdn_tpu.utils.config import load_config


def small_trainer(alg, *, mode="distributed", n_envs=2, **cfg_over):
    env = make_env("case33", EnvConfig(episode_limit=8, mode=mode), days=8,
                   dtype=jnp.float32)
    info = env.get_env_info()
    cfg, _ = load_config(alg)
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], max_steps=8, behaviour_update_freq=4,
        batch_size=4, value_update_epochs=1, policy_update_epochs=1,
        target_update_freq=8, n_envs=n_envs, num_eval_episodes=2,
        replay_buffer_size=64, hid_size=32, sample_size=3, **cfg_over)
    model = make_model(alg, cfg)
    return PGTrainer(cfg, model, env).setup(seed=0), cfg


# ------------------------------------------------- remaining algorithm zoo
@pytest.mark.parametrize("alg", ["maac", "sqddpg", "coma"])
def test_trainer_smoke_through_fused_chunk(alg):
    trainer, _ = small_trainer(alg)
    p0 = jax.tree_util.tree_leaves(trainer.carry.algo.policy_params)[0].copy()
    stats = trainer.run_episode()
    assert np.isfinite(stats["mean_train_reward"]), alg
    assert np.isfinite(stats["mean_train_value_loss"]), alg
    p1 = jax.tree_util.tree_leaves(trainer.carry.algo.policy_params)[0]
    assert float(jnp.max(jnp.abs(p1 - p0))) > 0, f"{alg} params never updated"


def test_trainer_facmaddpg_mixer_epochs_update_mixer():
    """FACMADDPG runs the third (mixer) optimizer inside the chunk
    (reference trainer.py:68-71 mixer_replay_process)."""
    trainer, cfg = small_trainer("facmaddpg", mixer_update_epochs=1)
    assert trainer.model.uses_mixer and cfg.mixer_update_epochs == 1
    m0 = jax.tree_util.tree_leaves(trainer.carry.algo.mixer_params)[0].copy()
    stats = trainer.run_episode()
    assert np.isfinite(stats["mean_train_mixer_loss"])
    m1 = jax.tree_util.tree_leaves(trainer.carry.algo.mixer_params)[0]
    assert float(jnp.max(jnp.abs(m1 - m0))) > 0, "mixer params never updated"


# -------------------------------------------------------- decentralised e2e
def test_decentralised_mode_trains_end_to_end():
    """Zone-agent mode through the fused chunk: multi-dim actions routed to
    zone sgens via the availability mask (reference :345-362)."""
    trainer, cfg = small_trainer("iddpg", mode="decentralised")
    assert cfg.action_dim > 1  # decentralised: n_actions = n_sgen
    avail = trainer.env.avail_actions
    assert avail.shape == (cfg.agent_num, cfg.action_dim)
    # each agent owns a strict, disjoint subset of the sgens
    assert np.all(np.sum(np.asarray(avail), axis=0) == 1)
    stats = trainer.run_episode()
    assert np.isfinite(stats["mean_train_reward"])
    assert np.isfinite(stats["mean_train_value_loss"])
    ev = trainer.evaluate()
    assert np.isfinite(ev["mean_test_reward"])


# --------------------------------------------------------- history stacking
def test_history_stacking_matches_hand_rolled():
    """history=3 obs must equal the per-agent concat of the last 3 base
    frames, oldest first (reference voltage_control_env.py:303-315 keeps a
    rolling deque of previous observations)."""
    hist = 3
    env = make_env("case33", EnvConfig(episode_limit=8, history=hist), days=8)
    base = env.obs_base_size
    assert env.obs_size == base * hist

    state, obs0, _ = env.reset(jax.random.PRNGKey(0))
    frames = list(np.asarray(state.obs_hist))     # (hist-1) pre-reset frames
    key = jax.random.PRNGKey(1)
    acts = jnp.zeros((env.n_agents, 1))

    # at reset, obs = [f_{-2}, f_{-1}, f_0] per agent
    f0 = (np.asarray(obs0).reshape(env.n_agents, hist, base))
    for t in range(3):
        key, k = jax.random.split(key)
        out = env.step(state, env.translate_actions(acts), k)
        frames.append(np.asarray(env._base_obs(out.state)))
        state, obs = out.state, out.obs
        want = np.stack(frames[-hist:], axis=1).reshape(env.n_agents, -1)
        np.testing.assert_allclose(np.asarray(obs), want, rtol=1e-6,
                                   err_msg=f"step {t}")


def test_history_training_smoke():
    env = make_env("case33", EnvConfig(episode_limit=6, history=3), days=4,
                   dtype=jnp.float32)
    info = env.get_env_info()
    cfg, _ = load_config("iddpg")
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], max_steps=6, behaviour_update_freq=3,
        batch_size=3, value_update_epochs=1, policy_update_epochs=1,
        target_update_freq=6, n_envs=2, num_eval_episodes=2,
        replay_buffer_size=32, hid_size=16)
    model = make_model("iddpg", cfg)
    trainer = PGTrainer(cfg, model, env).setup(seed=0)
    stats = trainer.run_episode()
    assert np.isfinite(stats["mean_train_reward"])


# ------------------------------------------- whole-chunk critic equivalence
def test_rollout_values_all_matches_per_step():
    """The post-scan (T*L)-batch critic forward must agree numerically with
    T per-step forwards (trainer._rollout_values_all docstring)."""
    trainer, cfg = small_trainer("mappo")
    algo = trainer.carry.algo
    t, l = 5, cfg.n_envs
    states = jax.random.normal(
        jax.random.PRNGKey(3), (t, l, cfg.agent_num, cfg.obs_size), jnp.float32)

    fused = trainer._rollout_values_all(algo, states)
    stepwise = jnp.stack(
        [trainer._rollout_value(algo, states[i], None) for i in range(t)])
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(stepwise), rtol=1e-5, atol=1e-6)


# --------------------------------------------- eval aggregation (weighting)
def test_eval_rollout_is_mean_of_per_episode_means():
    """Reference evaluation parity (model.py:281-301): each episode's stats
    are averaged over ITS OWN length (`/ float(t+1)`), then averaged over
    episodes.  With mid-rollout terminations of different lengths this
    differs from a flat alive-step-weighted mean — pin the mean-of-means."""
    from mapdn_tpu.envs.voltage_control import StepOutput

    n_agents, obs_size, n_eval, max_steps = 3, 4, 6, 8
    cfg, _ = load_config("iddpg")
    cfg = cfg.replace(agent_num=n_agents, obs_size=obs_size, action_dim=1,
                      hid_size=8, num_eval_episodes=n_eval,
                      max_steps=max_steps, n_envs=2)

    class FakeEnv:
        """Episode i: constant reward v_i, length L_i = 2 + floor(4 v_i)
        (v_i drawn from the reset key) — reward and length correlate, so
        flat and per-episode weighting disagree."""
        avail_actions = jnp.ones((n_agents, 1), jnp.float32)

        def reset(self, key):
            v = jax.random.uniform(key, dtype=jnp.float32)
            state = {"v": v, "t": jnp.asarray(0, jnp.int32)}
            return state, jnp.zeros((n_agents, obs_size), jnp.float32), v

        def translate_actions(self, a):
            return a

        def step(self, state, actions, key):
            t = state["t"] + 1
            length = 2 + jnp.floor(state["v"] * 4.0).astype(jnp.int32)
            return StepOutput(
                state={"v": state["v"], "t": t},
                obs=jnp.zeros((n_agents, obs_size), jnp.float32),
                global_state=state["v"],
                reward=state["v"],
                terminated=t >= length,
                info={"metric": 2.0 * state["v"]})

    model = make_model("iddpg", cfg)
    trainer = PGTrainer(cfg, model, FakeEnv())
    algo = model.init_state(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(42)
    stats = jax.jit(trainer._eval_rollout)(algo, key)

    # hand-rolled expectation from the same key derivation _eval_rollout uses
    k_env, _ = jax.random.split(key)
    env_keys = jax.random.split(k_env, n_eval)
    v = np.asarray(jax.vmap(
        lambda k: jax.random.uniform(k, dtype=jnp.float32))(env_keys))
    lengths = 2 + np.floor(v * 4.0).astype(int)
    assert len(set(lengths.tolist())) > 1, "need varying episode lengths"

    mean_of_means = v.mean()                       # reference semantics
    flat = (v * lengths).sum() / lengths.sum()     # the wrong weighting
    assert abs(mean_of_means - flat) > 1e-3, "degenerate draw; pick new key"

    np.testing.assert_allclose(float(stats["mean_test_reward"]),
                               mean_of_means, rtol=1e-5)
    np.testing.assert_allclose(float(stats["mean_test_metric"]),
                               2.0 * mean_of_means, rtol=1e-5)


# ---------------------------------------------------- fused-episode parity
def test_fused_episode_matches_per_chunk_loop():
    """run_episode's single-dispatch fused path (scan over chunks with
    in-graph boundary-crossing target updates) must reproduce the python
    per-chunk loop: same step counters and numerically identical training
    state after episodes that cross a target_update_freq boundary."""
    # default small config: chunk=4, target_update_freq=8 -> the boundary
    # crossing fires after the 2nd chunk of each episode
    tr_a, cfg = small_trainer("matd3")
    tr_b, _ = small_trainer("matd3")
    assert tr_a._fuse_episode
    tr_b._fuse_episode = False

    for _ in range(2):
        sa = tr_a.run_episode()
        sb = tr_b.run_episode()
    assert tr_a.steps == tr_b.steps and tr_a.episodes == tr_b.episodes
    assert abs(sa["mean_train_reward"] - sb["mean_train_reward"]) < 1e-5

    la = jax.tree_util.tree_leaves(tr_a.carry.algo)
    lb = jax.tree_util.tree_leaves(tr_b.carry.algo)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
