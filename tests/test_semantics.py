"""Algorithm/runtime semantics tests: properties the smoke tests can't see.

Covers the load-bearing invariants the reference implements implicitly:
QMIX monotonic mixing (reference critics/qmix.py:59-66), MATD3's twin-Q
indicator trick (reference models/matd3.py:64-82), ring-replay contiguous
window sampling across the wrap point (reference replay_buffer.py:19-29),
episode-pool sampling (replay_buffer.py:46-52), soft target updates
(model.py:27-37), Gaussian log-density/action translation utilities
(util.py:52-135), and the PPO GAE recursion (learning_algorithms/ppo.py:46-54).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapdn_tpu.algos.base import soft_update
from mapdn_tpu.learn import replay as rb
from mapdn_tpu.learn.losses import gae_advantages
from mapdn_tpu.learn.sampling import gumbel_softmax_sample, normal_log_density
from mapdn_tpu.nets.critics import QMixer


# --------------------------------------------------------------------- QMIX
def test_qmixer_monotone_in_agent_qs():
    """dq_tot/dq_i >= 0 for all agents: the abs-weight hypernetwork must make
    the mixer monotone (the property QMIX's argmax-consistency rests on)."""
    n, sdim, b = 5, 17, 6
    mixer = QMixer(n_agents=n, state_dim=sdim, embed_dim=8,
                   hypernet_layers=2, hypernet_embed=16)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    qs = jax.random.normal(k1, (b, n))
    states = jax.random.normal(k2, (b, sdim))
    params = mixer.init(k3, qs, states)

    grad = jax.vmap(jax.grad(
        lambda q, s: mixer.apply(params, q[None], s[None])[0, 0]))(qs, states)
    assert np.all(np.asarray(grad) >= -1e-7), grad

    # and gradients actually flow (not trivially zero)
    assert float(jnp.max(jnp.abs(grad))) > 1e-4


def test_qmixer_gating_and_skip_variants():
    n, sdim = 3, 9
    for gated, skip in [(True, False), (False, True), (True, True)]:
        mixer = QMixer(n_agents=n, state_dim=sdim, embed_dim=8,
                       hypernet_layers=1, gated=gated, skip_connections=skip)
        qs = jnp.ones((2, n))
        st = jnp.ones((2, sdim))
        params = mixer.init(jax.random.PRNGKey(1), qs, st)
        out = mixer.apply(params, qs, st)
        assert out.shape == (2, 1)
        assert np.all(np.isfinite(np.asarray(out)))


# -------------------------------------------------------------------- MATD3
def test_matd3_twin_heads_differ_and_min_targets():
    """The shared-critic twin trick: the 0/1 indicator input must actually
    split the heads (reference matd3.py:64-82 concatenates the indicator)."""
    from mapdn_tpu.algos import make_model
    from mapdn_tpu.utils.config import load_config

    cfg, _ = load_config("matd3")
    cfg = cfg.replace(agent_num=3, obs_size=8, action_dim=1, hid_size=16)
    model = make_model("matd3", cfg)
    state = model.init_state(jax.random.PRNGKey(0))

    obs = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 8))
    act = jnp.tanh(jax.random.normal(jax.random.PRNGKey(2), (4, 3, 1)))
    q1, q2 = model.value(state.value_params, obs, act)
    assert q1.shape == q2.shape == (4, 3)
    # freshly initialized random params: heads must not coincide
    assert float(jnp.max(jnp.abs(q1 - q2))) > 1e-6


# ------------------------------------------------------------------- replay
def test_replay_window_contiguous_across_wrap():
    """After the ring wraps, a sampled window must still be time-contiguous
    in logical (oldest-first) order — the exact analog of the reference's
    truncated-episode window (replay_buffer.py:19-23)."""
    capacity, n_env = 8, 2
    example = {"x": jnp.zeros((n_env,), jnp.float32)}
    state = rb.init_replay(capacity, example)
    # write 13 steps tagged 0..12 -> buffer holds logical [5..12], wrapped
    for i in range(13):
        state = rb.add(state, {"x": jnp.full((n_env,), float(i))})
    assert int(state.size) == capacity

    batch = rb.sample_window(state, jax.random.PRNGKey(0), 4)
    x = np.asarray(batch["x"])[:, 0]
    assert x.shape == (4,)
    diffs = np.diff(x)
    assert np.all(diffs == 1.0), x          # contiguous
    assert x[0] >= 5 and x[-1] <= 12        # inside the retained region


def test_replay_whole_buffer_roll_branch():
    """capacity == batch_size branch un-rotates the ring with a roll."""
    capacity, n_env = 4, 3
    state = rb.init_replay(capacity, {"x": jnp.zeros((n_env,))})
    for i in range(6):   # ptr wraps to 2; logical order is 2,3,4,5
        state = rb.add(state, {"x": jnp.full((n_env,), float(i))})
    batch = rb.sample_window(state, jax.random.PRNGKey(0), 4)
    np.testing.assert_allclose(np.asarray(batch["x"])[:, 0], [2, 3, 4, 5])


def test_episode_replay_slot_lane_pick():
    capacity, t, n_env = 3, 5, 4
    example = {"x": jnp.zeros((n_env,), jnp.float32)}
    state = rb.init_episode_replay(capacity, example, t)
    # episode e: rows (e*100 + step*10 + lane)
    for e in range(2):
        traj = {"x": jnp.asarray(
            [[e * 100 + s * 10 + l for l in range(n_env)] for s in range(t)],
            jnp.float32)}
        state = rb.add_episode(state, traj)
    batch = rb.sample_episodes(state, jax.random.PRNGKey(1), 6)
    x = np.asarray(batch["x"])  # (T, 6)
    assert x.shape == (t, 6)
    # every sampled column must be one coherent (episode, lane) trajectory
    for j in range(6):
        lane = x[0, j] % 10
        ep = x[0, j] // 100
        np.testing.assert_allclose(
            x[:, j], [ep * 100 + s * 10 + lane for s in range(t)])


# ------------------------------------------------------------ sampling utils
def test_soft_update_formula():
    t = {"w": jnp.asarray([1.0, 2.0])}
    s = {"w": jnp.asarray([3.0, 6.0])}
    out = soft_update(t, s, 0.25)
    np.testing.assert_allclose(np.asarray(out["w"]), [1.5, 3.0])


def test_normal_log_density_closed_form():
    x = jnp.asarray([0.3])
    mean = jnp.asarray([0.1])
    log_std = jnp.asarray([-0.5])
    got = float(normal_log_density(x, mean, log_std)[0])
    sd = np.exp(-0.5)
    want = -0.5 * np.log(2 * np.pi) - (-0.5) - (0.3 - 0.1) ** 2 / (2 * sd**2)
    # sign/arrangement: -((x-mu)^2)/(2 sd^2) - log_std - log(sqrt(2pi))
    assert abs(got - want) < 1e-5


def test_gumbel_softmax_low_temperature_near_onehot():
    logits = jnp.asarray([[2.0, -1.0, 0.5, -3.0]])
    s = gumbel_softmax_sample(jax.random.PRNGKey(0), logits, temperature=0.01)
    s = np.asarray(s)[0]
    assert abs(s.sum() - 1.0) < 1e-4
    assert s.max() > 0.99


def test_translate_actions_decentralised_routing():
    """Zone agents emit n_sgen-wide rows; the env must route each sgen's
    action from its own zone's agent (reference voltage_control_env.py:345-362
    avail-actions mask)."""
    from mapdn_tpu.envs import EnvConfig, make_env

    env = make_env("case33", EnvConfig(mode="decentralised", episode_limit=8),
                   days=4)
    n_agents, n_sgen = env.n_agents, env.grid.n_sgen
    # agent z emits constant z+1 on every slot
    a = jnp.broadcast_to(
        jnp.arange(1, n_agents + 1, dtype=jnp.float32)[:, None] / n_agents,
        (n_agents, n_sgen))
    out = np.asarray(env.translate_actions(a))
    avail = np.asarray(env.avail_actions)
    lo, hi = env.action_low, env.action_high
    for j in range(n_sgen):
        z = int(np.argmax(avail[:, j]))
        raw = (z + 1) / n_agents
        want = 0.5 * (np.clip(raw, -1, 1) + 1) * (hi - lo) + lo
        assert abs(out[j] - want) < 1e-5


# ----------------------------------------------------------------------- GAE
def test_gae_advantages_matches_numpy_reference():
    """Drive the GAE recursion ppo_loss actually calls
    (mapdn_tpu.learn.losses.gae_advantages) against a hand-rolled backward
    loop (reference learning_algorithms/ppo.py:46-54)."""
    T, L, n = 6, 2, 3
    rng = np.random.default_rng(0)
    r = rng.normal(size=(T, L, n)).astype(np.float32)
    v = rng.normal(size=(T, L, n)).astype(np.float32)
    nv = rng.normal(size=(T, L, n)).astype(np.float32)
    done = (rng.random((T, L)) < 0.3).astype(np.float32)
    last_step = done.copy()
    gamma, lam = 0.99, 0.95

    mask = np.where(last_step[..., None] > 0, 1.0 - done[..., None], 1.0)

    got = np.asarray(gae_advantages(
        jnp.asarray(r), jnp.asarray(nv), jnp.asarray(v), jnp.asarray(mask),
        gamma, lam))

    want = np.zeros_like(r)
    last = np.zeros((L, n), np.float32)
    for t in reversed(range(T)):
        delta = r[t] + gamma * nv[t] * mask[t] - v[t]
        last = delta + gamma * lam * last * mask[t]
        want[t] = last
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_ppo_loss_uses_gae_advantages(monkeypatch):
    """A regression in the wiring (ppo_loss not consuming gae_advantages)
    must be caught: patch the function and assert the loss changes."""
    from mapdn_tpu.algos import make_model
    from mapdn_tpu.learn import losses
    from mapdn_tpu.utils.config import load_config
    from mapdn_tpu.algos.base import Transition

    cfg, _ = load_config("mappo")
    cfg = cfg.replace(agent_num=2, obs_size=5, action_dim=1, hid_size=8,
                      normalize_advantages=False)
    model = make_model("mappo", cfg)
    state = model.init_state(jax.random.PRNGKey(0))

    T, L, n, o, a, h = 4, 3, 2, 5, 1, 8
    rng = np.random.default_rng(1)
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    batch = Transition(
        state=f(T, L, n, o), action=jnp.tanh(f(T, L, n, a)),
        log_prob_a=f(T, L, n, a) * 0.1, value=f(T, L, n),
        next_value=f(T, L, n), reward=f(T, L, n), next_state=f(T, L, n, o),
        done=jnp.zeros((T, L), jnp.float32),
        last_step=jnp.zeros((T, L), jnp.float32),
        last_hid=jnp.zeros((T, L, n, h), jnp.float32),
        hid=jnp.zeros((T, L, n, h), jnp.float32))
    avail = jnp.ones((n, a))
    key = jax.random.PRNGKey(2)

    pl0, _, _ = model.get_loss(state, batch, avail, key)
    monkeypatch.setattr(losses, "gae_advantages",
                        lambda r, *a, **kw: jnp.ones_like(r))
    pl1, _, _ = model.get_loss(state, batch, avail, key)
    assert abs(float(pl0) - float(pl1)) > 1e-8, (
        "ppo_loss no longer consumes losses.gae_advantages")


def test_policy_log_density_consistent_with_rollout():
    """The loss-side density of a stored tanh-squashed action must equal the
    rollout-side corrected density select_action_continuous returned for it
    (the reference evaluates N(y) on the squashed y, ppo.py:30-31, breaking
    the PPO ratio against its own stored log-probs)."""
    from mapdn_tpu.learn.sampling import (
        policy_log_density, select_action_continuous)

    class C:
        action_enforcebound = True
        clip_c = 1.0

    key = jax.random.PRNGKey(0)
    means = jnp.asarray(np.random.default_rng(0).normal(size=(64, 3, 1)),
                        jnp.float32)
    log_stds = jnp.zeros_like(means)
    y, logp_rollout = select_action_continuous(
        C, key, means, log_stds, status="train", exploration=True)
    logp_loss = policy_log_density(C, y, means, log_stds)
    np.testing.assert_allclose(np.asarray(logp_loss),
                               np.asarray(logp_rollout), rtol=1e-3, atol=1e-4)


def test_ppo_gae_value_target_wiring():
    """ppo_value_target='gae': the critic target must be exactly
    advantages + old values (fixed within the update), not the live-critic
    bootstrap (the reference-parity default, ppo.py:56)."""
    from mapdn_tpu.algos import make_model
    from mapdn_tpu.algos.base import Transition
    from mapdn_tpu.learn.losses import gae_advantages
    from mapdn_tpu.utils.config import load_config

    cfg, _ = load_config("mappo")
    cfg = cfg.replace(agent_num=2, obs_size=5, action_dim=1, hid_size=8,
                      normalize_advantages=False, reward_normalisation=False,
                      ppo_value_target="gae")
    model = make_model("mappo", cfg)
    state = model.init_state(jax.random.PRNGKey(0))

    T, L, n, o, a, h = 4, 3, 2, 5, 1, 8
    rng = np.random.default_rng(3)
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    done = jnp.zeros((T, L), jnp.float32)
    batch = Transition(
        state=f(T, L, n, o), action=jnp.tanh(f(T, L, n, a)),
        log_prob_a=f(T, L, n, a) * 0.1, value=jnp.zeros((T, L, n), jnp.float32),
        next_value=f(T, L, n), reward=f(T, L, n), next_state=f(T, L, n, o),
        done=done, last_step=done,
        last_hid=jnp.zeros((T, L, n, h), jnp.float32),
        hid=jnp.zeros((T, L, n, h), jnp.float32))
    avail = jnp.ones((n, a))

    # critic and old values pinned to zero: clipped branch == unclipped,
    # value_loss = coef * mean(target^2), target = gae advantages + 0
    model.value = lambda params, obs, act=None: jnp.zeros(
        (obs.shape[0], n), obs.dtype)
    _, vl, _ = model.get_loss(state, batch, avail, jax.random.PRNGKey(4))

    mask = jnp.ones((T, L, 1), jnp.float32)
    adv = gae_advantages(batch.reward, batch.next_value, batch.value, mask,
                         cfg.gamma, cfg.lambda_)
    target = np.asarray(adv).reshape(-1, n)
    want = cfg.value_loss_coef * np.mean(target**2)
    np.testing.assert_allclose(float(vl), want, rtol=1e-5)


# --------------------------------------------------- discrete action utils
class _DiscreteCfg:
    """Minimal config shim for the discrete selection branches
    (reference util.py:87-121 reads epsilon_softmax/gumbel_softmax flags)."""
    def __init__(self, epsilon_softmax=False, gumbel_softmax=False,
                 softmax_eps=0.1):
        self.epsilon_softmax = epsilon_softmax
        self.gumbel_softmax = gumbel_softmax
        self.softmax_eps = softmax_eps


def test_replay_bf16_storage_semantics():
    """cfg.replay_bf16: bulk ring fields (state/next_state/hid) are stored
    bfloat16 and upcast to f32 at sample time; small/precision-critical
    fields (log-probs, rewards, values) stay f32, and a train chunk still
    produces finite stats within bf16 rounding of the f32 run."""
    from mapdn_tpu.algos import make_model
    from mapdn_tpu.envs import EnvConfig, make_env
    from mapdn_tpu.learn.trainer import PGTrainer
    from mapdn_tpu.utils.config import load_config

    env = make_env("case33", EnvConfig(episode_limit=8), days=4,
                   dtype=jnp.float32)
    info = env.get_env_info()
    cfg, _ = load_config("mappo")
    cfg = cfg.replace(
        agent_num=info["n_agents"], obs_size=info["obs_shape"],
        action_dim=info["n_actions"], max_steps=8, behaviour_update_freq=4,
        batch_size=4, value_update_epochs=1, policy_update_epochs=1,
        replay_buffer_size=16, n_envs=4, hid_size=16, replay_bf16=True)
    model = make_model("mappo", cfg)
    tr = PGTrainer(cfg, model, env).setup(seed=0)

    d = tr.carry.replay.data
    assert d.state.dtype == jnp.bfloat16
    assert d.next_state.dtype == jnp.bfloat16
    assert d.last_hid.dtype == jnp.bfloat16
    assert d.log_prob_a.dtype == jnp.float32
    assert d.reward.dtype == jnp.float32
    assert d.value.dtype == jnp.float32

    carry, stats = tr._jit_chunk(tr.carry)
    carry, stats = tr._jit_chunk(carry)
    assert all(np.isfinite(float(v)) for v in stats.values()), stats

    # stored states match the f32 trajectory to bf16 rounding
    cfg32 = cfg.replace(replay_bf16=False)
    tr32 = PGTrainer(cfg32, make_model("mappo", cfg32), env).setup(seed=0)
    c32, _ = tr32._jit_chunk(tr32.carry)
    c16, _ = PGTrainer(cfg, model, env).setup(seed=0)._jit_chunk(
        tr.init_carry(jax.random.PRNGKey(0)))
    np.testing.assert_allclose(
        np.asarray(c16.replay.data.state, np.float32),
        np.asarray(c32.replay.data.state, np.float32),
        rtol=1e-2, atol=1e-2)

    # upcast path: sampled batches are f32
    batch = rb.sample_window(carry.replay, jax.random.PRNGKey(0), 4)
    batch = tr._upcast_batch(batch)
    assert batch.state.dtype == jnp.float32


def test_multinomials_log_density_matches_closed_form():
    """For a hard one-hot, sum_i a_i log p_i is exactly log softmax(logits)
    at the chosen index (torch OneHotCategorical.log_prob semantics the
    reference relies on, util.py:47-50)."""
    from mapdn_tpu.learn.sampling import multinomials_log_density

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
    idx = jnp.asarray([0, 3, 5, 2])
    onehot = jax.nn.one_hot(idx, 6, dtype=jnp.float32)
    got = np.asarray(multinomials_log_density(onehot, logits))[:, 0]

    p = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    want = p[np.arange(4), np.asarray(idx)]
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # relaxed (simplex) samples: density is the convex combination of logps
    relaxed = jnp.asarray([[0.5, 0.5, 0, 0, 0, 0]], jnp.float32)
    got_r = float(multinomials_log_density(relaxed, logits[:1])[0, 0])
    np.testing.assert_allclose(got_r, 0.5 * p[0, 0] + 0.5 * p[0, 1],
                               rtol=1e-6)


def test_select_action_discrete_test_mode_greedy():
    from mapdn_tpu.learn.sampling import select_action_discrete

    logits = jnp.asarray([[0.1, 2.0, -1.0], [3.0, 0.0, 0.5]], jnp.float32)
    actions, logp = select_action_discrete(
        _DiscreteCfg(), jax.random.PRNGKey(0), logits, status="test")
    assert logp is None
    np.testing.assert_array_equal(np.asarray(actions),
                                  [[0, 1, 0], [1, 0, 0]])


def test_select_action_discrete_epsilon_softmax_distribution():
    """epsilon-softmax sampling (reference util.py:89-96): empirical
    frequencies must match (1-eps)*softmax + eps/n, and log_prob must be the
    log of that smoothed distribution at the drawn index."""
    from mapdn_tpu.learn.sampling import select_action_discrete

    cfg = _DiscreteCfg(epsilon_softmax=True, softmax_eps=0.2)
    logits = jnp.asarray([[1.0, 0.0, -1.0]], jnp.float32)
    n_samp = 4000
    keys = jax.random.split(jax.random.PRNGKey(1), n_samp)
    sample = jax.jit(lambda k: select_action_discrete(
        cfg, k, logits, status="train", exploration=True))
    acts = np.stack([np.asarray(sample(k)[0][0]) for k in keys])
    freq = acts.mean(axis=0)
    probs = 0.8 * np.asarray(jax.nn.softmax(logits, -1))[0] + 0.2 / 3
    np.testing.assert_allclose(freq, probs, atol=0.03)

    a0, lp0 = sample(keys[0])
    idx = int(np.argmax(np.asarray(a0)[0]))
    np.testing.assert_allclose(float(lp0[0, 0]), np.log(probs[idx]),
                               rtol=1e-5)


def test_select_action_discrete_gumbel_paths():
    """gumbel_softmax branch: exploration returns a differentiable simplex
    point; no-exploration returns a detached T=1 sample (reference
    util.py:97-113)."""
    from mapdn_tpu.learn.sampling import select_action_discrete

    cfg = _DiscreteCfg(gumbel_softmax=True)
    logits = jnp.asarray([[1.0, 0.0, -0.5]], jnp.float32)

    a, lp = select_action_discrete(cfg, jax.random.PRNGKey(2), logits,
                                   status="train", exploration=True)
    np.testing.assert_allclose(float(jnp.sum(a)), 1.0, rtol=1e-5)
    assert lp.shape == (1, 1)

    # exploration path is differentiable w.r.t. logits (rsample)
    g = jax.grad(lambda lg: jnp.sum(select_action_discrete(
        cfg, jax.random.PRNGKey(2), lg, status="train",
        exploration=True)[0] ** 2))(logits)
    assert float(jnp.max(jnp.abs(g))) > 0

    # no-exploration path is detached (stop_gradient)
    g2 = jax.grad(lambda lg: jnp.sum(select_action_discrete(
        cfg, jax.random.PRNGKey(2), lg, status="train",
        exploration=False)[0] ** 2))(logits)
    np.testing.assert_allclose(np.asarray(g2), 0.0, atol=1e-12)


def test_select_action_discrete_plain_categorical():
    """Default branch: plain categorical one-hot whose empirical law matches
    softmax(logits) (reference util.py:114-121)."""
    from mapdn_tpu.learn.sampling import select_action_discrete

    cfg = _DiscreteCfg()
    logits = jnp.asarray([[0.5, -0.5, 1.5]], jnp.float32)
    n_samp = 4000
    keys = jax.random.split(jax.random.PRNGKey(3), n_samp)
    sample = jax.jit(lambda k: select_action_discrete(
        cfg, k, logits, status="train", exploration=True))
    acts = np.stack([np.asarray(sample(k)[0][0]) for k in keys])
    np.testing.assert_allclose(acts.mean(axis=0),
                               np.asarray(jax.nn.softmax(logits, -1))[0],
                               atol=0.03)
