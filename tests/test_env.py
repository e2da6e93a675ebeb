"""Environment semantics tests (pure functions, shapes, reward, destroy).

Mirrors SURVEY.md section 4's prescribed test pyramid item (b): pure-function
env tests against closed-form values and reference-documented behavior.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapdn_tpu.envs import EnvConfig, make_env
from mapdn_tpu.envs.barriers import BARRIERS


def test_barriers_closed_form():
    v = jnp.asarray([0.9, 0.95, 1.0, 1.05, 1.1])
    np.testing.assert_allclose(BARRIERS["l1"](v), np.abs(np.asarray(v) - 1.0), atol=1e-12)
    np.testing.assert_allclose(BARRIERS["l2"](v), 2 * (np.asarray(v) - 1.0) ** 2, atol=1e-12)
    cb = BARRIERS["courant_beltrami"](v)
    np.testing.assert_allclose(cb, [0.0025, 0, 0, 0, 0.0025], atol=1e-12)
    # bowl: linear branch outside the 0.05 band, gaussian inside
    b = BARRIERS["bowl"](jnp.asarray([0.9, 1.0]))
    assert abs(float(b[0]) - (2 * 0.1 - 0.095)) < 1e-9
    assert abs(float(b[1]) - (-0.01 / np.sqrt(2 * np.pi * 0.01) + 0.04)) < 1e-9
    # bump: reference piecewise shape at v ~ 1 pu
    bp = BARRIERS["bump"](jnp.asarray([0.98, 1.02]))
    assert float(bp[0]) == pytest.approx(np.exp(-1 / (1 - 0.98**4)), rel=1e-6)
    assert float(bp[1]) == pytest.approx(np.exp(-1 / (1 - (1.02 - 2) ** 4)), rel=1e-6)


@pytest.fixture(scope="module")
def env33():
    return make_env("case33", EnvConfig(episode_limit=10), days=8, dtype=jnp.float64)


def test_reset_shapes_and_env_info(env33):
    env = env33
    info = env.get_env_info()
    assert info["n_agents"] == 6 and info["n_actions"] == 1
    state, obs, gs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (6, info["obs_shape"])
    assert gs.shape == (info["state_shape"],)
    # state vector: 2*33 bus p/q + 6 pv + 6 q + 33 vm + 33 va
    assert info["state_shape"] == 66 + 6 + 6 + 33 + 33
    assert bool(jnp.all(jnp.isfinite(obs))) and bool(jnp.all(jnp.isfinite(gs)))
    # voltages solved: vm block within a sane band
    vm = state.vm
    assert 0.8 < float(vm.min()) and float(vm.max()) < 1.2


def test_step_reward_matches_formula(env33):
    env = env33
    state, obs, gs = env.reset(jax.random.PRNGKey(1))
    a = jnp.zeros(6)  # zero reactive injection
    out = env.step(state, a, jax.random.PRNGKey(2))
    # q = 0 -> reward = -mean(barrier(v)) * w_v (q_loss term zero)
    expect = -float(jnp.mean(BARRIERS["l1"](out.state.vm)))
    assert float(out.reward) == pytest.approx(expect, abs=1e-9)
    assert float(out.info["q_loss"]) == 0.0
    assert float(out.info["destroy"]) == 0.0


def test_action_to_q_mapping(env33):
    env = env33
    state, _, _ = env.reset(jax.random.PRNGKey(3))
    a = 0.5 * jnp.ones(6)
    out = env.step(state, a, jax.random.PRNGKey(4))
    cap = jnp.sqrt(jnp.maximum(env.ts.s_max**2 - state.pv_p**2, 0.0))
    np.testing.assert_allclose(np.asarray(out.state.sgen_q), np.asarray(0.5 * cap), rtol=1e-12)


def test_episode_termination_at_limit(env33):
    env = env33
    state, _, _ = env.reset(jax.random.PRNGKey(5))
    key = jax.random.PRNGKey(6)
    term = False
    for i in range(9):
        key, k = jax.random.split(key)
        out = env.step(state, jnp.zeros(6), k)
        state = out.state
        term = bool(out.terminated)
    assert term  # episode_limit=10, counter starts at 1 -> 9 steps terminate


def test_manual_reset_deterministic(env33):
    env = env33
    s1, o1, g1 = env.manual_reset(2, 10, 5)
    s2, o2, g2 = env.manual_reset(2, 10, 5)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    # no-noise steps are deterministic too
    out1 = env.step(s1, 0.1 * jnp.ones(6), jax.random.PRNGKey(0), add_noise=False)
    out2 = env.step(s2, 0.1 * jnp.ones(6), jax.random.PRNGKey(0), add_noise=False)
    np.testing.assert_array_equal(np.asarray(out1.obs), np.asarray(out2.obs))


def test_vmap_batched_env(env33):
    env = env33
    B = 5
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    states, obs, gs = jax.vmap(env.reset)(keys)
    assert obs.shape == (B, 6, env.obs_size)
    acts = jnp.zeros((B, 6))
    step_keys = jax.random.split(jax.random.PRNGKey(8), B)
    out = jax.vmap(env.step)(states, acts, step_keys)
    assert out.reward.shape == (B,)
    assert out.obs.shape == (B, 6, env.obs_size)
    assert bool(jnp.all(jnp.isfinite(out.reward)))


def test_auto_reset_restarts_lane(env33):
    env = env33
    state, _, _ = env.reset(jax.random.PRNGKey(9))
    key = jax.random.PRNGKey(10)
    # run past the episode limit with auto_reset_step; step counter must wrap
    for i in range(12):
        key, k = jax.random.split(key)
        out = env.auto_reset_step(state, jnp.zeros(6), k)
        state = out.state
    assert int(state.step) <= 10


def test_decentralised_mode():
    env = make_env("case33", EnvConfig(mode="decentralised", episode_limit=5),
                   days=8, dtype=jnp.float64)
    info = env.get_env_info()
    assert info["n_agents"] == 4          # zones
    assert info["n_actions"] == 6         # one slot per sgen
    # avail mask routes each zone's action slots
    avail = np.asarray(env.avail_actions)
    assert avail.shape == (4, 6)
    assert avail.sum() == 6.0
    state, obs, gs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape[0] == 4
    # translate: per-agent rows of n_sgen entries -> (n_sgen,) via zone mask
    agent_actions = jnp.ones((4, 6))
    sgen_acts = env.translate_actions(agent_actions)
    assert sgen_acts.shape == (6,)
    out = env.step(state, sgen_acts, jax.random.PRNGKey(1))
    assert bool(jnp.isfinite(out.reward))


def test_reset_retry_exhaustion_terminates():
    """pf_max_iter=0 makes every solve report non-convergence: after
    reset_retries failed attempts the lane must come back TERMINATED (not a
    trainable flat-profile fallback) with finite observations."""
    env = make_env("case33",
                   EnvConfig(episode_limit=8, pf_max_iter=0, reset_retries=2),
                   days=4, dtype=jnp.float64)
    state, obs, gs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert bool(state.terminated)
    assert bool(jnp.all(jnp.isfinite(obs))) and bool(jnp.all(jnp.isfinite(gs)))


def test_step_propagates_incoming_terminated(env33):
    """A lane already marked terminated (failed reset attempt) must stay
    terminated through step() so the auto-reset path re-resets it."""
    env = env33
    state, _, _ = env.reset(jax.random.PRNGKey(21))
    out_ok = env.step(state, jnp.zeros(6), jax.random.PRNGKey(22))
    assert not bool(out_ok.terminated)
    dead = state.replace(terminated=jnp.asarray(True))
    out = env.step(dead, jnp.zeros(6), jax.random.PRNGKey(22))
    assert bool(out.terminated)


def test_destroy_semantics():
    """Forced divergence (absurd load) must penalize, roll back, terminate."""
    env = make_env("case33", EnvConfig(episode_limit=240), days=8, dtype=jnp.float64)
    state, _, _ = env.reset(jax.random.PRNGKey(11))
    bad = state.replace(load_p=state.load_p * 1e4, load_q=state.load_q * 1e4)
    out = env.step(bad, jnp.zeros(6), jax.random.PRNGKey(12))
    assert float(out.info["destroy"]) == 1.0
    assert bool(out.terminated)
    assert float(out.reward) < -150.0
    # rollback: voltages kept from the pre-action state
    np.testing.assert_array_equal(np.asarray(out.state.vm), np.asarray(state.vm))


# ------------------------------------------------- golden trajectory pin
def test_golden_trajectory_replay():
    """Full-env semantics pin: a committed 48-step fixed-day no-noise
    manual_reset replay (float64 oracle path, scripts/make_golden_trajectory
    .py) must be reproduced exactly by the f64 path and within f32 rounding
    by the production dtype — the strongest available analog of validating
    against the reference's pickled telemetry (reference tester.py:19-63)
    in an environment without pandapower."""
    import json
    import os

    from mapdn_tpu.envs import EnvConfig, make_env

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "golden_trajectory.json")
    with open(path) as f:
        gold = json.load(f)
    actions = np.asarray(gold["actions"])

    for dtype, rtol, atol in [(jnp.float64, 1e-9, 1e-10),
                              (jnp.float32, 2e-3, 2e-4)]:
        env = make_env("case33",
                       EnvConfig(episode_limit=240, reset_action=False),
                       days=8, seed=0, dtype=dtype)
        state, obs, gs = env.manual_reset(gold["day"], gold["hour"],
                                          gold["quarter"])
        np.testing.assert_allclose(np.asarray(obs), gold["obs0"],
                                   rtol=rtol, atol=atol)
        np.testing.assert_allclose(np.asarray(gs), gold["state0"],
                                   rtol=rtol, atol=atol)

        step = jax.jit(env.step, static_argnames=("add_noise",))
        for t in range(gold["n_steps"]):
            out = step(state, jnp.asarray(actions[t], dtype),
                       jax.random.PRNGKey(0), add_noise=False)
            state = out.state
            assert not bool(out.terminated)
            msg = f"dtype={dtype.__name__} step={t}"
            np.testing.assert_allclose(
                float(out.reward), gold["rewards"][t], rtol=rtol,
                atol=atol, err_msg=msg)
            np.testing.assert_allclose(
                np.asarray(out.state.vm), gold["vm"][t], rtol=rtol,
                atol=atol, err_msg=msg)
            np.testing.assert_allclose(
                np.asarray(out.obs), gold["obs"][t], rtol=rtol,
                atol=5e-4 if dtype == jnp.float32 else atol, err_msg=msg)
            np.testing.assert_allclose(
                np.asarray(out.global_state), gold["states"][t],
                rtol=rtol, atol=5e-4 if dtype == jnp.float32 else atol,
                err_msg=msg)
            np.testing.assert_allclose(
                float(out.info["total_line_loss"]),
                gold["info_total_line_loss"][t], rtol=rtol,
                atol=1e-3 if dtype == jnp.float32 else atol, err_msg=msg)
            np.testing.assert_allclose(
                float(out.info["q_loss"]), gold["info_q_loss"][t],
                rtol=rtol, atol=atol, err_msg=msg)
            assert (float(out.info["percentage_of_v_out_of_control"])
                    == pytest.approx(gold["info_pct_out"][t], abs=1e-6)), msg


def test_two_bus_hand_computed_step():
    """One full transition worked out by hand on a 2-bus network, asserted
    against the env end-to-end: action -> q-clip -> NR solve -> barrier
    reward -> obs/state (reference voltage_control_env.py:548-618 semantics).

    Unlike the committed golden trajectory (self-generated by this repo's
    float64 path), every expected number here comes from an INDEPENDENT
    derivation: the exact closed-form |V1| quadratic of the two-bus feeder
    plus a plain-Python complex fixed-point (Z-method) solve — neither
    shares any code with mapdn_tpu's Newton solver.
    """
    from mapdn_tpu.envs.timeseries import _finalize
    from mapdn_tpu.envs.voltage_control import VoltageControlEnv
    from mapdn_tpu.grid.model import make_grid

    vn = 12.66                      # kV
    r_ohm, x_ohm = 8.0, 6.0         # one line, slack(0) -- bus 1
    load_p, load_q = 1.2, 0.5       # MW / Mvar at bus 1
    pv_p = 0.9                      # MW PV at bus 1
    grid = make_grid(
        name="case2", vn_kv=[vn, vn], f_bus=[0], t_bus=[1],
        r_ohm=[r_ohm], x_ohm=[x_ohm], c_nf=[0.0], max_i_ka=[1.0],
        load_bus=[1], sgen_bus=[1], bus_zone=[0, 1], sgen_zone=[1],
        sn_mva=1.0, dtype=jnp.float64)
    rows = 600
    ts = _finalize(np.full((rows, 1), pv_p), np.full((rows, 1), load_p),
                   np.full((rows, 1), load_q), 3, jnp.float64)
    cfg = EnvConfig(episode_limit=10, reset_action=False, pf_backend="xla",
                    pf_tol=1e-10)
    env = VoltageControlEnv(grid, ts, cfg)

    # --- hand solution machinery (independent of the repo's solver) -------
    z_base = vn * vn / 1.0
    z = complex(r_ohm, x_ohm) / z_base          # series impedance [pu]

    def hand_v1(p_inj, q_inj):
        """Exact 2-bus solution: v^4 - v^2 (1 + 2 Re c) + |c|^2 = 0 with
        c = S z-bar, plus a Z-method fixed point as a second opinion."""
        S = complex(p_inj, q_inj)               # injection at bus 1 [pu]
        c = S * z.conjugate()
        disc = (1.0 + 2.0 * c.real) ** 2 - 4.0 * abs(c) ** 2
        v2 = 0.5 * ((1.0 + 2.0 * c.real) + np.sqrt(disc))  # root near 1 pu
        V = 1.0 + 0j
        for _ in range(200):
            V = 1.0 + z * (S / V).conjugate()
        assert abs(abs(V) - np.sqrt(v2)) < 1e-12   # both derivations agree
        return V

    # --- reset (reset_action=False -> q0 = 0) -----------------------------
    state, obs, gs = env.manual_reset(0, 0, 0)
    V1_reset = hand_v1(pv_p - load_p, 0.0 - load_q)
    np.testing.assert_allclose(float(state.vm[0]), 1.0, atol=1e-12)
    np.testing.assert_allclose(float(state.vm[1]), abs(V1_reset), atol=1e-8)

    # --- one step with agent action a = 0.5 -------------------------------
    a = 0.5
    out = env.step(state, jnp.asarray([a], jnp.float64),
                   jax.random.PRNGKey(0), add_noise=False)

    # q-clip: s_max = 1.2 * max(pv) (constant series -> 1.2 * pv_p), so
    # q = a * sqrt(s_max^2 - p^2) = a * pv_p * sqrt(0.44)
    s_max = 1.2 * pv_p
    q_cmd = a * np.sqrt(s_max**2 - pv_p**2)
    assert q_cmd == pytest.approx(a * pv_p * np.sqrt(0.44), abs=1e-15)
    np.testing.assert_allclose(float(out.state.sgen_q[0]), q_cmd, atol=1e-12)

    # power flow at the post-action injections
    V1 = hand_v1(pv_p - load_p, q_cmd - load_q)
    v1 = abs(V1)
    np.testing.assert_allclose(float(out.state.vm[1]), v1, atol=1e-8)
    np.testing.assert_allclose(float(out.state.va[1]), np.angle(V1), atol=1e-8)

    # reward = -( mean_bus l1(v) * w_v + q_weight * mean_sgen |q| )
    v_loss = 0.5 * (abs(1.0 - 1.0) + abs(v1 - 1.0)) * 1.0
    q_loss = abs(q_cmd)
    np.testing.assert_allclose(float(out.reward), -(v_loss + 0.1 * q_loss),
                               atol=1e-8)
    np.testing.assert_allclose(float(out.info["q_loss"]), q_loss, atol=1e-10)

    # line loss = |I|^2 r = |V1 - V0|^2 / |z|^2 * r  [pu ~ MW at sn=1]
    ploss = abs(V1 - 1.0) ** 2 / abs(z) ** 2 * z.real
    np.testing.assert_allclose(float(out.info["total_line_loss"]), ploss,
                               atol=1e-8)
    # voltage inside [0.95, 1.05]: fully controllable, no destroy
    assert 0.95 < v1 < 1.05
    assert float(out.info["percentage_of_v_out_of_control"]) == 0.0
    assert float(out.info["totally_controllable_ratio"]) == 1.0
    assert float(out.info["destroy"]) == 0.0
    np.testing.assert_allclose(
        float(out.info["average_voltage_deviation"]),
        0.5 * abs(v1 - 1.0), atol=1e-10)

    # res-bus p/q are consumption-positive; the obs demand block adds the PV
    # injection back so it reports PURE load (the reference's patched-intent
    # obs, voltage_control_env.py:232-316)
    np.testing.assert_allclose(float(out.state.p_bus[1]), load_p - pv_p,
                               atol=1e-8)
    np.testing.assert_allclose(float(out.state.q_bus[1]), load_q - q_cmd,
                               atol=1e-8)
    # obs layout follows state_space order (pv, demand, reactive, vm, va);
    # distributed mode, zone width 1: [pv, p_load, q_load, q, vm, va]
    np.testing.assert_allclose(
        np.asarray(out.obs[0]),
        [pv_p, load_p, load_q, q_cmd, v1, np.angle(V1)], atol=1e-7)
    # the slack bus balances the network: S_slack = V0 conj(y (V0 - V1))
    S_slack = (1.0 + 0j) * ((1.0 - V1) / z).conjugate()
    # global state: [pv, p_bus(2), q_bus(2), q, vm(2), va_deg(2)]
    np.testing.assert_allclose(
        np.asarray(out.global_state),
        [pv_p, -S_slack.real, load_p - pv_p, -S_slack.imag,
         load_q - q_cmd, q_cmd,
         1.0, v1, 0.0, np.degrees(np.angle(V1))], atol=1e-6)


def test_case69_published_solution():
    """case69's encoding is validated against the INDEPENDENTLY published
    base-case solution of the Baran-Wu 69-bus feeder (not self-generated):
    min voltage 0.9092 pu at bus 65 and total loss ~225 kW at nominal load
    (values reproduced across decades of capacitor-placement literature
    following Baran & Wu 1989).  Any transcription error in the impedance
    or load tables would shift these digits."""
    from mapdn_tpu.grid import make_case
    from mapdn_tpu.pf.reference import nr_solve_ref

    grid, load_p, load_q, pv_max = make_case("case69", dtype=jnp.float64)
    assert grid.n_bus == 69 and grid.n_branch == 68 and grid.n_load == 48
    # radial: every non-slack bus is a 'to' bus exactly once
    assert sorted(np.asarray(grid.t_bus).tolist()) == list(range(1, 69))
    assert np.sum(load_p) == pytest.approx(3.80189, abs=1e-4)
    assert np.sum(load_q) == pytest.approx(2.69460, abs=1e-4)

    n = grid.n_bus
    p = np.zeros(n)
    q = np.zeros(n)
    np.add.at(p, np.asarray(grid.load_bus), -load_p)
    np.add.at(q, np.asarray(grid.load_bus), -load_q)
    vm, va, _, _ = nr_solve_ref(np.asarray(grid.g_mat), np.asarray(grid.b_mat),
                                p, q, tol=1e-10)
    assert float(vm.min()) == pytest.approx(0.90919, abs=2e-5)
    assert int(vm.argmin()) + 1 == 65
    V = vm * np.exp(1j * va)
    Y = np.asarray(grid.g_mat) + 1j * np.asarray(grid.b_mat)
    loss_kw = (V * np.conj(Y @ V)).real.sum() * 1000.0
    assert loss_kw == pytest.approx(224.98, abs=0.5)

    # the full env stack runs on it (both task modes)
    for mode in ("distributed", "decentralised"):
        env = make_env("case69", EnvConfig(episode_limit=5, mode=mode),
                       days=4, dtype=jnp.float64)
        state, obs, gs = env.reset(jax.random.PRNGKey(0))
        # step takes per-sgen actions in both modes
        out = env.step(state, jnp.zeros(grid.n_sgen, jnp.float64),
                       jax.random.PRNGKey(1))
        assert bool(jnp.all(jnp.isfinite(out.obs)))
        assert float(out.info["destroy"]) == 0.0
