"""Native C++ host runtime: oracle parity and CSV scanner correctness.

Everything here must pass with or without a working g++ (the binding layer
falls back to numpy/pandas), so the assertions target behavior, not the
presence of the shared library.
"""
import os

import numpy as np
import pytest

from mapdn_tpu import native
from mapdn_tpu.grid import make_case
from mapdn_tpu.pf.reference import nr_solve_ref


def _case_batch(case, batch):
    grid, load_p, load_q, _ = make_case(case)
    n = grid.n_bus
    p = np.zeros(n)
    q = np.zeros(n)
    np.add.at(p, np.asarray(grid.load_bus), -np.asarray(load_p))
    np.add.at(q, np.asarray(grid.load_bus), -np.asarray(load_q))
    scale = np.linspace(0.6, 1.2, batch)[:, None]
    return grid, p[None] * scale, q[None] * scale


def test_native_oracle_matches_numpy_oracle():
    grid, pb, qb = _case_batch("case33", 8)
    g = np.asarray(grid.g_mat, np.float64)
    b = np.asarray(grid.b_mat, np.float64)
    vm, va, conv, iters = native.nr_solve_batch(g, b, pb, qb)
    assert conv.all()
    for i in range(8):
        vm_o, va_o, ok, _ = nr_solve_ref(g, b, pb[i], qb[i])
        assert ok
        np.testing.assert_allclose(vm[i], vm_o, atol=1e-12)
        np.testing.assert_allclose(va[i], va_o, atol=1e-12)


def test_native_oracle_flags_divergence():
    grid, pb, qb = _case_batch("case33", 2)
    g = np.asarray(grid.g_mat, np.float64)
    b = np.asarray(grid.b_mat, np.float64)
    pb[1] *= 1e4  # unsolvable overload in lane 1 only
    vm, va, conv, _ = native.nr_solve_batch(g, b, pb, qb)
    assert bool(conv[0]) and not bool(conv[1])
    assert np.all(np.isfinite(vm[0]))


def test_csv_loader_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "pv_active.csv")
    rows = 200
    data = np.arange(rows * 3, dtype=np.float64).reshape(rows, 3) * 0.125
    with open(path, "w") as f:
        f.write("time,pv0,pv1,pv2\n")
        for i in range(rows):
            f.write(f"2020-01-01 00:{i % 60:02d},"
                    f"{data[i, 0]},{data[i, 1]},{data[i, 2]}\n")
    out = native.load_csv(path, scale=2.0)
    assert out.shape == (rows, 3)
    np.testing.assert_allclose(out, data * 2.0, rtol=1e-15)


def test_csv_dataset_ingestion(tmp_path):
    """load_csv_dataset end-to-end over a synthetic scenario directory."""
    from mapdn_tpu.envs.timeseries import load_csv_dataset

    rng = np.random.RandomState(0)
    rows = 480
    for name, cols in (("pv_active.csv", 4), ("load_active.csv", 6),
                       ("load_reactive.csv", 6)):
        with open(os.path.join(tmp_path, name), "w") as f:
            f.write("time," + ",".join(f"c{i}" for i in range(cols)) + "\n")
            for r in range(rows):
                vals = rng.uniform(0.0, 2.0, cols)
                f.write(f"t{r}," + ",".join(f"{v:.6f}" for v in vals) + "\n")
    ts = load_csv_dataset(str(tmp_path), pv_scale=1.5, demand_scale=0.5)
    assert ts.pv.shape == (rows, 4)
    assert ts.load_p.shape == (rows, 6)
    assert ts.n_steps == rows
    assert np.all(np.asarray(ts.s_max) >= np.asarray(ts.p_max))


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_lib_actually_loaded():
    lib = native.get_lib()
    assert lib.mapdn_native_abi_version() == 1
