"""PV / load time-series tables: HBM-resident data plane of the environment.

The reference loads three CSVs (pv_active, load_active, load_reactive;
3-minute resolution, ~3 years) into pandas and indexes them per step on the
host (reference voltage_control_env.py:407-489).  Here the tables are plain
device arrays gathered by a traced time index inside the jitted step, so the
rollout never touches the host.

The real MAPDN dataset (Google-Drive download, reference README.md:98-107)
is not redistributable; :func:`load_csv_dataset` ingests it when present,
and :func:`synthetic_dataset` generates a statistically similar profile
(diurnal PV bell with weather regimes, double-peak demand) deterministically
from a seed for self-contained operation.
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TimeSeries:
    pv: jnp.ndarray           # (T, n_sgen) PV active power [MW]
    load_p: jnp.ndarray       # (T, n_load) demand active power [MW]
    load_q: jnp.ndarray       # (T, n_load) demand reactive power [Mvar]
    pv_std: jnp.ndarray       # (n_sgen,) per-column std/100 (noise scale)
    load_p_std: jnp.ndarray   # (n_load,)
    load_q_std: jnp.ndarray   # (n_load,)
    p_max: jnp.ndarray        # (n_sgen,) historical max PV output [MW]
    s_max: jnp.ndarray        # (n_sgen,) inverter capacity = 1.2 * p_max
    time_delta: int = struct.field(pytree_node=False, default=3)  # minutes/step
    n_steps: int = struct.field(pytree_node=False, default=0)


def _finalize(pv, load_p, load_q, time_delta, dtype):
    """Common bookkeeping mirroring the reference's derived quantities:
    noise std = column std / 100 (voltage_control_env.py:70-72) and
    s_max = 1.2 * max(pv) (voltage_control_env.py:515-521)."""
    pv = np.asarray(pv, np.float64)
    load_p = np.asarray(load_p, np.float64)
    load_q = np.asarray(load_q, np.float64)
    a = lambda x: jnp.asarray(x, dtype)
    p_max = pv.max(axis=0)
    return TimeSeries(
        pv=a(pv),
        load_p=a(load_p),
        load_q=a(load_q),
        pv_std=a(pv.std(axis=0) / 100.0),
        load_p_std=a(load_p.std(axis=0) / 100.0),
        load_q_std=a(load_q.std(axis=0) / 100.0),
        p_max=a(p_max),
        s_max=a(1.2 * p_max),
        time_delta=int(time_delta),
        n_steps=pv.shape[0],
    )


def synthetic_dataset(
    base_load_p,
    base_load_q,
    pv_capacity,
    *,
    days=40,
    time_delta=3,
    seed=0,
    dtype=jnp.float32,
):
    """Deterministic synthetic dataset with MAPDN-like statistics.

    PV: clear-sky bell (daylight 6h-18h solar window) x daily weather factor
    (AR(1) over days) x short-horizon cloud noise.  Demand: morning/evening
    double-peak plus weekly modulation and noise, scaled to each load's base.
    """
    rng = np.random.RandomState(seed)
    steps_per_day = 24 * 60 // time_delta
    t = np.arange(days * steps_per_day)
    hour = (t % steps_per_day) * time_delta / 60.0
    day = t // steps_per_day

    # --- PV ---
    solar = np.clip(np.sin(np.pi * (hour - 6.0) / 12.0), 0.0, None) ** 1.3
    weather = np.empty(days)
    w = 0.7
    for d in range(days):
        w = np.clip(0.6 * w + 0.4 * rng.uniform(0.15, 1.0), 0.05, 1.0)
        weather[d] = w
    cloud = np.clip(1.0 - 0.25 * np.abs(rng.randn(len(t), len(pv_capacity))), 0.2, 1.0)
    pv = (solar[:, None] * weather[day][:, None] * cloud) * np.asarray(pv_capacity)[None, :]

    # --- demand ---
    base_shape = (
        0.55
        + 0.25 * np.exp(-0.5 * ((hour - 9.0) / 2.5) ** 2)
        + 0.45 * np.exp(-0.5 * ((hour - 19.5) / 2.0) ** 2)
    )
    weekly = 1.0 - 0.12 * ((day % 7) >= 5).astype(np.float64)
    shape = base_shape * weekly
    jitter_p = 1.0 + 0.05 * rng.randn(len(t), len(base_load_p))
    jitter_q = 1.0 + 0.05 * rng.randn(len(t), len(base_load_q))
    load_p = np.clip(shape[:, None] * jitter_p, 0.05, None) * np.asarray(base_load_p)[None, :]
    load_q = np.clip(shape[:, None] * jitter_q, 0.05, None) * np.asarray(base_load_q)[None, :]

    return _finalize(pv, load_p, load_q, time_delta, dtype)


def load_csv_dataset(data_path, *, pv_scale=1.0, demand_scale=1.0,
                     time_delta=3, dtype=jnp.float32):
    """Ingest a real MAPDN scenario directory (pv_active.csv, load_active.csv,
    load_reactive.csv with a leading timestamp column, scaled like reference
    voltage_control_env.py:407-438).  Parsing goes through the native C++
    scanner (mapdn_tpu.native.load_csv) when built, pandas otherwise."""
    from mapdn_tpu.native import load_csv

    def read(name, scale):
        return load_csv(os.path.join(data_path, name), scale=scale)

    pv = read("pv_active.csv", pv_scale)
    load_p = read("load_active.csv", demand_scale)
    load_q = read("load_reactive.csv", demand_scale)
    return _finalize(pv, load_p, load_q, time_delta, dtype)


def dataset_for_case(case_name, load_p, load_q, pv_max, *, data_path=None,
                     days=40, seed=0, dtype=jnp.float32,
                     pv_scale=1.0, demand_scale=1.0):
    """Real data when a scenario directory exists, else synthetic."""
    if data_path and os.path.isdir(data_path) and os.path.exists(
            os.path.join(data_path, "pv_active.csv")):
        return load_csv_dataset(data_path, pv_scale=pv_scale,
                                demand_scale=demand_scale, dtype=dtype)
    return synthetic_dataset(load_p, load_q, pv_max, days=days,
                             seed=seed, dtype=dtype)
