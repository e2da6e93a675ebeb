"""Native (C++) host-runtime components, bound via ctypes.

The reference's compute-heavy host layers live in native dependencies
(pandapower's solver stack, pandas' CSV tokenizer — SURVEY.md section 2);
this package provides the framework's own native equivalents:

* ``pf_oracle.cpp``  — float64 MATPOWER-formulation NR solver with an
  OpenMP batch farm (parity oracle + baseline proxy; the TPU production
  solver is mapdn_tpu/pf).
* ``csv_loader.cpp`` — single-pass strtod CSV scanner for the 3-minute
  PV/load histories.

The shared library is built lazily with g++ on first use and cached next
to the sources; everything degrades gracefully to the numpy implementations
when no compiler is available or ``MAPDN_NATIVE=0`` is set, so the JAX/TPU
path never depends on native code.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src")
_LIB_PATH = os.path.join(_DIR, "libmapdn_native.so")
_SOURCES = ("pf_oracle.cpp", "csv_loader.cpp")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build():
    srcs = [os.path.join(_SRC, s) for s in _SOURCES]
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           "-o", _LIB_PATH] + srcs
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        # retry without OpenMP (toolchains lacking libgomp)
        try:
            subprocess.run([c for c in cmd if c != "-fopenmp"],
                           check=True, capture_output=True, timeout=120)
            return True
        except (subprocess.SubprocessError, FileNotFoundError):
            return False


def _stale():
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    return any(os.path.getmtime(os.path.join(_SRC, s)) > lib_mtime
               for s in _SOURCES)


def get_lib():
    """The loaded native library, or None if unavailable/disabled."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if os.environ.get("MAPDN_NATIVE", "1") == "0":
        _lib_failed = True
        return None
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if _stale() and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib_failed = True
            return None
        lib.mapdn_nr_solve_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.mapdn_nr_solve_batch.restype = None
        lib.mapdn_csv_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.mapdn_csv_probe.restype = ctypes.c_int
        lib.mapdn_csv_load.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_double]
        lib.mapdn_csv_load.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def nr_solve_batch(g_mat, b_mat, p_inj, q_inj, *, slack_vm=1.0, tol=1e-8,
                   max_iter=30):
    """Batched float64 NR oracle.

    Args match :func:`mapdn_tpu.pf.reference.nr_solve_ref`, with leading
    batch dims on p_inj/q_inj.  Uses the native OpenMP solver when present,
    else loops the numpy oracle.  Returns (vm, va, converged, n_iter) with
    the batch shape preserved.
    """
    g = np.ascontiguousarray(g_mat, np.float64)
    b = np.ascontiguousarray(b_mat, np.float64)
    n = g.shape[0]
    p = np.ascontiguousarray(p_inj, np.float64).reshape(-1, n)
    q = np.ascontiguousarray(q_inj, np.float64).reshape(-1, n)
    batch = p.shape[0]
    batch_shape = np.asarray(p_inj).shape[:-1]

    lib = get_lib()
    if lib is not None:
        vm = np.empty((batch, n))
        va = np.empty((batch, n))
        conv = np.empty(batch, np.int32)
        iters = np.empty(batch, np.int32)
        lib.mapdn_nr_solve_batch(
            _dp(g), _dp(b), n, _dp(p), _dp(q), batch,
            float(slack_vm), float(tol), int(max_iter),
            _dp(vm), _dp(va),
            conv.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            iters.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    else:
        from mapdn_tpu.pf.reference import nr_solve_ref
        vm = np.empty((batch, n))
        va = np.empty((batch, n))
        conv = np.empty(batch, np.int32)
        iters = np.empty(batch, np.int32)
        for i in range(batch):
            vm[i], va[i], ok, it = nr_solve_ref(
                g, b, p[i], q[i], slack_vm=slack_vm, tol=tol,
                max_iter=max_iter)
            conv[i], iters[i] = int(ok), it
    shp = batch_shape + (n,)
    return (vm.reshape(shp), va.reshape(shp),
            conv.reshape(batch_shape).astype(bool),
            iters.reshape(batch_shape))


def load_csv(path, *, scale=1.0):
    """Parse a MAPDN-format CSV (header line + leading timestamp column)
    into a (rows, cols) float64 array.  Native scanner when present, pandas
    fallback otherwise."""
    lib = get_lib()
    if lib is None:
        import pandas as pd
        df = pd.read_csv(path, index_col=None)
        return df.iloc[:, 1:].to_numpy(dtype=np.float64) * scale
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.mapdn_csv_probe(path.encode(), ctypes.byref(rows),
                             ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"csv probe failed ({rc}): {path}")
    out = np.empty((rows.value, cols.value))
    got = lib.mapdn_csv_load(path.encode(), _dp(out), rows.value, cols.value,
                             float(scale))
    if got < 0:
        raise IOError(f"csv load failed ({got}): {path}")
    return out[:got]
