"""Voltage barrier (reward-shaping) functions, branchless and vmappable.

The reference implements these as scalar Python loops over numpy arrays
(reference voltage_barrier/{l1,l2,courant_beltrami,bowl,bump}.py); here each
is a pure elementwise jnp function over a voltage vector, selected once at
trace time via the registry (no data-dependent branching under jit).
"""
from __future__ import annotations

import jax.numpy as jnp


def l1(v, v_ref=1.0):
    """|v - v_ref|  (reference l1.py:5-7)."""
    return jnp.abs(v - v_ref)


def l2(v, v_ref=1.0):
    """2 (v - v_ref)^2  (reference l2.py:5-7)."""
    return 2.0 * jnp.square(v - v_ref)


def courant_beltrami(v, v_lower=0.95, v_upper=1.05):
    """Hinge-squared outside the deadband (reference courant_beltrami.py:5-7)."""
    return jnp.square(jnp.maximum(0.0, v - v_upper)) + jnp.square(
        jnp.maximum(0.0, v_lower - v))


def bowl(v, v_ref=1.0, scale=0.1):
    """Piecewise linear/Gaussian bowl (reference bowl.py:5-12).

    Linear 2|v-v_ref|-0.095 outside the 0.05 band, inverted Gaussian inside.
    """
    dev = jnp.abs(v - v_ref)
    normal = 1.0 / jnp.sqrt(2 * jnp.pi * scale**2) * jnp.exp(
        -0.5 * jnp.square(v - v_ref) / scale**2)
    outside = 2.0 * dev - 0.095
    inside = -0.01 * normal + 0.04
    return jnp.where(dev > 0.05, outside, inside)


def bump(v):
    """Smooth bump barrier (reference bump.py:5-12).

    exp(-1/(1-v^4)) for |v|<1, exp(-1/(1-(v-2)^4)) for 1<v<3, else 0.
    (For the voltage-control use case v is ~1 pu so the second branch is the
    live one.)  Guarded denominators keep the masked branches finite.
    """
    d1 = 1.0 - v**4
    d2 = 1.0 - (v - 2.0) ** 4
    b1 = jnp.exp(-1.0 / jnp.where(d1 > 0, d1, 1.0))
    b2 = jnp.exp(-1.0 / jnp.where(d2 > 0, d2, 1.0))
    in1 = jnp.abs(v) < 1.0
    in2 = jnp.logical_and(v > 1.0, v < 3.0)
    return jnp.where(in1, b1, jnp.where(jnp.logical_and(in2, d2 > 0), b2, 0.0))


BARRIERS = {
    "l1": l1,
    "l2": l2,
    "courant_beltrami": courant_beltrami,
    "bowl": bowl,
    "bump": bump,
}


def get_barrier(name):
    if name not in BARRIERS:
        raise KeyError(f"unknown barrier '{name}'; available: {sorted(BARRIERS)}")
    return BARRIERS[name]
