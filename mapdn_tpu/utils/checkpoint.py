"""Checkpoint / resume via Orbax.

The reference saves only a rolling ``model.pt`` with the net weights every
40 episodes (reference train.py:117-119) and cannot resume mid-training
(no optimizer/buffer state, SURVEY.md section 5).  Here full training state
— params, targets, optimizer states, RNG, step counters — round-trips, and
a light weights-only export mirrors the reference's model.pt role.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp
from flax import serialization


import jax.numpy as jnp


def _drop_empty(tree):
    """Orbax refuses zero-size arrays (e.g. the history buffer when
    history == 1); swap in 1-element placeholders, restored from the
    example on load."""
    return jax.tree_util.tree_map(
        lambda x: jnp.zeros((1,), x.dtype)
        if getattr(x, "size", 1) == 0 else x, tree)


def save_checkpoint(path: str, carry, steps: int, episodes: int):
    """Full training-state checkpoint (resumable)."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    payload = {
        "carry": _drop_empty(carry),
        "meta": {"steps": steps, "episodes": episodes},
    }
    ckptr.save(path, payload, force=True)


def restore_checkpoint(path: str, example_carry):
    """Restore into the structure of ``example_carry``; returns
    (carry, steps, episodes)."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    example = {
        "carry": _drop_empty(example_carry),
        "meta": {"steps": 0, "episodes": 0},
    }
    payload = ckptr.restore(path, item=example)
    carry = jax.tree_util.tree_map(
        lambda ex, loaded: ex if getattr(ex, "size", 1) == 0 else loaded,
        example_carry, payload["carry"])
    return carry, int(payload["meta"]["steps"]), int(
        payload["meta"]["episodes"])


def save_model(path: str, algo_state):
    """Weights-only export (the reference's model.pt analog, train.py:117-119)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(algo_state))


def load_model(path: str, example_algo_state):
    with open(path, "rb") as f:
        return serialization.from_bytes(example_algo_state, f.read())
