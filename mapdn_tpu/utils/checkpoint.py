"""Checkpoint / resume via Orbax.

The reference saves only a rolling ``model.pt`` with the net weights every
40 episodes (reference train.py:117-119) and cannot resume mid-training
(no optimizer/buffer state, SURVEY.md section 5).  Here full training state
— params, targets, optimizer states, RNG, step counters — round-trips, and
a light weights-only export mirrors the reference's model.pt role.
"""
from __future__ import annotations

import os
import re
import shutil
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


def _generations(path):
    """Sorted generation subdirectories under a checkpoint directory.

    Matches only complete ``ckpt_<digits>`` names (>= 8 digits; the zero
    padding overflows past 1e8 episodes, so longer suffixes must still
    count): orbax crash leftovers
    ('ckpt_<N>.orbax-checkpoint-tmp-<ts>') must not count toward ``keep``
    or be offered to restore.  Sorted numerically by episode number —
    lexicographic order would rank 9-digit names before 8-digit ones."""
    if not os.path.isdir(path):
        return []
    return sorted((d for d in os.listdir(path)
                   if re.fullmatch(r"ckpt_\d{8,}", d)),
                  key=lambda d: int(d[len("ckpt_"):]))


def save_checkpoint(path: str, carry, steps: int, episodes: int, *, keep=2):
    """Full training-state checkpoint (resumable).

    ``path`` is a directory of GENERATIONS: each save writes a fresh
    ``ckpt_<episodes>`` subdir and only then prunes down to the newest
    ``keep`` — a crash mid-write can never lose the previous good
    generation (the reference's single rolling ``model.pt``,
    train.py:117-119, has no such protection)."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    dest = os.path.join(path, f"ckpt_{episodes:08d}")
    ckptr = ocp.PyTreeCheckpointer()
    payload = {
        "carry": _drop_empty(carry),
        "meta": {"steps": steps, "episodes": episodes},
    }
    ckptr.save(dest, payload, force=True)
    for d in _generations(path)[:-keep]:
        shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    # sweep orbax crash leftovers so they never accumulate
    for d in os.listdir(path):
        if ".orbax-checkpoint-tmp-" in d:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)


def restore_checkpoint(path: str, example_carry):
    """Restore into the structure of ``example_carry``; returns
    (carry, steps, episodes).

    ``path`` may be a generations directory (newest valid generation wins,
    falling back to older ones if the newest is corrupt) or a direct
    single-checkpoint directory."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    example = {
        "carry": _drop_empty(example_carry),
        "meta": {"steps": 0, "episodes": 0},
    }
    gens = _generations(path)
    candidates = [os.path.join(path, g) for g in reversed(gens)] or [path]
    err = None
    for cand in candidates:
        try:
            payload = ckptr.restore(cand, item=example)
            break
        except Exception as e:  # corrupt/partial generation: try older
            err = e
    else:
        raise FileNotFoundError(
            f"no restorable checkpoint under {path}") from err
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
