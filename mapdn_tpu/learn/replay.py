"""On-HBM ring replay buffer for vectorized rollouts.

The reference keeps a Python list of 5,000 numpy transitions on the host and
samples one contiguous 32-step window per update
(reference utilities/replay_buffer.py:19-29 `get_truncated_episodes_batch`).
Here the buffer is a preallocated pytree of device arrays shaped
(capacity, n_env, ...) written in-place under jit (functional .at[] updates
with buffer donation), so rollout -> store -> sample -> update never leaves
the device.

Semantics parity: `sample_window` draws a time-contiguous window of
``batch_size`` steps (uniform start over the filled region, FIFO eviction),
the exact analog of the reference's truncated-episode sampling, generalized
over the env-lane axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayState:
    data: dict          # pytree of (capacity, n_env, ...) arrays
    ptr: jnp.ndarray    # () int32 next write slot
    size: jnp.ndarray   # () int32 number of valid slots


def init_replay(capacity: int, example: dict) -> ReplayState:
    """Allocate from one example transition pytree of (n_env, ...) arrays."""
    data = jax.tree_util.tree_map(
        lambda x: jnp.zeros((capacity,) + x.shape, x.dtype), example)
    return ReplayState(
        data=data, ptr=jnp.asarray(0, jnp.int32), size=jnp.asarray(0, jnp.int32))


def add(state: ReplayState, trans: dict) -> ReplayState:
    """Append one step of (n_env, ...) transitions (FIFO ring)."""
    capacity = jax.tree_util.tree_leaves(state.data)[0].shape[0]
    data = jax.tree_util.tree_map(
        lambda buf, x: buf.at[state.ptr].set(x.astype(buf.dtype)),
        state.data, trans)
    return ReplayState(
        data=data,
        ptr=(state.ptr + 1) % capacity,
        size=jnp.minimum(state.size + 1, capacity))


def add_many(state: ReplayState, stacked) -> ReplayState:
    """Append T steps at once from a (T, n_env, ...) pytree (FIFO ring).

    One batched scatter instead of T sequential ``add`` calls — the natural
    write pattern when the trainer collects a whole rollout chunk via
    ``lax.scan`` before touching the buffer.  When T >= capacity only the
    most recent ``capacity`` rows survive (identical to T sequential adds).
    """
    capacity = jax.tree_util.tree_leaves(state.data)[0].shape[0]
    t = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    if t >= capacity:
        tail = jax.tree_util.tree_map(
            lambda buf, x: x[t - capacity:].astype(buf.dtype),
            state.data, stacked)
        return ReplayState(
            data=tail,
            ptr=jnp.asarray(0, jnp.int32),
            size=jnp.asarray(capacity, jnp.int32))
    idx = (state.ptr + jnp.arange(t)) % capacity
    data = jax.tree_util.tree_map(
        lambda buf, x: buf.at[idx].set(x.astype(buf.dtype)),
        state.data, stacked)
    return ReplayState(
        data=data,
        ptr=(state.ptr + t) % capacity,
        size=jnp.minimum(state.size + t, capacity))


def sample_window(state: ReplayState, key, batch_size: int,
                  lanes: int | None = None) -> dict:
    """Contiguous window of `batch_size` steps, shape (batch_size, n_env, ...).

    Start index uniform over [0, size - batch_size] in logical (oldest-first)
    order, mapped through the ring (reference replay_buffer.py:19-23).
    Caller guarantees size >= batch_size (reference gates on the same
    condition, model.py:42-44).

    ``lanes``: if set and smaller than the stored env-lane axis, a random
    subset of that many lanes is gathered — the vectorized generalization of
    the reference's fixed transition count per minibatch (its batch_size
    counts single-env transitions), keeping update compute bounded as
    n_envs grows.
    """
    capacity = jax.tree_util.tree_leaves(state.data)[0].shape[0]
    n_env = jax.tree_util.tree_leaves(state.data)[0].shape[1]
    oldest = jnp.where(state.size < capacity, 0, state.ptr)
    k_start, k_lane = jax.random.split(key)
    if capacity == batch_size:
        # the window is deterministically the whole buffer: un-rotate the
        # ring with a roll (two contiguous slices, full HBM streaming
        # bandwidth) instead of a row-gather, which lowers to per-row DMA.
        # (A joint (row, lane) gather was tried in round 4 and is 2.6x
        # SLOWER than roll+slice — XLA's multi-axis gather of small rows
        # can't stream.)
        if lanes is not None and lanes < n_env:
            # lane-subsampled epochs: gather the lane subset FIRST, then
            # un-rotate only those lanes.  Roll and lane-gather commute,
            # and the r4 xplane trace showed the whole-ring roll forcing
            # ~8 ms of full-(capacity, n_env) relayout/convert copies per
            # update phase while the epochs touch lanes/n_env of the data.
            lane_idx = jax.random.choice(k_lane, n_env, (lanes,),
                                         replace=False)
            return jax.tree_util.tree_map(
                lambda buf: jnp.roll(buf[:, lane_idx], -oldest, axis=0),
                state.data)
        batch = jax.tree_util.tree_map(
            lambda buf: jnp.roll(buf, -oldest, axis=0), state.data)
    else:
        max_start = jnp.maximum(state.size - batch_size, 0)
        start = jax.random.randint(k_start, (), 0, max_start + 1)
        idx = (oldest + start + jnp.arange(batch_size)) % capacity
        batch = jax.tree_util.tree_map(lambda buf: buf[idx], state.data)

    return subsample_lanes(batch, k_lane, lanes, presplit=True)


def subsample_lanes(window, key, lanes: int | None, *, presplit=False):
    """Random lane subset of a (T, n_env, ...) window (same RNG stream as
    :func:`sample_window`: key -> split -> choice on the second half, unless
    ``presplit`` says the caller already split)."""
    n_env = jax.tree_util.tree_leaves(window)[0].shape[1]
    if lanes is None or lanes >= n_env:
        return window
    k_lane = key if presplit else jax.random.split(key)[1]
    lane_idx = jax.random.choice(k_lane, n_env, (lanes,), replace=False)
    return jax.tree_util.tree_map(lambda buf: buf[:, lane_idx], window)


def clear(state: ReplayState) -> ReplayState:
    """On-policy post-update clear (reference model.py:55-56)."""
    return ReplayState(
        data=state.data,
        ptr=jnp.asarray(0, jnp.int32),
        size=jnp.asarray(0, jnp.int32))


# --------------------------------------------------------------- episodic
# Whole-episode storage/sampling: the vectorized analog of the reference's
# EpisodeReplayBuffer (replay_buffer.py:33-58), used when cfg.episodic is
# set (an exposed-but-unused mode in the reference's benchmark configs).
# One rollout of n_env lanes contributes n_env episodes to the pool.

def init_episode_replay(capacity: int, example: dict, t: int) -> ReplayState:
    """Allocate (capacity, T, n_env, ...) episode slots from one example
    transition pytree of (n_env, ...) arrays."""
    data = jax.tree_util.tree_map(
        lambda x: jnp.zeros((capacity, t) + x.shape, x.dtype), example)
    return ReplayState(
        data=data, ptr=jnp.asarray(0, jnp.int32), size=jnp.asarray(0, jnp.int32))


def add_episode(state: ReplayState, traj) -> ReplayState:
    """Append one vectorized episode: traj is a (T, n_env, ...) pytree."""
    capacity = jax.tree_util.tree_leaves(state.data)[0].shape[0]
    data = jax.tree_util.tree_map(
        lambda buf, x: buf.at[state.ptr].set(x.astype(buf.dtype)),
        state.data, traj)
    return ReplayState(
        data=data,
        ptr=(state.ptr + 1) % capacity,
        size=jnp.minimum(state.size + 1, capacity))


def sample_episodes(state: ReplayState, key, batch_size: int) -> dict:
    """Sample `batch_size` whole episodes -> (T, batch_size, ...) pytree.

    The episode pool is size x n_env single-lane trajectories; each draw
    picks a (slot, lane) pair uniformly (reference replay_buffer.py:46-52
    samples episode indices the same way over its flat list).
    """
    n_env = jax.tree_util.tree_leaves(state.data)[0].shape[2]
    k_slot, k_lane = jax.random.split(key)
    slots = jax.random.randint(
        k_slot, (batch_size,), 0, jnp.maximum(state.size, 1))
    lanes = jax.random.randint(k_lane, (batch_size,), 0, n_env)

    def pick(buf):
        sel = buf[slots, :, lanes]      # (batch, T, ...)
        return jnp.moveaxis(sel, 0, 1)  # (T, batch, ...)

    return jax.tree_util.tree_map(pick, state.data)
