"""Multi-chip scaling: env-axis data parallelism over a device mesh.

The reference has NO distributed machinery at all — its launch scripts farm
independent single-GPU processes via CUDA_VISIBLE_DEVICES
(reference train_case33.sh:7-21; SURVEY.md section 2 'parallelism: none').
The TPU-native scale-out instead shards the *vectorized environment batch*
across a 1-D device mesh:

* env state, observations, GRU state and the replay buffer are sharded on
  their n_envs axis (NamedSharding over axis 'env'),
* algorithm parameters and optimizer state are replicated,
* one jitted train chunk spans the mesh: the rollout (power flow included)
  is embarrassingly parallel per shard, and the update phase's gradients —
  computed on windows spanning all lanes — are combined by compiler-inserted
  all-reduces over ICI (the standard "annotate shardings, let XLA insert
  collectives" recipe).

On a multi-host pod, call jax.distributed.initialize() first and pass the
global device list; per-host env shards then feed the replicated learner
with gradient all-reduce over ICI/DCN.

Tested on a CPU fake mesh (xla_force_host_platform_device_count) — the
TPU analog of multi-node tests without a cluster; __graft_entry__.py's
dryrun_multichip exercises exactly this path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mapdn_tpu.learn.trainer import PGTrainer, TrainerCarry


def make_env_mesh(devices=None):
    """1-D mesh over all (or given) devices with axis name 'env'."""
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.array(devices), axis_names=("env",))


def _carry_shardings(mesh, carry: TrainerCarry):
    """NamedSharding pytree: env-batched leaves sharded on 'env', learner
    state replicated.

    Heuristic by pytree field: env_state/obs/last_hid shard dim 0; replay
    data shards dim 1 (layout (capacity, n_env, ...)); algo/rng/counters
    replicate.
    """
    shard0 = NamedSharding(mesh, P("env"))
    shard1 = NamedSharding(mesh, P(None, "env"))
    repl = NamedSharding(mesh, P())

    def spec_like(x, s):
        return jax.tree_util.tree_map(lambda _: s, x)

    return TrainerCarry(
        env_state=spec_like(carry.env_state, shard0),
        obs=shard0,
        last_hid=shard0,
        algo=spec_like(carry.algo, repl),
        replay=carry.replay.replace(
            data=spec_like(carry.replay.data, shard1),
            ptr=repl, size=repl),
        rng=repl,
        steps=repl,
    )


def shard_carry(mesh, carry: TrainerCarry) -> TrainerCarry:
    """Lay the (identically-seeded, locally-materialized) carry out over the
    mesh.  Multi-process: leaves go through the host so device_put can
    assemble one global array from every process's consistent copy
    (jax.distributed semantics; single-process skips the host hop)."""
    shardings = _carry_shardings(mesh, carry)
    multiproc = jax.process_count() > 1

    def put(x, s):
        import numpy as np
        return jax.device_put(np.asarray(x) if multiproc else x, s)

    return jax.tree_util.tree_map(put, carry, shardings)


class ShardedPGTrainer(PGTrainer):
    """PGTrainer whose fused train chunk runs sharded over an env mesh."""

    def __init__(self, cfg, model, env, mesh=None):
        super().__init__(cfg, model, env)
        self.mesh = mesh or make_env_mesh()
        n_dev = len(self.mesh.devices.reshape(-1))
        if cfg.n_envs % n_dev != 0:
            raise ValueError(
                f"n_envs={cfg.n_envs} not divisible by mesh size {n_dev}")

    def setup(self, seed=0):
        carry = self.init_carry(jax.random.PRNGKey(seed))
        carry = shard_carry(self.mesh, carry)
        shardings = _carry_shardings(self.mesh, carry)
        repl = NamedSharding(self.mesh, P())
        # both the per-chunk program and the fused whole-episode program
        # carry the explicit in/out shardings; run_episode picks the fused
        # one (the dispatch-latency win measured single-chip applies
        # unchanged on a mesh — one XLA program per episode, with the
        # learner's gradient all-reduces inside it)
        self._jit_chunk = jax.jit(
            self._train_chunk, donate_argnums=(0,),
            in_shardings=(shardings,), out_shardings=(shardings, repl))
        self._jit_episode = jax.jit(
            self._train_episode, donate_argnums=(0,),
            in_shardings=(shardings,), out_shardings=(shardings, repl))
        self.carry = carry
        return self
