"""Critic networks (flax): MLP critic, QMIX mixer, attention critic.

Re-designs of reference critics/{mlp_critic,rnn_critic,qmix,maac_critic}.py
as flax modules with batched-agent inputs (no Python loops over agents).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mapdn_tpu.nets.agents import _Base, _activation, _kernel_init


class MLPCritic(_Base):
    """Generic Q/V head (reference critics/mlp_critic.py:7-37).

    fc1 -> optional LayerNorm -> act -> fc2 -> act -> out.
    """
    output_dim: int = 1

    @nn.compact
    def __call__(self, x):
        act = _activation(self.hid_activation)
        h = act(self._dense(self.hid_size)(self._stem(x)))
        return self._dense(self.output_dim)(h)


class CentralVCritic(_Base):
    """Centralized V(all-obs) head with the per-agent identity folded into
    the first layer.

    Feeding ``[joint_obs, onehot_i]`` per agent to :class:`MLPCritic` (the
    reference's central-critic construction, models/mappo.py:21-30 +
    model.py:101-139 agent-id concat) makes the wide first-layer matmul run
    n_agents times on n_agents-replicated input.  The first layer is linear,
    so the one-hot contributes exactly ``W_id[:, i]`` — a learned per-agent
    bias.  This module computes the wide matmul ONCE per sample and
    broadcast-adds the (n_agents, hid) identity embedding, then runs the
    narrow remaining layers per agent: same function class, ~n_agents x less
    first-layer compute and no (b, n, n*obs) materialization in HBM.
    """
    n_agents: int = 1
    use_agent_id: bool = True
    output_dim: int = 1

    @nn.compact
    def __call__(self, joint):
        # joint: (b, in_dim) -> (b, n_agents, output_dim)
        act = _activation(self.hid_activation)
        h = self._dense(self.hid_size)(joint)[:, None, :]
        if self.use_agent_id:
            # explicit f32 param dtype: flax's self.param without a dtype
            # hands the initializer jnp.float_, which is f64 under the x64
            # test config and silently promotes the whole critic to f64
            id_embed = self.param(
                "agent_id_embed",
                _kernel_init(self.init_type, self.init_std,
                             self.hid_activation),
                (self.n_agents, self.hid_size), jnp.float32)
            h = h + id_embed[None]
        else:
            h = jnp.broadcast_to(
                h, (joint.shape[0], self.n_agents, self.hid_size))
        if self.layernorm:
            h = nn.LayerNorm()(h)
        h = act(h)
        h = act(self._dense(self.hid_size)(h))
        return self._dense(self.output_dim)(h)


class RNNCritic(_Base):
    """GRU critic (reference critics/rnn_critic.py:7-36; defined but unused
    by any reference algorithm — kept for interface completeness)."""
    output_dim: int = 1

    @nn.compact
    def __call__(self, x, hidden):
        x = self._stem(x)
        hidden, h = nn.GRUCell(features=self.hid_size)(hidden, x)
        return self._dense(self.output_dim)(h), hidden


class QMixer(nn.Module):
    """Monotonic hypernetwork mixer (reference critics/qmix.py:8-83).

    q_tot = f_state(q_1..q_n) with non-negative (abs) mixing weights, ELU
    hidden layer, state-dependent V(s) bias, optional gating and skip
    connections; 1- or 2-layer hypernets.
    """
    n_agents: int
    state_dim: int
    embed_dim: int = 64
    hypernet_layers: int = 2
    hypernet_embed: int = 64
    gated: bool = False
    skip_connections: bool = False

    @nn.compact
    def __call__(self, agent_qs, states):
        # agent_qs: (b, n), states: (b, state_dim)
        b = agent_qs.shape[0]
        qs = agent_qs.reshape(b, 1, self.n_agents)

        def hyper(out_dim, name):
            if self.hypernet_layers > 1:
                return nn.Sequential([
                    nn.Dense(self.hypernet_embed), nn.relu,
                    nn.Dense(out_dim)], name=name)
            return nn.Dense(out_dim, name=name)

        w1 = jnp.abs(hyper(self.embed_dim * self.n_agents, "hyper_w_1")(states))
        w1 = w1.reshape(b, self.n_agents, self.embed_dim)
        b1 = nn.Dense(self.embed_dim, name="hyper_b_1")(states).reshape(
            b, 1, self.embed_dim)
        hidden = nn.elu(jnp.matmul(qs, w1) + b1)

        w_final = jnp.abs(hyper(self.embed_dim, "hyper_w_final")(states))
        w_final = w_final.reshape(b, self.embed_dim, 1)
        v = nn.Sequential([
            nn.Dense(self.embed_dim), nn.relu, nn.Dense(1)], name="V")(states)
        v = v.reshape(b, 1, 1)

        y = jnp.matmul(hidden, w_final)
        if self.gated:
            gate = self.param("gate", nn.initializers.constant(0.5), (1,))
            y = y * gate
        if self.skip_connections:
            y = y + jnp.sum(qs, axis=2, keepdims=True)
        q_tot = y + v
        return q_tot.reshape(b, 1)


class _LeakyEnc(nn.Module):
    feats: int

    @nn.compact
    def __call__(self, x):
        return nn.leaky_relu(nn.Dense(self.feats)(x), 0.01)


class _LeakyHead(nn.Module):
    feats: int

    @nn.compact
    def __call__(self, x):
        x = nn.leaky_relu(nn.Dense(self.feats)(x), 0.01)
        return nn.Dense(1)(x)


class AttentionCritic(nn.Module):
    """Multi-head cross-agent attention critic
    (reference critics/maac_critic.py:8-161, itself derived from the public
    MAAC implementation).

    Per agent: an (obs, act) encoder and an obs encoder; per head: shared
    key/value/selector projections; each agent attends over the other
    agents' encodings; Q = critic([own sa-encoding, attended values]) minus
    a state-only bias head; an attention-logit L2 regularizer is returned
    alongside (reference :153-159).

    All per-agent parameter sets are realized as a leading agent axis via
    nn.vmap rather than Python ModuleLists.
    """
    n_agents: int
    obs_dim: int
    act_dim: int
    hid_size: int = 64
    attend_heads: int = 1
    norm_in: bool = False

    @nn.compact
    def __call__(self, obs, act):
        # obs: (b, n, o), act: (b, n, a)
        n, h = self.n_agents, self.hid_size
        head_dim = h // self.attend_heads
        sa = jnp.concatenate([obs, act], axis=-1)

        # per-agent parameters realized as a leading agent axis via nn.vmap
        VEnc = nn.vmap(_LeakyEnc, in_axes=1, out_axes=1,
                       variable_axes={"params": 0}, split_rngs={"params": True})
        VHead = nn.vmap(_LeakyHead, in_axes=1, out_axes=1,
                        variable_axes={"params": 0}, split_rngs={"params": True})

        sa_enc = VEnc(feats=h, name="sa_encoders")(sa)
        s_enc = VEnc(feats=h, name="s_encoders")(obs)

        # shared per-head projections (reference :119-127)
        keys = nn.Dense(head_dim * self.attend_heads, use_bias=False,
                        name="key_proj")(sa_enc)
        sels = nn.Dense(head_dim * self.attend_heads, use_bias=False,
                        name="sel_proj")(s_enc)
        vals = nn.leaky_relu(
            nn.Dense(head_dim * self.attend_heads, name="val_proj")(sa_enc), 0.01)

        b = obs.shape[0]
        hd = self.attend_heads
        keys = keys.reshape(b, n, hd, head_dim)
        sels = sels.reshape(b, n, hd, head_dim)
        vals = vals.reshape(b, n, hd, head_dim)

        # logits[b, h, i, j] = <sel_i, key_j> / sqrt(d); mask j == i
        logits = jnp.einsum("bihd,bjhd->bhij", sels, keys) / jnp.sqrt(
            jnp.asarray(head_dim, obs.dtype))
        eye = jnp.eye(n, dtype=bool)
        logits = jnp.where(eye[None, None], -1e9, logits)
        attn = nn.softmax(logits, axis=-1)
        other_vals = jnp.einsum("bhij,bjhd->bihd", attn, vals).reshape(b, n, hd * head_dim)

        critic_in = jnp.concatenate([sa_enc, other_vals], axis=-1)

        q = VHead(feats=h, name="critics")(critic_in)
        bias = VHead(feats=h, name="biases")(s_enc)

        # attention-logit magnitude regularizer (reference :153-159)
        masked = jnp.where(eye[None, None], 0.0, logits)
        attend_reg = 1e-3 * jnp.mean(
            jnp.sum(masked**2, axis=-1) / (n - 1), axis=(0, 1))  # (n,)

        return (q - bias)[..., 0], attend_reg  # (b, n), (n,)
