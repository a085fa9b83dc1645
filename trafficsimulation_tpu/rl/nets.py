"""Policy networks for the RL traffic-light controllers, as Flax modules.

Architectural parity with the three TF/Keras families:
  PolicyMLP   — `make_policy_net` (`rl_simple.py:82-93`): SRL_HIDDEN_LAYERS
                dense-ReLU layers + LayerNorm -> 2 logits.
  ActorCritic — `make_actor_critic` (`rl_a2c.py:21-36`): shared trunk,
                policy-logits + state-value heads.
  GATQNet     — `GraphAttentionLayer` + `make_gat_dqn_net`
                (`rl_gatdqn.py:33-102`): single-head graph attention over
                a star graph (center + 4 neighbors), then 2x Dense(32)
                -> 2 Q-values.

The reference's Keras Dropout layers are inactive in both its inference
and training calls (no training=True is ever passed), so dropout is
omitted here.  All dense stacks are batched matmuls over every
intersection at once — MXU work, unlike the reference's per-group
CPU/GPU forward passes.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class PolicyMLP(nn.Module):
    hidden: int = 128
    layers: int = 10
    out: int = 2

    @nn.compact
    def __call__(self, x):
        for _ in range(self.layers):
            x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.LayerNorm()(x)
        return nn.Dense(self.out)(x)


class ActorCritic(nn.Module):
    hidden: int = 256
    layers: int = 10

    @nn.compact
    def __call__(self, x):
        for _ in range(self.layers):
            x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.LayerNorm()(x)
        logits = nn.Dense(2, name="policy_logits")(x)
        value = nn.Dense(1, name="state_value")(x)
        return logits, value[..., 0]


class GraphAttention(nn.Module):
    """Single-head star-graph attention: the center node (index 0)
    attends over itself + its neighbors."""
    out_dim: int = 16

    @nn.compact
    def __call__(self, feats, mask):
        # feats [B, N, F]; mask [B, N]
        Wf = nn.Dense(self.out_dim, use_bias=False, name="W")(feats)
        center = Wf[:, 0:1, :]
        cat = jnp.concatenate(
            [jnp.broadcast_to(center, Wf.shape), Wf], axis=-1)
        e = nn.Dense(1, use_bias=False, name="attn")(cat)[..., 0]  # [B, N]
        e = nn.leaky_relu(e, negative_slope=0.2)
        e = e + (1.0 - mask) * -1e9
        alpha = nn.softmax(e, axis=1)[..., None]
        return jnp.sum(alpha * Wf, axis=1)                        # [B, out]


class GATQNet(nn.Module):
    gat_dim: int = 16
    hidden: int = 32
    actions: int = 2

    @nn.compact
    def __call__(self, feats, mask):
        x = nn.relu(GraphAttention(self.gat_dim)(feats, mask))
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(self.actions)(x)
