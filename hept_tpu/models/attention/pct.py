"""Point Cloud Transformer attention (graph message passing baseline).

Rebuilds reference src/models/attention/pct.py:20-99 (a PyG
PointTransformerConv): per edge j→i, delta = pos_nn(pos_i - pos_j),
alpha = attn_nn(lin_src(x)_i - lin_dst(x)_j + delta), softmaxed per
destination and per channel, aggregating alpha * (lin(x)_j + delta).
The PyG scatter backend becomes `segment_softmax`/`segment_sum` over a
static-size padded edge array (SURVEY §2.8).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ...ops.segment import segment_softmax, segment_sum
from ..mlp import TorchLinear


class PCTAttention(nn.Module):
    h_dim: int
    num_heads: int
    coords_dim: int

    @nn.compact
    def __call__(self, x, *, coords, valid, edges, edge_mask, **_):
        """Args:
          x: (n, h_dim * num_heads) — the reference feeds w_q(norm(x)) only
            (transformer.py:221).
          edges: (2, E) int32 [src(j), dst(i)] including self loops.
          edge_mask: (E,) bool.
        Returns: (n, h_dim).
        """
        n = x.shape[0]
        d = self.h_dim
        src, dst = edges[0], edges[1]

        lin = TorchLinear(d, use_bias=False, name="lin")(x)
        alpha_src = TorchLinear(d, use_bias=False, name="lin_src")(x)
        alpha_dst = TorchLinear(d, use_bias=False, name="lin_dst")(x)

        pos_diff = coords[dst] - coords[src]  # pos_i - pos_j
        delta = TorchLinear(d, name="pos_nn")(pos_diff)  # (E, d)
        alpha = alpha_src[dst] - alpha_dst[src] + delta
        alpha = TorchLinear(d, name="attn_nn")(alpha)

        mask = edge_mask & valid[src] & valid[dst]
        attn = segment_softmax(alpha, dst, num_segments=n, mask=mask)
        msg = attn * (lin[src] + delta)
        msg = jnp.where(mask[:, None], msg, 0.0)
        return segment_sum(msg, dst, num_segments=n)
