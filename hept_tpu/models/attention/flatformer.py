"""FlatFormer grouped window attention baseline.

Rebuilds reference src/models/attention/flatformer.py:37-150 +
window_utils.py:315-418: coordinates are discretized onto a BxB grid, four
serpentine window orderings (x / x-shift / y / y-shift) each sort points into
equal-size groups, and a full transformer BasicLayer (post-norm attention +
FFN) runs within the groups of each ordering. The reference's
FlattenedWindowMapping pad/replication machinery collapses to key-side
masking in our static layout (invalid rows sort last into their own groups).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..mlp import TorchLinear


def discretize_coords(coords, b: int):
    """Bin coords into [0, B) per dimension (window_utils.py:315-329)."""
    mn = jnp.min(coords, axis=-2, keepdims=True)
    mx = jnp.max(coords, axis=-2, keepdims=True)
    bucket = (mx - mn) / b
    out = jnp.floor((coords - mn) / jnp.maximum(bucket, 1e-12))
    return jnp.clip(out, 0, b - 1)


def serpentine_keys(dis_xy, b: int, num_slices: int, shifted: bool):
    """Serpentine window-major sort keys (window_utils.py:332-352,405-416).

    dis_xy: (n, 2) discretized [y, x] columns (reference coords[:, 2], [:, 3]).
    Returns (vx, vy) int32 sort keys.
    """
    n2 = m2 = b // num_slices  # window shape
    n1 = m1 = int(math.ceil(b / n2) + 1)
    y, x = dis_xy[:, 0], dis_xy[:, 1]
    if shifted:
        x = x + n2 // 2
        y = y + m2 // 2
    x1, y1 = x // n2, y // m2
    x2, y2 = x % n2, y % m2
    sgn = lambda t: jnp.where(t % 2 == 0, 1.0, -1.0)
    vx = (n1 * y1 + sgn(y1) * x1) * n2 * m2 + sgn(y1) * (m2 * x2 + sgn(x2) * y2)
    vy = (m1 * x1 + sgn(x1) * y1) * m2 * n2 + sgn(x1) * (n2 * y2 + sgn(y2) * x2)
    return vx, vy


class GroupAttention(nn.Module):
    """In-group attention (flatformer.py:37-83): softmax over the group for
    the pe path, or the HEPT-style normalized RBF kernel for rpe mode."""

    h_dim: int
    num_heads: int
    group_size: int
    num_w_per_dist: int
    pe_type: str

    @nn.compact
    def __call__(self, x, pe, key_valid, w_rpe_weight):
        n = x.shape[0]
        h, d, gs = self.num_heads, self.h_dim, self.group_size
        ng = n // gs
        v_in = x
        qk_in = x if self.pe_type == "rpe" else x + pe
        q = TorchLinear(d * h, use_bias=False, name="w_q")(qk_in)
        k = TorchLinear(d * h, use_bias=False, name="w_k")(qk_in)
        v = TorchLinear(d * h, use_bias=False, name="w_v")(v_in)

        def grp(t):
            return t.reshape(ng, gs, h, d).transpose(0, 2, 1, 3)  # (ng, h, gs, d)

        q, k, v = grp(q), grp(k), grp(v)
        kv = key_valid.reshape(ng, 1, 1, gs)

        if self.pe_type == "rpe":
            w = w_rpe_weight.reshape(h, d, -1, self.num_w_per_dist)
            qw = jnp.exp(jnp.minimum(w.sum(axis=1), 50.0)).sum(axis=-1)
            qw_e = jnp.concatenate([qw[:, :1], qw], axis=-1)
            sw = jnp.sqrt(2.0 * qw_e)[None] * pe[:, None, :]  # (n, h, cd)
            sw = sw.reshape(ng, gs, h, -1).transpose(0, 2, 1, 3)
            q_hat = jnp.concatenate([q, sw], axis=-1)
            k_hat = jnp.concatenate([k, sw], axis=-1)
            logits = jnp.einsum("ghie,ghje->ghij", q_hat, k_hat)
            q_sq = -0.5 * jnp.sum(q_hat**2, axis=-1, keepdims=True)
            k_sq = -0.5 * jnp.sum(k_hat**2, axis=-1, keepdims=True)
            p = jnp.exp(jnp.minimum(logits + q_sq + jnp.swapaxes(k_sq, -1, -2), 0.0))
            p = jnp.where(kv > 0.5, p, 0.0)
            from ...ops.bucket_attn import stable_ratio
            p = stable_ratio(p, jnp.sum(p, axis=-1, keepdims=True) + 1e-20)
            out = jnp.einsum("ghij,ghjd->ghid", p, v)
        else:
            temp = 1.0 / math.sqrt(d)
            logits = jnp.einsum("ghie,ghje->ghij", q * temp, k)
            logits = jnp.where(kv > 0.5, logits, -1e9)
            attn = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("ghij,ghjd->ghid", attn, v)

        out = out.transpose(0, 2, 1, 3).reshape(n, h * d)
        return TorchLinear(d, name="out_linear")(out)


class BasicLayer(nn.Module):
    """Post-norm attention + FFN (flatformer.py:86-103)."""

    h_dim: int
    num_heads: int
    group_size: int
    num_w_per_dist: int
    pe_type: str

    @nn.compact
    def __call__(self, x, pe, key_valid, w_rpe_weight):
        attn = GroupAttention(
            self.h_dim, self.num_heads, self.group_size,
            self.num_w_per_dist, self.pe_type, name="attn",
        )
        x = nn.LayerNorm(name="norm1")(x + attn(x, pe, key_valid, w_rpe_weight))
        ff = TorchLinear(2 * self.h_dim, name="fc1")(x)
        ff = nn.relu(ff)
        ff = TorchLinear(self.h_dim, name="fc2")(ff)
        return nn.LayerNorm(name="norm2")(x + ff)


class FlatformerAttention(nn.Module):
    h_dim: int
    num_heads: int
    group_size: int
    num_w_per_dist: int
    b_grid: int = 1000  # reference "B"
    num_slices_per_axis: int = 30
    pe_type: str = "learned"

    @nn.compact
    def __call__(self, x, *, coords, pe, valid, w_rpe_weight, **_):
        n = x.shape[0]
        assert n % self.group_size == 0
        dis = discretize_coords(coords[:, :2], self.b_grid)
        # reference layout: column 2 = y (coord 0), column 3 = x (coord 1)
        dis_yx = jnp.stack([dis[:, 0], dis[:, 1]], axis=1)
        vx0, vy0 = serpentine_keys(dis_yx, self.b_grid, self.num_slices_per_axis, False)
        vx1, vy1 = serpentine_keys(dis_yx, self.b_grid, self.num_slices_per_axis, True)

        big = jnp.asarray(3.0e38, jnp.float32)
        all_x = []
        for i, keys in enumerate([vx0, vx1, vy0, vy1]):
            keys = jnp.where(valid, keys.astype(jnp.float32), big)
            idx = jnp.argsort(keys)
            inv = jnp.zeros_like(idx).at[idx].set(jnp.arange(n, dtype=idx.dtype))
            layer = BasicLayer(
                self.h_dim, self.num_heads, self.group_size,
                self.num_w_per_dist, self.pe_type, name=f"block_{i}",
            )
            out_sorted = layer(
                x[idx], pe[idx], valid[idx].astype(jnp.float32), w_rpe_weight
            )
            x = out_sorted[inv]
            all_x.append(x)
        return x, all_x
