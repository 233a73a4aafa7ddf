"""GNN baselines: GNNStack backbone + gated / GCN / DGCNN / GravNet convs.

Rebuilds reference src/models/baselines/gnns.py with TPU-regular primitives:
PyG MessagePassing scatters become masked `segment_*` reductions over padded
static edge arrays; `torch_cluster.knn` (dynamic kNN in a learned space, used
by DGCNN/GravNet) becomes the tiled brute-force `knn_brute_force` top-k —
O(N²/tiles) but fully regular (SURVEY §2.8).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.knn import knn_brute_force
from ..ops.segment import segment_mean, segment_sum
from .mlp import OutMLP, TorchLinear
from .transformer import TransformerConfig


class GatedConv(nn.Module):
    """Gated message passing with Δeta/Δphi/ΔR edge geometry and a global
    node (reference gnns.py:125-180); aggr = mean."""

    h_dim: int

    @nn.compact
    def __call__(self, x, *, coords, edges, edge_mask, valid, **_):
        n, f = x.shape
        src, dst = edges[0], edges[1]
        mask = edge_mask & valid[src] & valid[dst]
        eta_phi = coords[:, :2]

        d_ep = eta_phi[src] - eta_phi[dst]  # x_j - x_i
        # wrap phi into (-pi, pi] (gnns.py:150-152)
        phi = d_ep[:, 1]
        wrap = phi > math.pi
        phi = jnp.where(wrap, phi - jnp.ceil((phi - math.pi) / (2 * math.pi)) * 2 * math.pi, phi)
        d_ep = jnp.stack([d_ep[:, 0], phi], axis=1)
        w = self.param("edge_weight_w", nn.initializers.normal(1.0), (1, 1))
        d_r = jnp.exp(-jnp.sum(d_ep**2, axis=1, keepdims=True) / jnp.exp(w[0, 0]))

        n_valid = jnp.maximum(jnp.sum(valid), 1)
        x_masked = jnp.where(valid[:, None], x, 0.0)
        x_g = jnp.sum(x_masked, axis=0) / n_valid
        log_count = jnp.log(n_valid.astype(jnp.float32))

        xg_e = jnp.broadcast_to(x_g[None], (src.shape[0], f))
        lc_e = jnp.full((src.shape[0], 1), 0.0) + log_count
        msg = jnp.concatenate([x[src], x[dst], xg_e, d_ep, d_r, lc_e], axis=-1)
        gate = nn.sigmoid(TorchLinear(1, name="lin_m2")(msg))
        msg = msg * gate
        msg = jnp.where(mask[:, None], msg, 0.0)
        aggr = segment_mean(msg, dst, num_segments=n, weights=mask.astype(x.dtype))

        xg_n = jnp.broadcast_to(x_g[None], (n, f))
        lc_n = jnp.full((n, 1), 0.0) + log_count
        upd = jnp.concatenate([aggr, x, xg_n, lc_n], axis=-1)
        g = nn.sigmoid(TorchLinear(1, name="lin_m5")(upd))
        out = nn.relu(
            g * TorchLinear(self.h_dim, name="lin_m5_g1")(x)
            + (1 - g) * TorchLinear(self.h_dim, name="lin_m5_g2")(aggr)
        )
        return out


class GCNConv(nn.Module):
    """GCN with learnable RBF edge weights exp(-dist²/w) (gnns.py:183-191;
    the -dist² is precomputed by utils.py:17-23 and divided by exp(w) here).
    Symmetric deg^-1/2 normalization with self loops (weight 1)."""

    h_dim: int

    @nn.compact
    def __call__(self, x, *, edges, edge_mask, edge_weight, valid, **_):
        n = x.shape[0]
        src, dst = edges[0], edges[1]
        mask = (edge_mask & valid[src] & valid[dst]).astype(x.dtype)
        w = self.param("edge_weight_w", nn.initializers.normal(1.0), (1, 1))
        ew = jnp.exp(edge_weight[:, 0] / jnp.exp(w[0, 0])) * mask

        h = TorchLinear(self.h_dim, use_bias=False, name="lin")(x)
        # add self loops with weight 1 on valid nodes
        deg = segment_sum(ew, dst, num_segments=n) + valid.astype(x.dtype)
        dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
        norm = dinv[src] * ew * dinv[dst]
        out = segment_sum(norm[:, None] * h[src], dst, num_segments=n)
        # self loops with weight 1: contribution dinv_i² · h_i
        out = out + (dinv * dinv * valid.astype(x.dtype))[:, None] * h
        bias = self.param("bias", nn.initializers.zeros, (self.h_dim,))
        return out + bias


class DGCNNConv(nn.Module):
    """DynamicEdgeConv whose kNN graph is built in a learned projection space
    (gnns.py:194-255): edge MLP on [x_i, x_j - x_i]... the reference uses
    [x_i, x_j] pairs? PyG EdgeConv uses [x_i, x_j - x_i]; DynamicEdgeConv's
    default nn input is 2*in: cat([x_i, x_j - x_i]). aggr = mean."""

    h_dim: int
    k: int = 8
    knn_dim: int = 4

    @nn.compact
    def __call__(self, x, *, valid, **_):
        n = x.shape[0]
        s = TorchLinear(self.knn_dim, name="lin_s")(x)
        _, idx = knn_brute_force(s, s, self.k + 1, valid=valid)  # includes self
        idx = idx[:, 1:]  # (n, k) neighbours
        xi = jnp.repeat(x[:, None, :], self.k, axis=1)
        xj = x[idx]
        msg = jnp.concatenate([xi, xj - xi], axis=-1).reshape(n * self.k, -1)
        h = TorchLinear(self.h_dim, name="nn0")(msg)
        h = nn.LayerNorm(name="ln0")(h)
        h = nn.relu(h)
        h = TorchLinear(self.h_dim, name="nn1")(h)
        h = nn.LayerNorm(name="ln1")(h)
        h = nn.relu(h)
        h = h.reshape(n, self.k, self.h_dim)
        return jnp.mean(h, axis=1)


class GravNetConv(nn.Module):
    """GravNet with learned kNN space and Gaussian edge weights
    (gnns.py:258-298 + PyG GravNetConv): mean & max aggregation of
    weighted projected features."""

    h_dim: int
    k: int = 8
    knn_dim: int = 4
    propagate_dim: int = 32

    @nn.compact
    def __call__(self, x, *, valid, **_):
        n = x.shape[0]
        h_l = TorchLinear(self.propagate_dim, name="lin_h")(x)
        s = TorchLinear(self.knn_dim, name="lin_s")(x)
        d2, idx = knn_brute_force(s, s, self.k + 1, valid=valid)
        d2, idx = d2[:, 1:], idx[:, 1:]
        w = self.param("edge_weight_w", nn.initializers.normal(1.0), (1,))
        ew = jnp.exp(-d2 * jnp.exp(w[0]))  # (n, k)
        feats = h_l[idx] * ew[..., None]  # (n, k, prop)
        nbr_valid = valid[idx][..., None]
        feats = jnp.where(nbr_valid, feats, 0.0)
        mean_agg = jnp.sum(feats, axis=1) / jnp.maximum(
            jnp.sum(nbr_valid, axis=1), 1
        )
        max_agg = jnp.max(jnp.where(nbr_valid, feats, -jnp.inf), axis=1)
        max_agg = jnp.where(jnp.isfinite(max_agg), max_agg, 0.0)
        out = jnp.concatenate([mean_agg, max_agg], axis=-1)
        return TorchLinear(self.h_dim, name="lin_out1")(x) + TorchLinear(
            self.h_dim, name="lin_out2"
        )(out)


_CONVS = {
    "gatedgnn": GatedConv,
    "gcn": GCNConv,
    "dgcnn": DGCNNConv,
    "gravnet": GravNetConv,
}


class GNNStack(nn.Module):
    """GNN backbone mirroring the transformer skeleton (gnns.py:20-122):
    pre-FF (LN+Linear) -> conv -> residual dropout -> FF block -> concat all
    layers -> W -> OutMLP residual head -> task head."""

    cfg: TransformerConfig
    conv_type: str = "gcn"
    k: int = 8
    knn_dim: int = 4

    @nn.compact
    def __call__(self, x, coords, valid, *, edges=None, edge_mask=None,
                 edge_weight=None, deterministic: bool = True):
        cfg = self.cfg
        n = x.shape[0]

        if cfg.task == "pileup":
            pids = x[..., -1].astype(jnp.int32)
            pid_emb = nn.Embed(7, 10, name="pids_enc")(jnp.clip(pids, 0, 6))
            x = jnp.concatenate([x[..., :-1], pid_emb], axis=-1)

        h = TorchLinear(cfg.h_dim, name="feat_enc_0")(x)
        h = nn.relu(h)
        h = TorchLinear(cfg.h_dim, name="feat_enc_1")(h)

        conv_cls = _CONVS[self.conv_type]
        all_layers = [h]
        for i in range(cfg.n_layers):
            pre = TorchLinear(cfg.h_dim, name=f"pre_ff_{i}")(
                nn.LayerNorm(name=f"pre_ln_{i}")(h)
            )
            kw = dict(coords=coords, valid=valid)
            if self.conv_type in ("gatedgnn", "gcn"):
                kw.update(edges=edges, edge_mask=edge_mask)
            if self.conv_type == "gcn":
                kw.update(edge_weight=edge_weight)
            if self.conv_type in ("dgcnn", "gravnet"):
                conv = conv_cls(cfg.h_dim, k=self.k, knn_dim=self.knn_dim,
                                name=f"conv_{i}")
            else:
                conv = conv_cls(cfg.h_dim, name=f"conv_{i}")
            aggr = conv(pre, **kw)
            h = h + nn.Dropout(0.1, deterministic=deterministic)(aggr)
            ff = TorchLinear(cfg.h_dim, name=f"ff0_{i}")(
                nn.LayerNorm(name=f"norm2_{i}")(h)
            )
            ff = nn.relu(ff)
            ff = TorchLinear(cfg.h_dim, name=f"ff1_{i}")(ff)
            h = h + nn.Dropout(0.1, deterministic=deterministic)(ff)
            all_layers.append(h)

        cat = jnp.concatenate(all_layers, axis=-1)
        # tracking: W outputs out_dim directly; pileup: h_dim//2 then out_proj
        # (reference gnns.py:29-34,66)
        w_out = cfg.h_dim // 2 if cfg.task == "pileup" else (cfg.out_dim or cfg.h_dim // 2)
        out = TorchLinear(w_out, use_bias=False, name="W")(cat)
        mlp = OutMLP(w_out, name="mlp_out")(out)
        out = out + nn.Dropout(0.1, deterministic=deterministic)(mlp)
        if cfg.task == "pileup":
            out = TorchLinear(cfg.num_classes, name="out_proj")(out)
            out = nn.sigmoid(out)
        return out
