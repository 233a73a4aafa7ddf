"""Torch checkpoint converter: reference `.pt` state_dicts → flax variables.

Ingests the reference layout (example/ Transformer state_dict, as shipped in
`example/ckpt/tracking-60k-model.pt`) for parity testing and warm starts
(SURVEY §5 "checkpoint/resume": a converter that can ingest the reference
`.pt` layout). Torch Linear weights are (out, in) and transpose into flax
(in, out) kernels; `w_rpe` stays torch-layout (the model consumes the raw
weight); `e2lsh.alpha` and `regions` go to the "constants" collection.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np


def _lin(sd, name):
    out = {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T)}
    if f"{name}.bias" in sd:
        out["bias"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
    return out


def _ln(sd, name):
    return {
        "scale": jnp.asarray(np.asarray(sd[f"{name}.weight"])),
        "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"])),
    }


def convert_reference_hept(state_dict: Mapping, n_layers: int = 4) -> dict:
    """Convert the reference example-variant HEPT Transformer state_dict.

    Returns a flax `variables` dict {"params": ..., "constants": ...} matching
    `hept_tpu.models.HeptTransformer` (attn_type="hept").
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {
        "feat_enc_0": _lin(sd, "feat_encoder.0"),
        "feat_enc_1": _lin(sd, "feat_encoder.2"),
        "W": {"kernel": jnp.asarray(sd["W.weight"].T)},
    }
    constants: dict = {"regions": jnp.asarray(sd["regions"])}

    for i in range(n_layers):
        p = f"attns.{i}"
        params[f"block_{i}"] = {
            "w_q": _lin(sd, f"{p}.w_q"),
            "w_k": _lin(sd, f"{p}.w_k"),
            "w_v": _lin(sd, f"{p}.w_v"),
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "ff": {
                "TorchLinear_0": _lin(sd, f"{p}.ff.0"),
                "TorchLinear_1": _lin(sd, f"{p}.ff.2"),
            },
            "w_rpe": jnp.asarray(sd[f"{p}.w_rpe.weight"]),
            "attn": {"out_linear": _lin(sd, f"{p}.attn.out_linear")},
        }
        constants[f"block_{i}"] = {
            "attn": {"e2lsh_alpha": jnp.asarray(sd[f"{p}.attn.e2lsh.alpha"])}
        }

    mlp: dict = {}
    n_mlp = 5
    for j in range(n_mlp):
        mlp[f"TorchLinear_{j}"] = _lin(sd, f"mlp_out.lins.{j}")
    for j in range(n_mlp - 1):
        mlp[f"LayerNorm_{j}"] = _ln(sd, f"mlp_out.norms.{j}")
    params["mlp_out"] = mlp

    if "out_proj.weight" in sd:
        params["out_proj"] = _lin(sd, "out_proj")
    if "pids_enc.weight" in sd:
        params["pids_enc"] = {"embedding": jnp.asarray(sd["pids_enc.weight"])}

    return {"params": params, "constants": constants}


def load_reference_checkpoint(path: str, n_layers: int = 4) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_reference_hept(sd, n_layers=n_layers)
