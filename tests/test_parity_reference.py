"""Golden-value parity vs the PyTorch reference, used as a runtime oracle.

`/root/reference/example/hept.py` is importable with CPU torch + einops (no
torch_geometric). We instantiate the reference HEPTAttention, export its
weights into our flax module, and require the outputs to match to fp32
tolerance on identical inputs — the strongest form of the SURVEY §4 golden
tests.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hept_tpu.models.attention.hept import HeptAttention  # noqa: E402

REF_EXAMPLE = "/root/reference/example"


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REF_EXAMPLE)
    try:
        import hept as ref_hept  # noqa: F401
        import hept_utils as ref_utils  # noqa: F401
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference example not importable: {e}")
    finally:
        sys.path.remove(REF_EXAMPLE)
    return ref_hept, ref_utils


def test_attention_matches_reference(ref_modules):
    ref_hept, _ = ref_modules
    torch.manual_seed(0)

    n, h, d, cd = 64, 2, 8, 3
    bs, c, nw = 16, 3, 4
    hash_dim = d + cd

    ref_attn = ref_hept.HEPTAttention(
        hash_dim,
        h_dim=d,
        num_heads=h,
        block_size=bs,
        n_hashes=c,
        num_w_per_dist=nw,
    ).double()
    w_rpe = torch.nn.Linear(nw * (cd - 1), h * d).double()

    q = torch.randn(n, h * d, dtype=torch.float64)
    k = torch.randn(n, h * d, dtype=torch.float64)
    v = torch.randn(n, h * d, dtype=torch.float64)
    coords = torch.randn(n, cd, dtype=torch.float64)
    combined_shifts = torch.randint(0, 5, (c, h, n))

    with torch.no_grad():
        ref_out = ref_attn(
            q, k, v, coords=coords, w_rpe=w_rpe, combined_shifts=combined_shifts
        )

    # Export weights into the flax module.
    model = HeptAttention(
        h_dim=d, num_heads=h, block_size=bs, n_hashes=c,
        num_w_per_dist=nw, coords_dim=cd, impl="xla",
    )
    params = {
        "out_linear": {
            "kernel": jnp.asarray(ref_attn.out_linear.weight.detach().numpy().T),
            "bias": jnp.asarray(ref_attn.out_linear.bias.detach().numpy()),
        }
    }
    constants = {"e2lsh_alpha": jnp.asarray(ref_attn.e2lsh.alpha.detach().numpy())}

    out = model.apply(
        {"params": params, "constants": constants},
        jnp.asarray(q.numpy()),
        jnp.asarray(k.numpy()),
        jnp.asarray(v.numpy()),
        coords=jnp.asarray(coords.numpy()),
        codes=jnp.asarray(combined_shifts.numpy()),
        w_rpe_weight=jnp.asarray(w_rpe.weight.detach().numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy(), rtol=2e-4, atol=2e-5
    )
