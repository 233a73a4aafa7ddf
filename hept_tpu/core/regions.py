"""AND-construction region machinery.

The reference's AND hashes are *spatial quantile partitions*: each (OR-hash,
head) pair draws random region counts for eta and phi, points are ranked along
each coordinate, and rank // region_size yields an integer region index
(`/root/reference/src/models/model_utils/hash_utils.py:14-39`,
`/root/reference/example/hept_utils.py:6-31`). Region indices are later packed
into a single integer "AND code" that is added (scaled by the hash span) to the
E2LSH value, so one argsort groups points by (region, hash bucket).

All functions are pure and static-shape; `get_regions` is host/init-time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .buckets import invert_permutation


def get_regions(
    key: jax.Array,
    num_regions: int,
    n_hashes: int,
    num_heads: int,
    num_and_hashes: int = 2,
) -> jax.Array:
    """Draw random per-(hash, head) region counts for each AND dimension.

    Counts are drawn uniformly in [lb, ub], rescaled so their product is
    `num_regions`, and rounded to thirds — replicating the reference's
    construction exactly (hash_utils.py:25-39), since the rounding changes
    bucketing and therefore accuracy.

    Returns: (n_hashes, num_and_hashes, num_heads) float32.
    """
    lb = 2.0
    ub = 2.0 * num_regions ** (1.0 / num_and_hashes) - lb
    # Reference draws rows in a flat loop of length n_hashes * num_heads and
    # reshapes "(h c) a -> c a h": the loop index runs heads-major.
    flat = jax.random.uniform(
        key, (num_heads * n_hashes, num_and_hashes), dtype=jnp.float32
    ) * (ub - lb) + lb
    scale = (num_regions / jnp.prod(flat, axis=1, keepdims=True)) ** (
        1.0 / num_and_hashes
    )
    flat = scale * flat
    flat = jnp.round(flat * 3.0) / 3.0
    # (h*c, a) -> (h, c, a) -> (c, a, h)
    return flat.reshape(num_heads, n_hashes, num_and_hashes).transpose(1, 2, 0)


def quantile_partition(
    sorted_indices: jax.Array,
    num_regions: jax.Array,
    n_points: jax.Array | int | None = None,
) -> jax.Array:
    """Assign each point an integer region id by coordinate rank.

    Args:
      sorted_indices: (n,) argsort of one coordinate (point index at each rank).
      num_regions: (R, 1) float region counts (one row per hash*head).
      n_points: point count used for the region size. Defaults to the array
        length (src parity — the reference partitions the *padded* array,
        transformer.py:49-54). The batched example variant partitions each
        graph's real points only (example/transformer.py:44-51), so callers
        with padded buffers pass the per-event valid count here.
    Returns:
      (R, n) float region ids in [1, ...]: `rank // ceil(n / num_regions) + 1`
      (reference hash_utils.py:14-22).
    """
    n = sorted_indices.shape[-1]
    total = n if n_points is None else n_points
    region_size = jnp.ceil(total / num_regions)  # (R, 1)
    ranks = invert_permutation(sorted_indices).astype(jnp.float32)  # (n,)
    return jnp.floor(ranks[None, :] / region_size) + 1.0


def region_codes(
    coords: jax.Array,
    regions: jax.Array,
    valid_mask: jax.Array | None = None,
    n_points: jax.Array | int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Compute per-(hash*head) eta/phi region indices for one event.

    Args:
      coords: (n, >=2) point coordinates; columns 0/1 are eta/phi.
      regions: (n_hashes, 2, num_heads) from `get_regions`.
      valid_mask: optional (n,) bool; invalid (pad) points sort last
        (reference pads coords with +inf before the argsort,
        src/models/baselines/transformer.py:48-50).
    Returns:
      (region_eta, region_phi): each (n_hashes * num_heads, n) float.
    """
    eta, phi = coords[:, 0], coords[:, 1]
    if valid_mask is not None:
        big = jnp.asarray(jnp.finfo(coords.dtype).max, coords.dtype)
        eta = jnp.where(valid_mask, eta, big)
        phi = jnp.where(valid_mask, phi, big)
    sorted_eta_idx = jnp.argsort(eta)
    sorted_phi_idx = jnp.argsort(phi)
    # regions: (c, a, h) -> regions_h: (a, c*h)
    c, _, h = regions.shape
    regions_h = regions.transpose(1, 0, 2).reshape(2, c * h)
    region_eta = quantile_partition(sorted_eta_idx, regions_h[0][:, None], n_points)
    region_phi = quantile_partition(sorted_phi_idx, regions_h[1][:, None], n_points)
    return region_eta, region_phi


def geo_code(region_eta: jax.Array, region_phi: jax.Array, regions: jax.Array) -> jax.Array:
    """Combine eta/phi region indices into one scalar AND code (src variant).

    The reference adds `region_eta * hash_shift` and
    `region_phi * hash_shift * (ceil(eta_region_count) + 1)` to the hash
    values (src/models/attention/hept.py:46-56). Factoring out `hash_shift`,
    the integer part is `region_eta + region_phi * (ceil(eta_regions) + 1)` —
    a mixed-radix code with eta as the fast axis. Returns (c, h, n) float.
    """
    c, _, h = regions.shape
    regions_h = regions.transpose(1, 0, 2).reshape(2, c * h)
    multiplier = jnp.ceil(regions_h[0])[:, None] + 1.0  # (c*h, 1)
    code = region_eta + region_phi * multiplier  # (c*h, n)
    return code.reshape(c, h, -1)
