"""Static-shape sparse 3D convolution machinery (spconv-equivalent for TPU).

The reference's middle encoder is spconv's CUDA submanifold/strided sparse conv
(reference requirements.txt:20-21, invoked at
models/detectors/adversarial_voxelnet.py:141). This module re-designs it for
XLA/TPU:

  * Active voxels are kept **sorted by flattened (z, y, x) id** with padding
    rows carrying a +inf sentinel. The voxelizer emits this order already, and
    downsampling preserves it, so no hash tables are needed.
  * Neighbor resolution = vectorized binary search (`searchsorted`) over the
    sorted ids — O(N · K · log N) gathers, all VPU-friendly, zero HBM blowup
    (a dense coord->index table for KITTI's [41,1600,1408] grid would cost
    369 MB per stage per sample).
  * A K-tap conv is an img2col gather into [N, K*Cin] followed by a single
    [N, K*Cin] x [K*Cin, Cout] matmul — exactly the MXU's preferred shape.
  * Strided ("regular") sparse conv computes its output site set the way
    spconv does — the union of all output positions whose kernel window
    covers an active input — via candidate generation + sort-unique, capped
    at a static `out_cap`.

All functions are per-sample; batch via `jax.vmap`.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INT32_MAX = np.iinfo(np.int32).max


class SparseGrid(NamedTuple):
    """A set of active voxels on a dense grid, sorted by flat id."""

    flat_ids: jnp.ndarray  # [N] int32 sorted ascending, padding = INT32_MAX
    coords: jnp.ndarray    # [N, 3] (z, y, x) int32; padding rows = -1
    mask: jnp.ndarray      # [N] bool
    spatial_shape: Tuple[int, int, int]  # static (D, H, W)


def flatten_coords(coords: jnp.ndarray, mask: jnp.ndarray, spatial_shape) -> jnp.ndarray:
    D, H, W = spatial_shape
    flat = coords[:, 0] * (H * W) + coords[:, 1] * W + coords[:, 2]
    return jnp.where(mask, flat, INT32_MAX).astype(jnp.int32)


def make_grid(coords: jnp.ndarray, mask: jnp.ndarray, spatial_shape) -> SparseGrid:
    """Build a SparseGrid from (possibly unsorted) coords; sorts by flat id."""
    flat = flatten_coords(coords, mask, spatial_shape)
    order = jnp.argsort(flat)
    return SparseGrid(flat[order], coords[order], mask[order], tuple(spatial_shape))


def kernel_offsets(kernel_size: Sequence[int]) -> np.ndarray:
    """All (dz, dy, dx) taps of a kernel, row-major. [K, 3] int32 (static)."""
    kd, kh, kw = kernel_size
    zz, yy, xx = np.meshgrid(np.arange(kd), np.arange(kh), np.arange(kw), indexing="ij")
    return np.stack([zz.ravel(), yy.ravel(), xx.ravel()], axis=1).astype(np.int32)


def lookup(grid: SparseGrid, query_flat: jnp.ndarray) -> jnp.ndarray:
    """Find positions of query flat-ids in the grid. Misses -> N (one-past-end).

    query_flat: [...] int32. Returns int32 indices in [0, N].
    """
    n = grid.flat_ids.shape[0]
    j = jnp.searchsorted(grid.flat_ids, query_flat).astype(jnp.int32)
    j_safe = jnp.clip(j, 0, n - 1)
    hit = (grid.flat_ids[j_safe] == query_flat) & (query_flat != INT32_MAX)
    return jnp.where(hit, j_safe, n)


def _tap_queries(
    out_coords: jnp.ndarray,
    out_mask: jnp.ndarray,
    offsets: np.ndarray,
    stride: Sequence[int],
    padding: Sequence[int],
    in_shape: Tuple[int, int, int],
) -> jnp.ndarray:
    """Input flat-ids each output site reads for each kernel tap.

    For output site o and tap k, the input coordinate is
    `o * stride - padding + offset_k`. Out-of-range / padding queries get the
    sentinel. Returns [N_out, K] int32.
    """
    s = jnp.asarray(stride, jnp.int32)
    p = jnp.asarray(padding, jnp.int32)
    base = out_coords * s[None, :] - p[None, :]  # [N, 3]
    q = base[:, None, :] + jnp.asarray(offsets, jnp.int32)[None, :, :]  # [N, K, 3]
    D, H, W = in_shape
    in_bounds = (
        (q[..., 0] >= 0) & (q[..., 0] < D)
        & (q[..., 1] >= 0) & (q[..., 1] < H)
        & (q[..., 2] >= 0) & (q[..., 2] < W)
    ) & out_mask[:, None]
    flat = q[..., 0] * (H * W) + q[..., 1] * W + q[..., 2]
    return jnp.where(in_bounds, flat, INT32_MAX).astype(jnp.int32)


def gather_neighbors(
    features: jnp.ndarray,
    in_grid: SparseGrid,
    out_coords: jnp.ndarray,
    out_mask: jnp.ndarray,
    offsets: np.ndarray,
    stride: Sequence[int] = (1, 1, 1),
    padding: Sequence[int] = (1, 1, 1),
) -> jnp.ndarray:
    """img2col gather: per output site, the [K, Cin] neighborhood (0 for misses).

    Args:
        features: [N_in, Cin] aligned with `in_grid` rows.
    Returns:
        [N_out, K, Cin].
    """
    queries = _tap_queries(out_coords, out_mask, offsets, stride, padding, in_grid.spatial_shape)
    idx = lookup(in_grid, queries)  # [N_out, K] in [0, N_in]
    feats_pad = jnp.concatenate([features, jnp.zeros((1,) + features.shape[1:], features.dtype)], 0)
    return feats_pad[idx]


def sort_unique(flat_ids: jnp.ndarray, cap: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unique valid flat-ids, ascending, padded to `cap` with the sentinel.

    Args:
        flat_ids: [M] int32 candidates (sentinel = invalid).
    Returns:
        (unique_ids [cap], count scalar int32). Ids beyond `cap` are dropped
        (spatial-order truncation, mirrors max_voxels-style caps).
    """
    s = jnp.sort(flat_ids)
    is_first = jnp.concatenate([s[:1] != INT32_MAX, (s[1:] != s[:-1]) & (s[1:] != INT32_MAX)])
    rank = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    keep = is_first & (rank < cap)
    out = jnp.full((cap + 1,), INT32_MAX, jnp.int32).at[
        jnp.where(keep, rank, cap)
    ].set(jnp.where(keep, s, INT32_MAX))[:cap]
    count = jnp.minimum(jnp.sum(is_first), cap).astype(jnp.int32)
    return out, count


def downsample_sites(
    in_grid: SparseGrid,
    kernel_size: Sequence[int],
    stride: Sequence[int],
    padding: Sequence[int],
    out_cap: int,
) -> SparseGrid:
    """Output active set of a regular (non-submanifold) strided sparse conv.

    spconv semantics: an output position o is active iff its receptive window
    `o*stride - padding + [0, k)` contains an active input. We generate, for
    every input voxel and tap, the candidate `o = (i + padding - tap) / stride`
    (valid when divisible and in range), then sort-unique with a static cap.
    """
    kd, kh, kw = kernel_size
    D, H, W = in_grid.spatial_shape
    out_shape = tuple(
        (dim + 2 * p - k) // s + 1
        for dim, k, s, p in zip((D, H, W), kernel_size, stride, padding)
    )
    offs = jnp.asarray(kernel_offsets(kernel_size), jnp.int32)  # [K,3]
    s = jnp.asarray(stride, jnp.int32)
    p = jnp.asarray(padding, jnp.int32)
    num = in_grid.coords[:, None, :] + p[None, None, :] - offs[None, :, :]  # [N,K,3]
    divisible = jnp.all(num % s[None, None, :] == 0, axis=-1)
    o = num // s[None, None, :]
    oD, oH, oW = out_shape
    in_bounds = (
        (o[..., 0] >= 0) & (o[..., 0] < oD)
        & (o[..., 1] >= 0) & (o[..., 1] < oH)
        & (o[..., 2] >= 0) & (o[..., 2] < oW)
    )
    valid = divisible & in_bounds & in_grid.mask[:, None]
    flat = o[..., 0] * (oH * oW) + o[..., 1] * oW + o[..., 2]
    flat = jnp.where(valid, flat, INT32_MAX).astype(jnp.int32).reshape(-1)
    uniq, count = sort_unique(flat, out_cap)
    mask = jnp.arange(out_cap) < count
    cz = uniq // (oH * oW)
    cy = (uniq % (oH * oW)) // oW
    cx = uniq % oW
    coords = jnp.where(mask[:, None], jnp.stack([cz, cy, cx], 1), -1).astype(jnp.int32)
    return SparseGrid(uniq, coords, mask, out_shape)


def scatter_to_dense(
    features: jnp.ndarray, grid: SparseGrid
) -> jnp.ndarray:
    """Scatter sparse features into a dense [D, H, W, C] grid (padding dropped)."""
    D, H, W = grid.spatial_shape
    n = features.shape[0]
    c = features.shape[1]
    safe_coords = jnp.where(grid.mask[:, None], grid.coords, 0)
    z, y, x = safe_coords[:, 0], safe_coords[:, 1], safe_coords[:, 2]
    # route padding rows to a scratch cell that we never read back
    z = jnp.where(grid.mask, z, D)
    dense = jnp.zeros((D + 1, H, W, c), features.dtype).at[z, y, x].add(
        jnp.where(grid.mask[:, None], features, 0.0)
    )
    return dense[:D]
