"""Submanifold sparse convolution with a gather-only custom VJP.

Forward: img2col gather + one MXU matmul (ops/sparse.py machinery). The
default autodiff backward of a gather is a scatter-add — measured ~6x slower
than the gather on TPU. For *submanifold* convs the neighbor relation is
symmetric: site j appears in site i's tap k exactly when i appears in j's
spatially-mirrored tap K-1-k (3^d kernels are symmetric under negation). So
d_feats is ANOTHER img2col gather of the output cotangent with reversed taps
and transposed weights — no scatter anywhere:

    d_feats[j] = sum_k  d_out[nbr_{-k}(j)] @ W_k^T
               = img2col(d_out, idx[:, ::-1]) @ W_rev^T

d_W re-gathers the forward col (same cost class as the forward; the col is
never stored, which also removes the biggest remat buffer).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gather_col(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats [N, C], idx [N, K] in [0, N] (N = miss) -> col [N, K*C]."""
    n, c = feats.shape
    feats_pad = jnp.concatenate([feats, jnp.zeros((1, c), feats.dtype)], 0)
    return feats_pad[idx].reshape(idx.shape[0], idx.shape[1] * c)


@partial(jax.custom_vjp, nondiff_argnums=())
def subm_conv(feats: jnp.ndarray, kernel: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats [N, Cin], kernel [K*Cin, Cout], idx [N, K] -> [N, Cout]."""
    col = _gather_col(feats, idx)
    return jnp.dot(col, kernel, preferred_element_type=jnp.float32)


def _fwd(feats, kernel, idx):
    out = subm_conv(feats, kernel, idx)
    return out, (feats, kernel, idx)


def _bwd(res, g):
    feats, kernel, idx = res
    n, cin = feats.shape
    kcin, cout = kernel.shape
    k = kcin // cin
    # d_col = g @ W^T, laid out [N, K, Cin]
    # d_feats[j] = sum_k d_col[nbr_{-k}(j), k] ; mirrored tap = K-1-k, and
    # misses (idx == N) contribute nothing because g is padded with a zero row
    # d_feats[j] = sum_k d_col[idx[j, K-1-k], k]
    #            = sum_k g[idx[j, K-1-k]] @ W_k^T
    # (reversing a row-major flattened kernel index mirrors every axis, which
    # is exactly the offset negation the symmetry needs)
    w_k = kernel.reshape(k, cin, cout)
    w_t = jnp.transpose(w_k, (0, 2, 1)).reshape(k * cout, cin)
    g_col = _gather_col(g, idx[:, ::-1])  # [N, K*Cout], slot k = mirrored tap
    d_feats = jnp.dot(g_col, w_t, preferred_element_type=jnp.float32)

    col = _gather_col(feats, idx)
    d_kernel = jnp.dot(col.T, g, preferred_element_type=jnp.float32)
    return d_feats, d_kernel, None


subm_conv.defvjp(_fwd, _bwd)


def strided_conv(feats: jnp.ndarray, kernel: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Non-submanifold (strided) conv: plain gather-matmul with autodiff
    backward (scatter-add). Prefer :func:`strided_conv_t` with an inverse
    index; this form remains for tests and as a reference implementation."""
    col = _gather_col(feats, idx)
    return jnp.dot(col, kernel, preferred_element_type=jnp.float32)


@jax.custom_vjp
def strided_conv_t(
    feats: jnp.ndarray, kernel: jnp.ndarray, idx: jnp.ndarray, inv_idx: jnp.ndarray
) -> jnp.ndarray:
    """Strided conv with a gather-only backward via the inverse index.

    idx [N_out, K]: input row each output reads per tap (misses -> N_in).
    inv_idx [N_in, K]: output row that reads each input at tap k
    (sparse.inverse_neighbor_index; misses -> N_out). Then
        d_feats[i] = sum_k g[inv_idx[i, k]] @ W_k^T
    — no scatter in the whole conv.
    """
    col = _gather_col(feats, idx)
    return jnp.dot(col, kernel, preferred_element_type=jnp.float32)


def _st_fwd(feats, kernel, idx, inv_idx):
    return strided_conv_t(feats, kernel, idx, inv_idx), (feats, kernel, idx, inv_idx)


def _st_bwd(res, g):
    feats, kernel, idx, inv_idx = res
    n, cin = feats.shape
    kcin, cout = kernel.shape
    k = kcin // cin
    w_t = jnp.transpose(kernel.reshape(k, cin, cout), (0, 2, 1)).reshape(k * cout, cin)
    g_col = _gather_col(g, inv_idx)  # [N_in, K*Cout], tap-aligned (no mirror)
    d_feats = jnp.dot(g_col, w_t, preferred_element_type=jnp.float32)
    col = _gather_col(feats, idx)
    d_kernel = jnp.dot(col.T, g, preferred_element_type=jnp.float32)
    return d_feats, d_kernel, None, None


strided_conv_t.defvjp(_st_fwd, _st_bwd)
