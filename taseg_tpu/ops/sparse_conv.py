"""Sparse 3D convolution: gather → batched MXU matmul, scatter-free VJP.

TPU-native replacement for the reference's per-offset gather-GEMM-scatter
CUDA kernels (torchsparse `backend/convolution/convolution_cuda.cu:52-165`).
With a dense (K, V_out) rulebook the output row for voxel v is

    out[v] = sum_k  feats[rb_fwd[k, v]] * (rb_fwd[k, v] >= 0)  @  W[k]

i.e. K gathers + one `einsum('kvi,kio->vo')` on the MXU.

The backward pass is a *custom VJP*: XLA would autodiff the gather into a
scatter-add, and scatters on TPU are erratically slow (measured 10-1000x
off bandwidth).  Instead the input gradient is itself a sparse conv through
the *reverse* rulebook:

    d_feats[i] = sum_k  d_out[rb_bwd[k, i]]  @  W[k]^T
    d_W[k]     = gathered_k^T @ d_out

For stride-1 odd kernels on one coordinate set, rb_bwd is just rb_fwd with
the offset axis flipped (offsets[K-1-k] == -offsets[k]); for strided down/
up convolutions the topology builder provides the paired tables (the same
pairing the reference exploits when reusing forward kmaps for transposed
conv, `nn/functional/conv.py:184-192`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_rows(feats: jnp.ndarray, rb: jnp.ndarray) -> jnp.ndarray:
    """(K, V, C) gathered rows with rb == -1 masked to zero."""
    return jnp.where((rb >= 0)[:, :, None], feats[jnp.clip(rb, 0), :], 0)


def _conv_fwd_impl(feats, weight, rb):
    gathered = _gather_rows(feats, rb)
    out = jnp.einsum(
        "kvi,kio->vo",
        gathered,
        weight.astype(feats.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(feats.dtype)


@jax.custom_vjp
def sparse_conv_apply(
    feats: jnp.ndarray,
    weight: jnp.ndarray,
    rb_fwd: jnp.ndarray,
    rb_bwd: jnp.ndarray,
) -> jnp.ndarray:
    """feats (V_in, C_in), weight (K, C_in, C_out), rb_fwd (K, V_out),
    rb_bwd (K, V_in) -> (V_out, C_out).

    rb_bwd[k, i] must index the output voxel paired with input i under
    offset k (see module docstring); pass `flip_rulebook(rb_fwd)` for
    stride-1 odd kernels.
    """
    return _conv_fwd_impl(feats, weight, rb_fwd)


def _conv_vjp_fwd(feats, weight, rb_fwd, rb_bwd):
    return _conv_fwd_impl(feats, weight, rb_fwd), (feats, weight, rb_fwd, rb_bwd)


def _conv_vjp_bwd(res, g):
    feats, weight, rb_fwd, rb_bwd = res
    # d_feats: conv of g through the reverse rulebook with W^T
    g_gathered = _gather_rows(g, rb_bwd)  # (K, V_in, C_out)
    d_feats = jnp.einsum(
        "kvo,kio->vi",
        g_gathered,
        weight.astype(g.dtype),
        preferred_element_type=jnp.float32,
    ).astype(feats.dtype)
    # d_W[k] = gathered_k^T @ g, accumulated in f32 for stability
    in_gathered = _gather_rows(feats, rb_fwd)  # (K, V_out, C_in)
    d_w = jnp.einsum(
        "kvi,vo->kio", in_gathered, g, preferred_element_type=jnp.float32
    ).astype(weight.dtype)
    return d_feats, d_w, None, None


sparse_conv_apply.defvjp(_conv_vjp_fwd, _conv_vjp_bwd)


def flip_rulebook(rb: jnp.ndarray) -> jnp.ndarray:
    """Reverse table of a same-coordinate-set odd-kernel rulebook: offset
    enumeration k -> K-1-k corresponds to negating the offset."""
    return rb[::-1]


def sparse_matmul(feats: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """1x1x1 'conv' — plain matmul fast path (reference conv.py:135-140)."""
    return feats @ weight
