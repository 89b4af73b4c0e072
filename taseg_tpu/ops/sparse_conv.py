"""Sparse 3D convolution: gather → batched MXU matmul (→ implicit scatter).

TPU-native replacement for the reference's per-offset gather-GEMM-scatter
CUDA kernels (torchsparse `backend/convolution/convolution_cuda.cu:52-165`).
Because the rulebook is a dense (K, V_out) index table, the output row for
voxel v is simply

    out[v] = sum_k  feats[idx[k, v]] * (idx[k, v] >= 0)  @  W[k]

which XLA compiles to K gathers + one contraction `einsum('kvi,kio->vo')`
running on the MXU.  No atomics, no dynamic shapes; the backward pass
(scatter-add of gradients) falls out of autodiff as sorted segment updates.

Weight layout is (K, C_in, C_out), identical to torchsparse
`nn/modules/conv.py:34-37`, with the same offset enumeration, so parameters
are layout-compatible with reference checkpoints.
"""

from __future__ import annotations

import jax.numpy as jnp


def sparse_conv_apply(
    feats: jnp.ndarray,
    weight: jnp.ndarray,
    rulebook: jnp.ndarray,
    *,
    center_identity: bool = False,
) -> jnp.ndarray:
    """Apply a sparse convolution via a dense rulebook.

    feats: (V_in, C_in); weight: (K, C_in, C_out); rulebook: (K, V_out)
    int32 indices into feats, -1 = no contribution.  Returns (V_out, C_out).

    center_identity: when the conv is stride-1 with odd kernel and
    in/out coords are identical, the center offset is the identity map —
    skip its gather and fold it in as a plain matmul (mirrors the dense
    fast path in `convolution_cuda.cu:75-92`).
    """
    k = weight.shape[0]
    if center_identity:
        c = k // 2
        side = [i for i in range(k) if i != c]
        out = feats @ weight[c]
        rb = rulebook[jnp.asarray(side)]
        w = weight[jnp.asarray(side)]
        gathered = jnp.where(
            (rb >= 0)[:, :, None], feats[jnp.clip(rb, 0), :], 0.0
        )
        out = out + jnp.einsum(
            "kvi,kio->vo", gathered, w, preferred_element_type=out.dtype
        )
        return out
    gathered = jnp.where(
        (rulebook >= 0)[:, :, None], feats[jnp.clip(rulebook, 0), :], 0.0
    )
    return jnp.einsum(
        "kvi,kio->vo", gathered, weight, preferred_element_type=feats.dtype
    )
