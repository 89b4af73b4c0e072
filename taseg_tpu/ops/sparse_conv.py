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

import os

import jax
import jax.numpy as jnp

# at or below this static row capacity the K per-offset gathers collapse
# into ONE flattened (K*V)-row gather + ONE batched einsum.  The theory
# was per-launch overhead on the coarse UNet levels (profiled ~13 ms of
# ~10 us events), but the whole-model A/B (scratch/an_fused_ab,
# 2026-08-19) measured it NEUTRAL (112.7 vs 112.4 ms) — XLA already
# overlaps the tiny launches — so the default is 0 (off); the knob stays
# for re-measurement on other chips.
CONV_BATCH_MAX_V = int(os.environ.get("TASEG_CONV_BATCH_MAX_V", "0"))
# accumulation dtype of the per-offset K-term sum: f32 (default) keeps
# the 27-term reduction exact; "bf16" halves the accumulator round-trip
# bytes at a ~2^-8 relative-noise cost.  Measured SLOWER whole-model on
# v5e (scratch/an_fused_ab, 2026-08-19) — the accumulator lives in
# registers/VMEM either way, so the byte saving never materializes.
CONV_ACCUM = os.environ.get("TASEG_CONV_ACCUM", "f32")


def _gather_rows_k(feats: jnp.ndarray, rbk: jnp.ndarray) -> jnp.ndarray:
    """(V, C) rows for ONE offset with rb == -1 masked to zero.

    The rulebook's matched indices are strictly increasing per offset (a
    structural fact of the sort-based builder, rulebook.py), so the gather
    carries `indices_are_sorted` + PROMISE_IN_BOUNDS — measured ~15%
    faster than a plain (K, V) take on v5e, and the per-offset loop avoids
    materializing the (K, V, C) intermediate."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    g = jax.lax.gather(
        feats, jnp.clip(rbk, 0)[:, None], dn,
        slice_sizes=(1, feats.shape[1]),
        indices_are_sorted=True,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )
    return jnp.where((rbk >= 0)[:, None], g, 0)


def _gather_rows(feats: jnp.ndarray, rb: jnp.ndarray) -> jnp.ndarray:
    """(K, V, C) gathered rows with rb == -1 masked to zero."""
    return jnp.where((rb >= 0)[:, :, None], feats[jnp.clip(rb, 0), :], 0)


def _gather_wide(feats: jnp.ndarray, rb: jnp.ndarray) -> jnp.ndarray:
    """(V, K*C): all K offsets' gathered rows side by side.

    Feeding ONE matmul with contraction dim K*C instead of K matmuls with
    contraction dim C is the difference between ~35% and near-full MXU
    utilization when C is narrow (measured 10.6 -> >20 TF/s on v5e for
    the MinkUNet conv sequence): the 128x128 systolic array is
    K-dim-starved at C=32."""
    return jnp.concatenate(
        [_gather_rows_k(feats, rb[kk]) for kk in range(rb.shape[0])], axis=1
    )


def _gather_rows_flat(feats: jnp.ndarray, rb: jnp.ndarray) -> jnp.ndarray:
    """(K, V, C) gathered rows via ONE (K*V)-row launch, -1 masked."""
    k, v = rb.shape
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    g = jax.lax.gather(
        feats, jnp.clip(rb.reshape(-1), 0)[:, None], dn,
        slice_sizes=(1, feats.shape[1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )
    g = jnp.where((rb.reshape(-1) >= 0)[:, None], g, 0)
    return g.reshape(k, v, feats.shape[1])


def _conv_fwd_impl(feats, weight, rb):
    import os

    k, c_in, c_out = weight.shape
    w = weight.astype(feats.dtype)
    if 0 < rb.shape[1] <= CONV_BATCH_MAX_V and not os.environ.get(
        "TASEG_NO_CONV_BATCH"
    ):
        g = _gather_rows_flat(feats, rb)  # (K, V, C_in)
        out = jnp.einsum(
            "kvi,kio->vo", g, w, preferred_element_type=jnp.float32
        )
        return out.astype(feats.dtype)
    if os.environ.get("TASEG_CONV_WIDE"):
        # A/B variant: one (V, K*C) concat feeding a single wide matmul.
        # Measured SLOWER than per-offset accumulation on v5e (6.53 vs
        # 6.93 scans/s whole-model): the concat materializes a K*C-wide
        # intermediate that outweighs the wider MXU contraction.
        g = _gather_wide(feats, rb)  # (V_out, K*C_in)
        out = jnp.dot(
            g, w.reshape(k * c_in, c_out), preferred_element_type=jnp.float32
        )
        return out.astype(feats.dtype)
    # default: per-offset gather -> matmul accumulation; no (V, K*C)
    # concat intermediate — XLA keeps the running sum in registers/VMEM
    acc_t = jnp.bfloat16 if CONV_ACCUM == "bf16" else jnp.float32
    out = None
    for kk in range(k):
        g = _gather_rows_k(feats, rb[kk])
        c = jnp.dot(g, w[kk], preferred_element_type=acc_t)
        out = c if out is None else out + c
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
    import os

    feats, weight, rb_fwd, rb_bwd = res
    k, c_in, c_out = weight.shape
    w = weight.astype(g.dtype)
    if (
        0 < max(rb_fwd.shape[1], rb_bwd.shape[1]) <= CONV_BATCH_MAX_V
        and not os.environ.get("TASEG_NO_CONV_BATCH")
    ):
        # batched small-level backward: one flattened gather + one einsum
        # per gradient (same launch-overhead argument as the forward)
        gg = _gather_rows_flat(g, rb_bwd)  # (K, V_in, C_out)
        d_feats = jnp.einsum(
            "kvo,kio->vi", gg, w, preferred_element_type=jnp.float32
        )
        in_g = _gather_rows_flat(feats, rb_fwd)  # (K, V_out, C_in)
        d_w = jnp.einsum(
            "kvi,vo->kio", in_g, g, preferred_element_type=jnp.float32
        )
        return (
            d_feats.astype(feats.dtype),
            d_w.astype(weight.dtype),
            None,
            None,
        )
    # d_feats: conv of g through the reverse rulebook with W^T, pairing
    # rb_bwd[k] <-> W[k]; per-offset accumulation like the forward (the
    # wide-concat form loses on v5e, see _conv_fwd_impl).  d_W[k] contracts
    # over the huge V dim, keeping the MXU saturated.
    d_feats = None
    d_w = []
    for kk in range(k):
        gg = _gather_rows_k(g, rb_bwd[kk])
        c = jnp.dot(gg, w[kk].T, preferred_element_type=jnp.float32)
        d_feats = c if d_feats is None else d_feats + c
        in_g = _gather_rows_k(feats, rb_fwd[kk])
        d_w.append(jnp.dot(in_g.T, g, preferred_element_type=jnp.float32))
    d_w = jnp.stack(d_w)
    return (
        d_feats.astype(feats.dtype),
        d_w.astype(weight.dtype),
        None,
        None,
    )


sparse_conv_apply.defvjp(_conv_vjp_fwd, _conv_vjp_bwd)


def flip_rulebook(rb: jnp.ndarray) -> jnp.ndarray:
    """Reverse table of a same-coordinate-set odd-kernel rulebook: offset
    enumeration k -> K-1-k corresponds to negating the offset."""
    return rb[::-1]


def sparse_matmul(feats: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """1x1x1 'conv' — plain matmul fast path (reference conv.py:135-140)."""
    return feats @ weight
