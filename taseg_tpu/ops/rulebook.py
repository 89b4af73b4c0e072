"""Sparse-convolution rulebooks (kernel maps) as dense static-shape tables.

The reference builds a packed variable-length rulebook per (stride, kernel)
pair — `nbmaps`/`nbsizes` lists of active (input, output) pairs per kernel
offset (torchsparse `nn/functional/conv.py:156-176`).  That layout is
dynamic-shape and scatter-heavy.  On TPU we instead store, for every kernel
offset k and every output voxel v, the index of the contributing input voxel
(or -1): a dense (K, V_out) int32 table.  The sparse conv then becomes K
gathers feeding one batched MXU matmul — fully static, no atomics.

Transposed convolutions reuse the forward table of the corresponding
downsampling conv with roles swapped (reference `conv.py:184-192`); here
that is a single scatter (`invert_rulebook`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .coords import (
    REF_SENTINEL_HI,
    GridBounds,
    pack_keys,
)
from .join import join_keys, query_coords, unique_coords


def make_ntuple(x, ndim: int = 3) -> tuple:
    if isinstance(x, (list, tuple)):
        assert len(x) == ndim
        return tuple(x)
    return (x,) * ndim


def kernel_offsets(kernel_size, stride=1, dilation=1) -> np.ndarray:
    """(K, 3) int32 offsets; ordering matches torchsparse
    `nn/utils/kernel.py:11-32` (x-fastest for odd kernel volumes, z-fastest
    for even) so checkpoints are layout-compatible with the reference."""
    size = make_ntuple(kernel_size)
    stride = make_ntuple(stride)
    dilation = make_ntuple(dilation)
    per_axis = [
        np.arange(-size[k] // 2 + 1, size[k] // 2 + 1) * stride[k] * dilation[k]
        for k in range(3)
    ]
    if np.prod(size) % 2 == 1:
        offs = [[x, y, z] for z in per_axis[2] for y in per_axis[1] for x in per_axis[0]]
    else:
        offs = [[x, y, z] for x in per_axis[0] for y in per_axis[1] for z in per_axis[2]]
    return np.asarray(offs, dtype=np.int32)


def spdownsample(
    coords: jnp.ndarray,
    num: jnp.ndarray,
    stride,
    tensor_stride,
    bounds: GridBounds,
    capacity: int,
    *,
    return_inverse: bool = False,
):
    """Downsampled (strided) output coordinates, deduplicated.

    Mirrors torchsparse `nn/functional/downsample.py:25-28` fast path
    (stride == kernel_size): truncate-toward-zero division of the xyz coords
    by (stride * tensor_stride), then unique.  Returns key-sorted coords
    padded to `capacity` plus the unique count; with `return_inverse`, also
    the fine-row -> coarse-uid map (-1 for invalid rows), the per-cell
    children counts, and the parent-grouping sort permutation —
    `ops.strided_conv` turns this parent relation into join-free strided
    convolutions (one row gather each way instead of 8 + a sort-join).
    """
    stride = make_ntuple(stride)
    tensor_stride = make_ntuple(tensor_stride)
    ss = jnp.asarray(
        [stride[k] * tensor_stride[k] for k in range(3)], jnp.int32
    )
    xyz = coords[:, :3]
    # trunc division (toward zero), matching torch.div(...).trunc()
    down = jnp.sign(xyz) * (jnp.abs(xyz) // ss) * ss
    new_coords = jnp.concatenate([down, coords[:, 3:4]], axis=1)
    valid = jnp.arange(coords.shape[0], dtype=jnp.int32) < num
    # NOTE: parent keys are NOT sorted even though the level is — floor
    # division is monotone per component but two x columns collapsing into
    # one parent x interleave their y runs — so the full sort stays.
    if return_inverse:
        out_coords, num_out, inverse, counts, perm = unique_coords(
            new_coords, valid, bounds, capacity, return_perm=True
        )
        return out_coords, num_out, inverse, counts, perm
    out_coords, num_out, _, _ = unique_coords(
        new_coords, valid, bounds, capacity
    )
    return out_coords, num_out


def build_rulebook(
    out_coords: jnp.ndarray,
    num_out: jnp.ndarray,
    in_coords: jnp.ndarray,
    num_in: jnp.ndarray,
    offsets: np.ndarray,
    bounds: GridBounds,
) -> jnp.ndarray:
    """Dense rulebook: idx[k, v] = input voxel index at out_coords[v] +
    offsets[k], or -1.  Replaces the reference's hash-query + nonzero
    compaction (`conv.py:164-176`)."""
    k = offsets.shape[0]
    vo = out_coords.shape[0]
    q_xyz = out_coords[None, :, :3] + jnp.asarray(offsets)[:, None, :]
    q = jnp.concatenate(
        [q_xyz, jnp.broadcast_to(out_coords[None, :, 3:4], (k, vo, 1))], axis=-1
    )
    q_valid = jnp.broadcast_to(
        (jnp.arange(vo, dtype=jnp.int32) < num_out)[None, :], (k, vo)
    )
    return query_coords(q, q_valid, in_coords, num_in, bounds)


def build_rulebook_k3(
    coords: jnp.ndarray,
    num: jnp.ndarray,
    stride: int,
    bounds: GridBounds,
) -> jnp.ndarray:
    """Same-level 3^3 rulebook from 9 floor queries instead of 27 joins.

    Exactly equivalent to `build_rulebook(coords, num, coords, num,
    kernel_offsets(3, stride=stride), bounds)` but ~3x cheaper: voxel keys
    sort by (batch, z, x, y), so for each (dx, dz) offset group the three
    dy-column entries are recoverable from ONE floor join (largest
    reference key <= query key — `join_keys(floor=True)`) plus the key of
    the floor row and its successor:

      exact (ref[f] == q):   dy=0 -> f; dy=-1 -> f-1 iff ref[f-1]==q-s
                             (the level's d1 adjacency flag at f)
      otherwise:             dy=-1 -> f iff ref[f] == q - s
      either way:            dy=+1 -> f+1 iff ref[f+1] == q + s
                             (references are unique and ascending, so the
                             ceil reference is always f + 1)

    The checks read a 5-int32 per-reference record gathered at f — 9V
    8-byte join rows + 9V 20-byte gather rows replace the 27V 12-byte
    sort-join rows of the dense build (TPU sorts AND gathers are
    row-bound, so 18V fewer rows is a direct win; cf. the same adjacency
    structure exploited by `ops.tgf`).
    """
    v = coords.shape[0]
    valid = jnp.arange(v, dtype=jnp.int32) < num
    hi, lo = pack_keys(coords, bounds, valid)
    s = jnp.int32(stride)

    # per-reference record: own key, successor key, and the d1 flag
    # (ref[r-1] == ref[r] - s in the same hi group)
    hi_next = jnp.concatenate([hi[1:], jnp.full((1,), REF_SENTINEL_HI)])
    lo_next = jnp.concatenate([lo[1:], jnp.zeros((1,), jnp.int32)])
    u1 = (hi_next == hi) & (lo_next == lo + s)
    d1 = jnp.concatenate([jnp.zeros((1,), bool), u1[:-1]])
    rec = jnp.stack([hi, lo, hi_next, lo_next, d1.astype(jnp.int32)], 1)

    # 9 (dx, dz) query groups at dy = 0; group g = (dz+1)*3 + (dx+1)
    groups = np.asarray(
        [[dx, 0, dz] for dz in (-1, 0, 1) for dx in (-1, 0, 1)], np.int32
    )
    q_xyz = (
        coords[None, :, :3] + (groups * int(stride))[:, None, :]
    )  # (9, V, 3)
    q = jnp.concatenate(
        [q_xyz, jnp.broadcast_to(coords[None, :, 3:4], (9, v, 1))], axis=-1
    )
    q_hi, q_lo = pack_keys(
        q.reshape(-1, 4),
        bounds,
        jnp.broadcast_to(valid[None, :], (9, v)).reshape(-1),
        is_query=True,
    )
    enc = join_keys(hi, lo, num, q_hi, q_lo, floor=True)
    f = (enc >> 1).reshape(9, v)  # arithmetic shift: -2 -> -1
    exact = (enc & 1).astype(bool).reshape(9, v)

    g = rec[jnp.clip(f, 0)]  # (9, V, 5)
    g_hi, g_lo = g[..., 0], g[..., 1]
    g_hi_n, g_lo_n = g[..., 2], g[..., 3]
    g_d1 = g[..., 4].astype(bool)
    qh = q_hi.reshape(9, v)
    ql = q_lo.reshape(9, v)

    rc = jnp.where(exact, f, -1)
    rm = jnp.where(
        exact,
        jnp.where(g_d1, f - 1, -1),
        jnp.where((g_hi == qh) & (g_lo == ql - s) & (f >= 0), f, -1),
    )
    # ceil = f + 1 when a floor exists, else reference 0
    up_row = jnp.where(f >= 0, f + 1, 0)
    up_hi = jnp.where(f >= 0, g_hi_n, g_hi)
    up_lo = jnp.where(f >= 0, g_lo_n, g_lo)
    rp = jnp.where((up_hi == qh) & (up_lo == ql + s), up_row, -1)

    # interleave into torchsparse offset order: k = (dx+1) + 3(dy+1) + 9(dz+1)
    cols = [None] * 27
    for gi in range(9):
        dz1, dx1 = divmod(gi, 3)
        base = dx1 + 9 * dz1
        cols[base] = rm[gi]
        cols[base + 3] = rc[gi]
        cols[base + 6] = rp[gi]
    return jnp.stack(cols)


def build_reverse_rulebook(
    in_coords: jnp.ndarray,
    num_in: jnp.ndarray,
    out_coords: jnp.ndarray,
    num_out: jnp.ndarray,
    offsets: np.ndarray,
    bounds: GridBounds,
) -> jnp.ndarray:
    """Reverse table for strided convs: t[k, i] = output voxel paired with
    input i under offset k, i.e. the unique o with out[o] == in[i] - d_k.

    Used as (a) the gradient path of a forward strided conv and (b) the
    forward table of the matching transposed conv — the same forward/
    transposed kmap sharing the reference exploits (conv.py:184-192), here
    realized as a second sort-join on negated offsets instead of inverting
    with a scatter (TPU scatters are pathologically slow)."""
    return build_rulebook(
        in_coords, num_in, out_coords, num_out, -np.asarray(offsets), bounds
    )
