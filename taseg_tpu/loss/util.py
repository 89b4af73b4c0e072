"""Scatter-free building blocks shared by the loss implementations.

XLA differentiates `take_along_axis` into a scatter-add, and scatters on
TPU are erratically slow (profiled 2026-08-19: the single (N, C)
scatter-add from the CE backward dominated the whole jitted train step —
13.9-102 s/step on a forward of 108 ms).  Every label/permutation gather
on a gradient path must therefore route through one of these instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def label_lp(lp: jnp.ndarray, labels_c: jnp.ndarray) -> jnp.ndarray:
    """lp[i, labels_c[i]] — one-hot contraction, scatter-free VJP.

    The one-hot select costs an extra (N, C) elementwise pass in the
    forward; its backward is a broadcast `where`, not a scatter.  C is
    the class count (tiny), so this is strictly cheaper than the
    scatter-add the take_along_axis formulation autodiffs into.
    """
    c = lp.shape[-1]
    onehot = (
        jnp.arange(c, dtype=labels_c.dtype)[None, :] == labels_c[:, None]
    )
    return jnp.sum(jnp.where(onehot, lp, 0), axis=1)


@jax.custom_vjp
def permute_rows(
    x: jnp.ndarray, perm: jnp.ndarray, inv: jnp.ndarray
) -> jnp.ndarray:
    """take_along_axis(x, perm, axis=0) whose VJP gathers by `inv`.

    `perm` must be a permutation along axis 0 (per column) and `inv` its
    inverse (argsort(perm, axis=0)); the gradient of a permutation gather
    is the inverse permutation gather — no scatter.
    """
    return jnp.take_along_axis(x, perm, axis=0)


def _pr_fwd(x, perm, inv):
    return jnp.take_along_axis(x, perm, axis=0), (inv,)


def _pr_bwd(res, g):
    (inv,) = res
    return jnp.take_along_axis(g, inv, axis=0), None, None


permute_rows.defvjp(_pr_fwd, _pr_bwd)
