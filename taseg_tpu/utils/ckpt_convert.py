"""Reference (torchsparse) MinkUNet checkpoint -> taseg_tpu translation.

Our `SparseConv` keeps torchsparse's weight layout — (K, C_in, C_out)
with the identical kernel-offset enumeration (`ops/rulebook.py:32-47`
mirrors ts `nn/utils/kernel.py:11-32`) — so a reference checkpoint maps
onto the flax tree by pure NAME translation, no tensor surgery beyond
the torch-Linear transpose.  Covers every MinkUNet-family state dict
(MinkUNet / MinkUNetMs / SPVCNN share the naming scheme, reference
`minkunet.py:186-362`):

    stem.0.kernel                 -> stem_0/SparseConv_0/kernel
    stem.1.{weight,bias}          -> stem_0/MaskedBatchNorm_0/{scale,bias}
    stem.1.running_{mean,var}     -> batch_stats .../{mean,var}
    stageL.0.net.{0,1}            -> downL/...
    stageL.i.net.{0,1,3,4}        -> stageL_{i-1}/SparseConv_{0,1} + BN
    stageL.i.downsample.{0,1}     -> stageL_{i-1}/SparseConv_2 + BN
    upN.0.net.{0,1}               -> upN_deconv/...
    upN.1.i.net...                -> upN_blocks_i/...
    classifier.0.{weight,bias}    -> classifier/{kernel^T, bias}
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np


def _set(tree: dict, scope: str, leaf: str, value: np.ndarray):
    node = tree
    for part in scope.split("/"):
        node = node.setdefault(part, {})
    node[leaf] = np.asarray(value)


def _conv(params: dict, ref_sd: Mapping, ref_key: str, scope: str):
    _set(params, scope, "kernel", ref_sd[ref_key])


def _bn(params: dict, stats: dict, ref_sd: Mapping, ref_prefix: str,
        scope: str):
    _set(params, scope, "scale", ref_sd[f"{ref_prefix}.weight"])
    _set(params, scope, "bias", ref_sd[f"{ref_prefix}.bias"])
    _set(stats, scope, "mean", ref_sd[f"{ref_prefix}.running_mean"])
    _set(stats, scope, "var", ref_sd[f"{ref_prefix}.running_var"])


def _block(params, stats, ref_sd, ref_prefix: str, scope: str):
    """One residual/bottleneck block: convs and BNs of `net` in module
    order map to SparseConv_k / MaskedBatchNorm_k; the `downsample`
    projection (absent for identity shortcuts) takes the next index."""
    conv_i = bn_i = 0
    j = 0
    while f"{ref_prefix}.net.{j}.kernel" in ref_sd or (
        f"{ref_prefix}.net.{j}.weight" in ref_sd
    ) or j < 8:
        ck = f"{ref_prefix}.net.{j}.kernel"
        bk = f"{ref_prefix}.net.{j}.weight"
        if ck in ref_sd:
            _conv(params, ref_sd, ck, f"{scope}/SparseConv_{conv_i}")
            conv_i += 1
        elif bk in ref_sd:
            _bn(params, stats, ref_sd, f"{ref_prefix}.net.{j}",
                f"{scope}/MaskedBatchNorm_{bn_i}")
            bn_i += 1
        j += 1
    if f"{ref_prefix}.downsample.0.kernel" in ref_sd:
        _conv(params, ref_sd, f"{ref_prefix}.downsample.0.kernel",
              f"{scope}/SparseConv_{conv_i}")
        _bn(params, stats, ref_sd, f"{ref_prefix}.downsample.1",
            f"{scope}/MaskedBatchNorm_{bn_i}")


def translate_minkunet_state(
    ref_sd: Mapping[str, np.ndarray],
    num_layer: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2),
) -> tuple[dict, dict]:
    """torch state_dict (numpy-convertible values) -> (params,
    batch_stats) flax trees for models.voxel.MinkUNet."""
    ref_sd = {
        k: np.asarray(getattr(v, "numpy", lambda: v)())
        for k, v in ref_sd.items()
    }
    params: dict = {}
    stats: dict = {}

    _conv(params, ref_sd, "stem.0.kernel", "stem_0/SparseConv_0")
    _bn(params, stats, ref_sd, "stem.1", "stem_0/MaskedBatchNorm_0")
    _conv(params, ref_sd, "stem.3.kernel", "stem_1/SparseConv_0")
    _bn(params, stats, ref_sd, "stem.4", "stem_1/MaskedBatchNorm_0")

    for l in range(1, 5):
        _conv(params, ref_sd, f"stage{l}.0.net.0.kernel",
              f"down{l}/SparseConv_0")
        _bn(params, stats, ref_sd, f"stage{l}.0.net.1",
            f"down{l}/MaskedBatchNorm_0")
        for i in range(num_layer[l - 1]):
            _block(params, stats, ref_sd, f"stage{l}.{i + 1}",
                   f"stage{l}_{i}")

    for n in range(1, 5):
        _conv(params, ref_sd, f"up{n}.0.net.0.kernel",
              f"up{n}_deconv/SparseConv_0")
        _bn(params, stats, ref_sd, f"up{n}.0.net.1",
            f"up{n}_deconv/MaskedBatchNorm_0")
        for i in range(num_layer[3 + n]):
            _block(params, stats, ref_sd, f"up{n}.1.{i}",
                   f"up{n}_blocks_{i}")

    _set(params, "classifier", "kernel",
         np.asarray(ref_sd["classifier.0.weight"]).T)
    _set(params, "classifier", "bias", ref_sd["classifier.0.bias"])
    return params, stats
