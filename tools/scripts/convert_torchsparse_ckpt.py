#!/usr/bin/env python
"""Convert a reference (torch/torchsparse) MinkUNet checkpoint into a
taseg_tpu orbax checkpoint.

The reference saves `{'model_state': state_dict, ...}` (train.py:326-342);
our SparseConv keeps torchsparse's (K, C_in, C_out) weight layout with the
identical offset enumeration, so conversion is name translation only
(taseg_tpu.utils.ckpt_convert).  The output loads via
`train.py --pretrained_model <out>` (params + BN running stats).

Usage:
  python tools/scripts/convert_torchsparse_ckpt.py \
      --src checkpoint_epoch_36.pth --out output/converted_ckpt \
      [--num_layer 2,3,4,6,2,2,2,2]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="torch .pth checkpoint")
    p.add_argument("--out", required=True, help="orbax output directory")
    p.add_argument("--num_layer", default="2,3,4,6,2,2,2,2")
    args = p.parse_args()

    import torch

    from taseg_tpu.utils.ckpt_convert import translate_minkunet_state

    payload = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = payload.get("model_state", payload)
    # DDP prefix strip (reference wraps in DistributedDataParallel)
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    num_layer = [int(x) for x in args.num_layer.split(",")]
    params, stats = translate_minkunet_state(sd, num_layer=num_layer)

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    out = Path(args.out).absolute()
    ckptr.save(out, {"params": params, "batch_stats": stats}, force=True)
    n = sum(
        v.size for v in _leaves(params)
    )
    print(f"converted {n / 1e6:.2f} M params -> {out}")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
