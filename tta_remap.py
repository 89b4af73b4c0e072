#!/usr/bin/env python
"""Label-id remap tool for prediction directories.

CLI match of the reference `tta_remap.py` (LUT build :96-101, remap loop
:137-156): converts predictions between train ids and SemanticKITTI raw
ids — raw ids for benchmark submissions, train ids for the FSA
pseudo-mask directories consumed by DATA.PSEUDO_LABEL_ROOT.
"""

from __future__ import annotations

import argparse
import os

# JAX_PLATFORMS=cpu in the env hangs PJRT plugin discovery on hosts that
# pin a tunneled TPU platform; this tool never touches a device, so drop
# the pin before the package (and so jax) is imported (see train.py)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    os.environ.pop("JAX_PLATFORMS", None)

from taseg_tpu.utils.submission import remap_label_files


def main():
    p = argparse.ArgumentParser(description="remap prediction .label files")
    p.add_argument("--path", required=True,
                   help="root holding sequences/*/predictions/*.label")
    p.add_argument("--direction", default="train_to_raw",
                   choices=["train_to_raw", "raw_to_train"])
    p.add_argument("--no_inplace", action="store_true")
    args = p.parse_args()
    n = remap_label_files(
        args.path, direction=args.direction, inplace=not args.no_inplace
    )
    print(f"remapped {n} label files under {args.path}")


if __name__ == "__main__":
    main()
