"""Segmentor registry (reference `pcseg/model/segmentor/__init__.py:29-62`,
minus the eval()-based construction — here it's an explicit dict)."""

from .bev import (
    GlobalAvgPool,
    GlobalMaxPool,
    ToBEVConvolution,
    ToBEVHeightCompression,
    ToBEVReduction,
    ToDenseBEVConvolution,
)
from .fusion import SPVCNN
from .fusion.rpvnet import RPVNet
from .range2d import CENet, FIDNet, RangeNet, SalsaNext
from .voxel import (
    CylinderTS,
    MinkUNet,
    MinkUNetMsMm,
    MinkUNetMsMmNus,
    UNetCapacities,
    UNetTopology,
    build_unet_topology,
)

VOXEL_SEGMENTORS = {
    "MinkUNet": MinkUNet,
    "SPVCNN": SPVCNN,
    "RPVNet": RPVNet,
    # FSA model: identical backbone consuming the fused multi-scan cloud
    # with the 5th time-flag feature (reference minkunet_ms.py:385-458);
    # current-frame slicing at eval is host-side via point_mask metadata.
    "MinkUNetMs": MinkUNet,
    # KD student/teacher are plain MinkUNets; the distillation wiring lives
    # in parallel.kd.make_kd_train_step (teacher params outside the optimizer)
    "MinkUNetMsKd": MinkUNet,
}

RANGE_SEGMENTORS = {
    "SalsaNext": SalsaNext,
    "CENet": CENet,
    "FIDNet": FIDNet,
    "RangeNet": RangeNet,
}

SEGMENTORS = {
    **VOXEL_SEGMENTORS,
    **RANGE_SEGMENTORS,
    "Cylinder_TS": CylinderTS,     # polar grid (own topology builder)
    "MinkUNetMsMm": MinkUNetMsMm,  # TIAF (driven by a dedicated step fn)
    "MinkUNetMsMmNus": MinkUNetMsMmNus,  # 6-camera nuScenes TIAF
}


def build_segmentor(model_cfgs, num_class: int):
    """Construct a segmentor flax module from a MODEL config block
    (schema mirrors reference `tools/cfgs/**` MODEL sections)."""
    name = model_cfgs["NAME"]
    if name == "Cylinder_TS":
        return CylinderTS(
            num_classes=num_class,
            in_dim=model_cfgs.get("IN_FEATURE_DIM", 9),
            init_size=model_cfgs.get("INIT_SIZE", 32),
            axis_name="data" if model_cfgs.get("IF_DIST", False) else None,
        )
    if name in ("MinkUNetMsMm", "MinkUNetMsMmNus"):
        cls = MinkUNetMsMmNus if name.endswith("Nus") else MinkUNetMsMm
        return cls(
            num_classes=num_class,
            in_dim=model_cfgs.get("IN_FEATURE_DIM", 5),
            cr=model_cfgs.get("cr", 1.0),
            fov_cr=model_cfgs.get("FOV_CR", 0.5),
            image_base=model_cfgs.get("IMAGE_BASE", 32),
            axis_name="data" if model_cfgs.get("IF_DIST", False) else None,
            ensemble_type=model_cfgs.get("ENSEMBLE_TYPE", "replace"),
        )
    if name in VOXEL_SEGMENTORS:
        cls = VOXEL_SEGMENTORS[name]
        return cls(
            num_classes=num_class,
            in_dim=model_cfgs.get("IN_FEATURE_DIM", 4),
            planes=tuple(
                model_cfgs.get("PLANES", (32, 32, 64, 128, 256, 256, 128, 96, 96))
            ),
            num_layer=tuple(model_cfgs.get("NUM_LAYER", (2, 3, 4, 6, 2, 2, 2, 2))),
            block=model_cfgs.get("BLOCK", "Bottleneck"),
            cr=model_cfgs.get("cr", 1.0),
            dropout_p=model_cfgs.get("DROPOUT_P", 0.3),
            axis_name="data" if model_cfgs.get("IF_DIST", False) else None,
            compute_dtype=model_cfgs.get("COMPUTE_DTYPE", "float32"),
            # torch-convention running-stat momentum (0.1 default); tiny
            # synthetic epochs (32 its) need a smaller value or the eval
            # stats never settle (they track the last ~7 augmented
            # batches and val mIoU swings 27-76 across epochs).  Only
            # passed to modules exposing the field (RPVNet hardwires it).
            **(
                {"bn_momentum": model_cfgs.get("BN_MOMENTUM", 0.1)}
                if "bn_momentum" in getattr(cls, "__dataclass_fields__", {})
                else {}
            ),
            **(
                {"multi_scale": model_cfgs.get("MULTI_SCALE", "concat")}
                if name == "SPVCNN" else {}
            ),
        )
    if name in RANGE_SEGMENTORS:
        cls = RANGE_SEGMENTORS[name]
        kwargs = dict(
            num_classes=num_class,
            in_channels=model_cfgs.get("IN_FEATURE_DIM", 6),
        )
        if name == "CENet":
            kwargs["aux"] = model_cfgs.get("IF_AUX", True)
        return cls(**kwargs)
    raise KeyError(f"unknown segmentor {name!r}; have {sorted(SEGMENTORS)}")


__all__ = [
    "GlobalAvgPool",
    "GlobalMaxPool",
    "MinkUNet",
    "SEGMENTORS",
    "ToBEVConvolution",
    "ToBEVHeightCompression",
    "ToBEVReduction",
    "ToDenseBEVConvolution",
    "UNetCapacities",
    "UNetTopology",
    "build_segmentor",
    "build_unet_topology",
]
