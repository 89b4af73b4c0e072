"""TGF feasibility: for each (dx,dz) offset group, how often is the
center (dy=0) neighbor missing while a side (dy=+-1) neighbor exists?
Those (group, v) pairs need the sparse fallback path."""

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.pop("JAX_PLATFORMS", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from taseg_tpu.models import UNetCapacities, build_unet_topology
from taseg_tpu.ops.rulebook import kernel_offsets
from taseg_tpu.data.synthetic import synthetic_scan
from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard

pipe = VoxelPipeline(voxel_size=0.05, training=False)
rng = np.random.default_rng(0)
pts, labels = synthetic_scan(rng, 120_000)
ring = np.zeros((len(pts), 1), np.float32)
s = pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
arrays = collate_shard([s], 131072)
caps = UNetCapacities.for_points(131072)
topo = build_unet_topology(
    jnp.asarray(arrays["point_coords"]),
    jnp.asarray(arrays["num_points"][0]),
    caps,
    devox_pairs=False,
)

# offset enumeration: kernel_offsets(3) — find the dy axis ordering
offs = kernel_offsets(3, stride=1)  # (27, 3), z-fastest? check
print("offsets[:6]:\n", offs[:6])

for l, lt in enumerate(topo.levels):
    v = int(lt.num)
    rb = np.asarray(lt.rb_k3)  # (27, V)
    valid_v = np.arange(rb.shape[1]) < v
    # group offsets by (dx, dz); columns within a group are dy=-1,0,+1
    groups = {}
    for k in range(27):
        dx, dy, dz = offs[k]
        groups.setdefault((dx, dz), {})[dy] = k
    tot_pairs = 0
    fb_pairs = 0
    covered = 0
    all_valid = 0
    adj_violation = 0
    for (dx, dz), cols in sorted(groups.items()):
        ka, kb, kc = cols[-1], cols[0], cols[1]
        a, b, c = rb[ka][valid_v], rb[kb][valid_v], rb[kc][valid_v]
        any_side = (a >= 0) | (c >= 0)
        fb = (b < 0) & any_side
        fb_pairs += int(fb.sum())
        tot_pairs += int(v)
        covered += int(((b >= 0) | any_side).sum())
        all_valid += int(((a >= 0) & (b >= 0)).sum()) + int(
            ((c >= 0) & (b >= 0)).sum()
        )
        # check adjacency claim: where both center and side valid,
        # side row == center row -+ 1
        m = (a >= 0) & (b >= 0)
        adj_violation += int((a[m] != b[m] - 1).sum())
        m = (c >= 0) & (b >= 0)
        adj_violation += int((c[m] != b[m] + 1).sum())
    print(
        f"L{l}: V={v} groups=9 center-present-side pairs={all_valid}"
        f" adj_violations={adj_violation}"
        f"  fallback rows {fb_pairs}/{tot_pairs*1} ({fb_pairs/max(tot_pairs,1)*100:.2f}% of 9V)"
    )
