"""Profile ONE jitted train step on the chip (the 102 s/step pathology)."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import optax

from scratch.tutil import drain, timed
from taseg_tpu.data.synthetic import synthetic_scan
from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard
from taseg_tpu.loss import Losses
from taseg_tpu.models import MinkUNet, UNetCapacities, build_unet_topology
from taseg_tpu.ops import PointSet
from taseg_tpu.parallel import Batch, TrainState, make_mesh, make_train_step

pipe = VoxelPipeline(voxel_size=0.05, training=False)
rng = np.random.default_rng(0)
pts, labels = synthetic_scan(rng, 120_000)
ring = np.zeros((len(pts), 1), np.float32)
s = pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
arrays = collate_shard([s], 131072)
caps = UNetCapacities.for_points(131072)
coords = jnp.asarray(arrays["point_coords"])
feats = jnp.asarray(arrays["point_feats"])
num = jnp.asarray(arrays["num_points"][0])
topo0 = jax.jit(
    lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False)
)(coords, num)
caps = UNetCapacities.fit(
    131072, [int(np.asarray(lt.num)) for lt in topo0.levels], margin=1.1
)
model = MinkUNet(
    num_classes=20, cr=1.0, block="ResBlock", compute_dtype="bfloat16"
)
params = jax.jit(
    lambda c, f, n: model.init(
        {"params": jax.random.PRNGKey(0)},
        PointSet(coords=c, feats=f, num=n),
        build_unet_topology(c, n, caps),
        False,
    )
)(coords, feats, num)
print("init done", flush=True)

mesh = make_mesh(jax.devices()[:1])
crit = Losses(["CELoss"], [1.0], ignore_index=0)
tx = optax.sgd(0.02, momentum=0.9, nesterov=True)
step = make_train_step(model, crit, tx, caps, mesh)
state = TrainState(
    params=params["params"],
    batch_stats=params.get("batch_stats", {}),
    opt_state=tx.init(params["params"]),
    step=jnp.int32(0),
    loss_state=None,
)
batch = Batch(
    point_coords=coords[None],
    point_feats=feats[None],
    labels=jnp.asarray(arrays["labels"])[None],
    num_points=num[None, None],
)
prng = jax.random.PRNGKey(0)
t0 = time.perf_counter()
state, metrics = step(state, batch, prng)
drain(state.params)
print(f"first step (incl compile): {time.perf_counter() - t0:.1f}s", flush=True)

for i in range(3):
    t0 = time.perf_counter()
    state, metrics = step(state, batch, prng)
    drain(state.params)
    print(f"step {i}: {time.perf_counter() - t0:.2f}s", flush=True)

os.makedirs("/tmp/prof_train", exist_ok=True)
with jax.profiler.trace("/tmp/prof_train"):
    state, metrics = step(state, batch, prng)
    drain(state.params)
print("profiled one step", flush=True)
