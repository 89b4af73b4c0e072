"""Train-step decomposition on the chip (VERDICT r4 #3).

Times three jitted programs on the bench scan (batch 1, bf16, CE loss):
  T  = train topology alone (devox_pairs=True — the train variant
       carries the devox pair tables and flipped TGF plans)
  F  = topology + forward + loss (no grad)
  S  = the full train step (topology + fwd + loss + bwd + pmean + sgd)
so bwd+update ~ S - F and the fwd model ~ F - T.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import optax

from scratch.tutil import drain
from taseg_tpu.data.synthetic import synthetic_scan
from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard
from taseg_tpu.loss import Losses
from taseg_tpu.models import MinkUNet, UNetCapacities, build_unet_topology
from taseg_tpu.ops import PointSet
from taseg_tpu.parallel import Batch, TrainState, make_mesh, make_train_step


def timeit(label, fn, *args, n=10):
    out = fn(*args)
    drain(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    drain(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:34s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


pipe = VoxelPipeline(voxel_size=0.05, training=False)
rng = np.random.default_rng(0)
pts, labels = synthetic_scan(rng, 120_000)
ring = np.zeros((len(pts), 1), np.float32)
s = pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
arrays = collate_shard([s], 131072)
coords = jnp.asarray(arrays["point_coords"])
feats = jnp.asarray(arrays["point_feats"])
lab = jnp.asarray(arrays["labels"])
num = jnp.asarray(arrays["num_points"][0])

caps0 = UNetCapacities.for_points(131072)
topo0 = jax.jit(
    lambda c, n: build_unet_topology(c, n, caps0, devox_pairs=False)
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

crit = Losses(["CELoss"], [1.0], ignore_index=0)

# T: train-variant topology (pair tables + flipped TGF plans)
t_topo = timeit(
    "T train topology",
    jax.jit(lambda c, n: build_unet_topology(c, n, caps, devox_pairs=True)),
    coords, num,
)

# F: topology + fwd + loss, no grad
def fwd_loss(variables, c, f, lb, n):
    topo = build_unet_topology(c, n, caps, devox_pairs=True)
    pts_ = PointSet(coords=c, feats=f, num=n)
    logits, mutated = model.apply(
        variables, pts_, topo, True,
        rngs={"dropout": jax.random.PRNGKey(0)},
        mutable=["batch_stats"],
    )
    valid = jnp.arange(logits.shape[0], dtype=jnp.int32) < n
    return crit(logits.astype(jnp.float32), lb, valid)

t_f = timeit(
    "F topo+fwd+loss", jax.jit(fwd_loss), params, coords, feats, lab, num
)

# S: the real train step
mesh = make_mesh(jax.devices()[:1])
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
    point_coords=coords[None], point_feats=feats[None],
    labels=lab[None], num_points=num[None, None],
)
prng = jax.random.PRNGKey(0)
prev = None
for i in range(4):
    t0 = time.perf_counter()
    state, metrics = step(state, batch, prng)
    drain(state.params)
    dt = time.perf_counter() - t0
    print(f"S warm {i}: {dt:.2f}s", flush=True)
    if prev is not None and dt < 1.5 * prev:
        break
    prev = dt
t0 = time.perf_counter()
N = 10
for _ in range(N):
    state, metrics = step(state, batch, prng)
drain(state.params)
t_s = (time.perf_counter() - t0) / N
print(f"S full train step                  {t_s * 1e3:8.2f} ms", flush=True)
print(
    f"-> fwd model ~ {(t_f - t_topo) * 1e3:.1f} ms, "
    f"bwd+update ~ {(t_s - t_f) * 1e3:.1f} ms, "
    f"topology ~ {t_topo * 1e3:.1f} ms",
    flush=True,
)
