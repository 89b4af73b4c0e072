"""Worker process for the 2-process CPU-mesh multi-host test.

Launched twice by tests/test_multihost.py with a shared coordinator port.
Each process owns 2 CPU devices (4 global), builds its process-local
loader slice, assembles global batches via parallel.make_global_batch,
runs one SPMD train step + one psum eval, and prints machine-checkable
lines the parent asserts on.
"""

import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])
# conftest-style CPU forcing: JAX_PLATFORMS must be UNSET (the env-var
# path ignores xla_force_host_platform_device_count under the axon
# plugin); the config.update route honors it
os.environ.pop("JAX_PLATFORMS", None)
_flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
os.environ["XLA_FLAGS"] = " ".join(
    _flags + ["--xla_force_host_platform_device_count=2"]
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4 and jax.local_device_count() == 2

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from taseg_tpu.data import build_dataloader  # noqa: E402
from taseg_tpu.loss import Losses  # noqa: E402
from taseg_tpu.models import MinkUNet, UNetCapacities  # noqa: E402
from taseg_tpu.models.voxel.backbone_context import build_unet_topology  # noqa: E402
from taseg_tpu.ops import PointSet  # noqa: E402
from taseg_tpu.optim import build_optimizer  # noqa: E402
from taseg_tpu.parallel import (  # noqa: E402
    TrainState,
    make_eval_step,
    make_global_batch,
    make_mesh,
    make_train_step,
)

data_cfgs = {"DATASET": "synthetic", "LENGTH": 9, "N_RAW_POINTS": 4000,
             "NUM_POINTS": 8192}
loader = build_dataloader(
    data_cfgs, training=True, n_shards=2, scans_per_shard=1,
    process_index=pid, process_count=2,
)
# 9 scans / 4 global per step -> 2 full steps with drop_last
assert len(loader) == 2, len(loader)

mesh = make_mesh()
caps = UNetCapacities.for_points(loader.point_capacity)
model = MinkUNet(num_classes=20, cr=0.125, num_layer=(1,) * 8,
                 dropout_p=0.0)
criterion = Losses(["CELoss"], [1.0])
tx = build_optimizer({"OPTIMIZER": "sgd", "LR": 0.01}, 2, 1)

arrays, meta = next(iter(loader))
names = sorted(
    os.path.basename(str(s.name)) for m in meta for s in m["samples"]
)
print(f"NAMES {pid} {','.join(names)}", flush=True)

from taseg_tpu.engine import batch_from_arrays  # noqa: E402

local = batch_from_arrays(arrays)
assert local.point_coords.shape[0] == 2  # local shards only
batch = make_global_batch(mesh, local)
assert batch.point_coords.shape[0] == 4  # global leading axis

coords = jnp.asarray(arrays["point_coords"][0])
feats = jnp.asarray(arrays["point_feats"][0])
num = jnp.asarray(arrays["num_points"][0, 0])
variables = jax.jit(
    lambda c, f, n: model.init(
        {"params": jax.random.PRNGKey(0)},
        PointSet(coords=c, feats=f, num=n),
        build_unet_topology(c, n, caps),
        False,
    )
)(coords, feats, num)
state = TrainState(
    params=variables["params"],
    batch_stats=variables.get("batch_stats", {}),
    opt_state=tx.init(variables["params"]),
    step=jnp.int32(0),
)

step = make_train_step(model, criterion, tx, caps, mesh)
state, metrics = step(state, batch, jax.random.PRNGKey(0))
loss = float(np.asarray(metrics["loss"]))
print(f"LOSS {pid} {loss:.6f}", flush=True)

ev = make_eval_step(model, caps, mesh, 20, return_logits=False)
hist, _pred, _level_nums = ev(state.params, state.batch_stats, batch)
hist = np.asarray(hist, np.int64)  # psum-ed -> replicated
print(f"HIST {pid} {int(hist.sum())}", flush=True)

# d/f/b meter allreduce (reference train.py:421-423): feed each process a
# DIFFERENT per-rank timing and check both log the cross-process mean
from taseg_tpu.engine import _allreduce_mean_scalars  # noqa: E402

d, f, b = _allreduce_mean_scalars(
    (1.0 + pid, 10.0 + pid, 100.0 + pid)
)
print(f"TIMERS {pid} {d:.3f}/{f:.3f}/{b:.3f}", flush=True)
print(f"OK {pid}", flush=True)
