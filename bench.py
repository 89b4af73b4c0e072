#!/usr/bin/env python
"""Benchmark: end-to-end MinkUNet scans/sec/chip (voxelize -> sparse UNet ->
per-point head), the BASELINE.json north-star metric (target >= 50).

Runs the flagship single-frame config (MinkUNet mk34 cr1.0 ResBlock,
SemanticKITTI-scale synthetic scans, ~119k voxels/scan at 0.05 m) in
bfloat16 inference on one chip and prints ONE JSON line.  Besides the
headline scans/s the JSON carries the proof obligations of the perf claim
(VERDICT r2 item 1c): a topology/model stage split, the conv FLOP count
actually implied by the rulebooks, the achieved conv TF/s, and an MXU
roofline probe measured on the same device seconds earlier — so the
"fraction of speed-of-light" figure is self-contained and re-checkable.

TASEG_BENCH_TRAIN=1 benchmarks the full jitted train step instead
(topology + fwd + loss + bwd + update) — the d/f/b-meter analogue of
reference train.py:418-435.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_SCANS_PER_SEC = 50.0  # BASELINE.json north_star
BATCH_SCANS = int(os.environ.get("TASEG_BENCH_BATCH", "1"))
# smoke knobs (CPU dry runs of the bench itself); chip runs use defaults
N_POINTS = int(os.environ.get("TASEG_BENCH_POINTS", "120000"))
N_ITER = int(os.environ.get("TASEG_BENCH_ITERS", "20"))

# Wall-clock budget for everything AFTER the headline has been printed
# (round 4 lesson: the driver timed the bench out at rc=124 and the one
# terminal print lost the already-measured headline — BENCH_r04.json is
# parsed:null).  The headline is now printed+flushed the moment it is
# measured; each optional probe first checks the remaining budget.
_T0 = time.monotonic()
BUDGET_S = float(os.environ.get("TASEG_BENCH_BUDGET_S", "1100"))


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _emit(payload: dict) -> None:
    """Print one JSON metric line, flushed, so a later timeout cannot
    lose it.  Every line emitted is a complete, driver-parseable record
    with the same metric+value — whichever line the driver picks up
    (first or last) carries the headline."""
    print(json.dumps(payload), flush=True)


def _mark(label: str) -> None:
    """Phase timestamp on stderr: locates where the wall-clock goes (the
    tunnel charges each executable's FIRST execution a relayout cost that
    dwarfs the steady-state, so phase count — not iteration count — sets
    the bench's footprint)."""
    print(f"[bench +{time.monotonic() - _T0:7.1f}s] {label}",
          file=sys.stderr, flush=True)


def _drain(out) -> float:
    """Force completion of everything enqueued before `out`.

    On the axon tunnel `block_until_ready` can return WITHOUT draining the
    execution queue (measured 2026-08-18: a chained-matmul probe "timed"
    at 19x MXU peak under block_until_ready; sane under a host fetch), and
    large-buffer D2H runs ~0.1 MB/s — so the drain fetches ONE f32 derived
    from the first output leaf via a jitted slice (execution is in-order)."""
    import jax
    import jax.numpy as jnp

    global _first_elem
    if _first_elem is None:
        _first_elem = jax.jit(
            lambda x: jax.lax.reshape(x, (x.size,))[:1].astype(jnp.float32)
        )
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(_first_elem(leaf))[0])


_first_elem = None


def _time(fn, *args, n=20):
    out = fn(*args)
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _drain(out)
    return (time.perf_counter() - t0) / n


def jax_block(out):
    _drain(out)


def _conv_inventory(cr, planes, num_layer, in_dim=4):
    """(level, table, C_in, C_out) for every conv in MinkUNet, matching
    models/voxel/minkunet.py exactly.  table: 'k3' (27-pt same-level),
    'down'/'up' (8-pt strided), 'mm' (1x1 matmul)."""
    cs = [int(cr * x) for x in planes]
    convs = [(0, "k3", in_dim, cs[0]), (0, "k3", cs[0], cs[0])]  # stem

    def res_stack(level, c_in, c_out, n):
        for i in range(n):
            ci = c_in if i == 0 else c_out
            convs.append((level, "k3", ci, c_out))
            convs.append((level, "k3", c_out, c_out))
            if ci != c_out:
                convs.append((level, "mm", ci, c_out))

    x_ch = cs[0]
    enc_ch = [cs[0]]
    for l in range(1, 5):
        convs.append((l, "down", x_ch, x_ch))
        res_stack(l, x_ch, cs[l], num_layer[l - 1])
        x_ch = cs[l]
        enc_ch.append(x_ch)
    for i, lvl in enumerate((4, 3, 2, 1)):
        out_ch = cs[5 + i]
        convs.append((lvl, "up", x_ch, out_ch))
        res_stack(lvl - 1, out_ch + enc_ch[lvl - 1], out_ch, num_layer[4 + i])
        x_ch = out_ch
    return convs


def _build_inputs(batch_scans: int):
    """Collate `batch_scans` synthetic scans into one padded shard."""
    from taseg_tpu.data.synthetic import synthetic_scan
    from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard

    pipe = VoxelPipeline(voxel_size=0.05, training=False)
    rng = np.random.default_rng(0)
    samples = []
    for _ in range(batch_scans):
        pts, labels = synthetic_scan(rng, N_POINTS)
        ring = np.zeros((len(pts), 1), np.float32)
        samples.append(
            pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
        )
    # point capacity: same ~9% headroom ratio as the standard 120k -> 131072
    cap = (N_POINTS * 131072 // 120000 + 255) // 256 * 256 * batch_scans
    return collate_shard(samples, cap), cap


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from taseg_tpu.models import MinkUNet, UNetCapacities, build_unet_topology
    from taseg_tpu.ops import PointSet

    # one shard holding BATCH_SCANS collated scans
    arrays, cap = _build_inputs(BATCH_SCANS)
    _mark("inputs built")

    caps = UNetCapacities.for_points(cap)
    cr, planes, num_layer = 1.0, MinkUNet.planes, MinkUNet.num_layer
    model = MinkUNet(
        num_classes=20, cr=cr, block="ResBlock", compute_dtype="bfloat16"
    )

    coords = jnp.asarray(arrays["point_coords"])
    feats = jnp.asarray(arrays["point_feats"])
    num = jnp.asarray(arrays["num_points"][0])
    points = PointSet(coords=coords, feats=feats, num=num)
    # calibration pass: fit level capacities to the measured occupancy
    # (+10%), as a deployment derives them from dataset statistics
    # (UNetCapacities.fit).  The fit result is cached on disk: on this
    # tunnel every distinct executable's FIRST execution costs ~100-170 s
    # regardless of compile caching, so skipping the unfitted calibration
    # build on reruns buys more wall-clock than any iteration trimming.
    fitcaps_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".jax_cache", "bench_fitcaps.json",
    )
    fit_key = f"{N_POINTS}x{BATCH_SCANS}:{cap}"
    try:
        with open(fitcaps_path) as f:
            fitted = json.load(f)
    except (OSError, ValueError):
        fitted = {}
    if fit_key in fitted:
        caps = UNetCapacities(points=cap, voxels=tuple(fitted[fit_key]))
        topo_fn = jax.jit(
            lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False,
                                             assume_sorted_points=True)
        )
        topo = topo_fn(coords, num)
        _drain(topo)
        _mark("fitted topology built (cached caps)")
    else:
        # jit even this one-off build: eager dispatch through the device
        # tunnel is pathologically slow (minutes for a topology build)
        topo_fn = jax.jit(
            lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False,
                                             assume_sorted_points=True)
        )
        try:
            topo = topo_fn(coords, num)
            _drain(topo)
        except Exception as e:  # pragma: no cover — backend-specific safety
            # fall back to the pure-XLA join path if the Pallas join-scan
            # kernel cannot compile/run on this backend revision
            print(f"join kernel disabled: {type(e).__name__}",
                  file=sys.stderr)
            os.environ["TASEG_NO_JOIN_KERNEL"] = "1"
            topo_fn = jax.jit(
                lambda c, n: build_unet_topology(c, n, caps,
                                                 devox_pairs=False)
            )
            topo = topo_fn(coords, num)
        _mark("unfitted topology built+drained")
        level_nums = [int(np.asarray(lt.num)) for lt in topo.levels]
        caps = UNetCapacities.fit(cap, level_nums, margin=1.1)
        fitted[fit_key] = list(caps.voxels)
        try:
            os.makedirs(os.path.dirname(fitcaps_path), exist_ok=True)
            with open(fitcaps_path, "w") as f:
                json.dump(fitted, f)
        except OSError:  # pragma: no cover
            pass
        topo_fn = jax.jit(
            lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False,
                                             assume_sorted_points=True)
        )
        topo = topo_fn(coords, num)
        _mark("fitted topology built")
    params = jax.jit(
        lambda c, f, n: model.init(
            {"params": jax.random.PRNGKey(0)},
            PointSet(coords=c, feats=f, num=n),
            build_unet_topology(c, n, caps, assume_sorted_points=True),
            False,
        )
    )(coords, feats, num)
    _mark("params initialized")

    def _time_train():
        # training throughput: the REAL jitted SPMD train step (topology
        # build + fwd + loss + bwd + pmean + sgd update) on one chip —
        # the d/f/b-meter analogue of reference train.py:418-435
        import optax

        from taseg_tpu.loss import Losses
        from taseg_tpu.parallel import (
            Batch, TrainState, make_mesh, make_train_step,
        )

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
        rng = jax.random.PRNGKey(0)
        # the first 1-2 EXECUTIONS (not just the compile) pay a one-time
        # re-layout of params/opt-state into the executable's preferred
        # layouts — ~250 s through the axon tunnel (profiled 2026-08-19:
        # step 0 248.95 s, step 1+ 0.34 s).  Warm until two consecutive
        # steps agree OR the wall-clock budget runs out (round-4 lesson:
        # the iteration-capped loop could burn 6 x 250 s).
        prev = None
        warm_deadline = time.monotonic() + max(_remaining(), 60.0)
        for _ in range(6):
            t0 = time.perf_counter()
            state, _ = step(state, batch, rng)
            _drain(state.params)
            dt_w = time.perf_counter() - t0
            if prev is not None and dt_w < 1.5 * prev:
                break
            if time.monotonic() + dt_w > warm_deadline:
                break  # no time for another warm-up of this size
            prev = dt_w
        # budget-capped timed loop: never enqueue more steps than the
        # remaining wall-clock can drain (a non-converged warm-up means
        # dt_w may still be the ~250 s relayout figure)
        n = (
            N_ITER
            if _remaining() > N_ITER * dt_w + 30
            else max(1, min(5, int(max(_remaining() - 10.0, 0.0) / max(dt_w, 1e-3))))
        )
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, batch, rng)
        _drain(state.params)
        dt = (time.perf_counter() - t0) / n
        return dt, float(metrics["loss"])

    if os.environ.get("TASEG_BENCH_TRAIN"):
        dt, loss = _time_train()
        _emit(
            {
                "metric": "minkunet_cr10_train_scans_per_sec_per_chip",
                "value": round(BATCH_SCANS / dt, 3),
                "unit": "scans/s",
                "vs_baseline": round(
                    BATCH_SCANS / dt / BASELINE_SCANS_PER_SEC, 3
                ),
                "breakdown": {
                    "train_step_ms": round(dt * 1e3, 2),
                    "loss": round(loss, 4),
                },
            }
        )
        return

    @jax.jit
    def fwd(params, coords, feats, num):
        pts = PointSet(coords=coords, feats=feats, num=num)
        # inference: skip devox backward pair tables (eval never
        # differentiates through interpolation)
        topo = build_unet_topology(coords, num, caps, devox_pairs=False,
                                   assume_sorted_points=True)
        return model.apply(params, pts, topo, False)

    n_iter = N_ITER
    dt = _time(fwd, params, coords, feats, num, n=n_iter)
    _mark("fused fwd timed")
    scans_per_sec = BATCH_SCANS / dt

    # ---- HEADLINE, printed the moment it exists (VERDICT r4 #1): if any
    # later probe blows the driver's budget, this line is already in the
    # captured tail ---------------------------------------------------------
    headline = {
        "metric": "minkunet_cr10_infer_scans_per_sec_per_chip",
        "value": round(scans_per_sec, 3),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 3),
        "breakdown": {
            "batch_scans": BATCH_SCANS,
            "fused_step_ms": round(dt * 1e3, 2),
        },
    }
    _emit(headline)

    # ---- stage split: topology alone / model alone (separate jits lose
    # cross-stage fusion, so the two may not sum to the fused total; they
    # bound where the time goes) --------------------------------------------
    t_topo = t_apply = None
    if _remaining() > 120:
        t_topo = _time(topo_fn, coords, num, n=n_iter)
        _mark("topo stage timed")
        apply_fn = jax.jit(
            lambda p, pts, topo: model.apply(p, pts, topo, False)
        )
        t_apply = _time(apply_fn, params, points, topo, n=n_iter)
        _mark("apply stage timed")

    # ---- optional topology decomposition (TASEG_BENCH_TOPO_DETAIL=1):
    # cumulative level builds + devox-table cost via the public num_levels/
    # devox_strides knobs — deltas localize the per-level sort/join cost ---
    topo_detail = None
    if os.environ.get("TASEG_BENCH_TOPO_DETAIL") and _remaining() > 300:
        topo_detail = {}
        prev = 0.0
        for nl in range(1, 6):
            fn = jax.jit(
                lambda c, n, nl=nl: build_unet_topology(
                    c, n, caps, num_levels=nl, devox_strides=(),
                    devox_pairs=False,
                )
            )
            t = _time(fn, coords, num, n=n_iter)
            topo_detail[f"levels_1to{nl}_ms"] = round(t * 1e3, 2)
            topo_detail[f"level{nl - 1}_delta_ms"] = round(
                (t - prev) * 1e3, 2
            )
            prev = t
        topo_detail["devox_tables_ms"] = round(
            (t_topo - prev) * 1e3, 2
        )

    # ---- conv FLOPs implied by the actual rulebooks -----------------------
    nnz = {}
    for l, lt in enumerate(topo.levels):
        v = int(np.asarray(lt.num))
        nnz[(l, "k3")] = int((np.asarray(lt.rb_k3) >= 0).sum())
        nnz[(l, "mm")] = v
        if lt.strided is not None:
            # one (fine, coarse) pair per valid fine row, either direction
            pairs = int((np.asarray(lt.strided.parent) >= 0).sum())
            nnz[(l, "down")] = pairs
            nnz[(l, "up")] = pairs
    conv_flops = 0
    for lvl, table, c_in, c_out in _conv_inventory(cr, planes, num_layer):
        conv_flops += 2 * nnz[(lvl, table)] * c_in * c_out
    conv_tflops = conv_flops / 1e12

    # ---- gather roofline probe: row-gather rate at conv-like row widths
    # (v5e gathers are ROW-bound ~610M rows/s for rows <= 192 B), plus the
    # gather rows the conv stack actually issues under the current TGF
    # routing — together with the MXU probe this bounds the apply time ----
    import jax.numpy as _jnp
    from taseg_tpu.models import layers as _layers

    gather_rows_per_s = None
    if _remaining() > 90:
        src = _jnp.ones((262144, 32), _jnp.bfloat16)
        g_idx = _jnp.asarray(
            np.random.default_rng(1).integers(0, 262144, 1048576, np.int32)
        )

        @jax.jit
        def gprobe(src, idx):
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,),
            )
            return jax.lax.gather(
                src, idx[:, None], dn, slice_sizes=(1, src.shape[1]),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )

        t_g = _time(gprobe, src, g_idx, n=10)
        _mark("gather probe timed")
        gather_rows_per_s = 1048576 / t_g

    conv_gather_rows = 0
    level_v = {l: int(np.asarray(lt.num)) for l, lt in enumerate(topo.levels)}
    for lvl, table, c_in, c_out in _conv_inventory(cr, planes, num_layer):
        if table == "k3":
            # TGF (C_in <= threshold) and f3 (above it, when routed) both
            # issue 9 gather rows per output voxel; the legacy 27-offset
            # path issues 27 (f3 rows are 3x wider — same bytes, 1/3 rows)
            wide9 = _layers.WIDE_CONV == "f3"
            per_v = 9 if (c_in <= _layers.TGF_MAX_CIN or wide9) else 27
            conv_gather_rows += per_v * level_v[lvl]
        elif table in ("down", "up"):
            # one fine-row gather either direction (ops.strided_conv)
            conv_gather_rows += level_v[lvl - 1]

    # ---- MXU roofline probe: chained 2048x512 @ 512x512 bf16 matmuls ------
    probe_tfs = None
    if _remaining() > 90:
        a = jnp.ones((2048, 512), jnp.bfloat16)
        w = jnp.ones((512, 512), jnp.bfloat16)

        @jax.jit
        def probe(a, w):
            def body(x, _):
                y = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
                return y * (1.0 / 512.0), None

            return jax.lax.scan(body, a, None, length=200)[0]

        t_probe = _time(probe, a, w, n=5)
        _mark("mxu probe timed")
        probe_tfs = 200 * 2 * 2048 * 512 * 512 / t_probe / 1e12

    achieved_tfs = conv_tflops / t_apply if t_apply else None
    # additive lower bound on apply: conv gathers at the probed row rate
    # plus conv FLOPs at the probed MXU rate (ignores BN/head/devox)
    floor_ms = None
    if gather_rows_per_s and probe_tfs:
        floor_ms = (
            conv_gather_rows / gather_rows_per_s + conv_tflops / probe_tfs
        ) * 1e3

    # ---- train-step + batch=2 companions (VERDICT r3 #3): same JSON line,
    # guarded so a failure in either cannot sink the headline metric ------
    def _batch2_metrics():
        arrays2, cap2 = _build_inputs(2)
        c2 = jnp.asarray(arrays2["point_coords"])
        f2 = jnp.asarray(arrays2["point_feats"])
        n2 = jnp.asarray(arrays2["num_points"][0])
        key2 = f"{N_POINTS}x2:{cap2}"
        if key2 in fitted:
            # fitted-caps cache (same rationale as the headline path: a
            # skipped calibration program saves a ~100-170 s first-exec)
            caps2 = UNetCapacities(points=cap2, voxels=tuple(fitted[key2]))
        else:
            caps2 = UNetCapacities.for_points(cap2)
            t2 = jax.jit(
                lambda c, n: build_unet_topology(
                    c, n, caps2, devox_pairs=False
                )
            )(c2, n2)
            caps2 = UNetCapacities.fit(
                cap2, [int(np.asarray(lt.num)) for lt in t2.levels],
                margin=1.1,
            )
            fitted[key2] = list(caps2.voxels)
            try:
                with open(fitcaps_path, "w") as f:
                    json.dump(fitted, f)
            except OSError:  # pragma: no cover
                pass
        p2 = params  # params are batch-independent; skip a second init
        fwd2 = jax.jit(
            lambda p, c, f, n: model.apply(
                p,
                PointSet(coords=c, feats=f, num=n),
                build_unet_topology(c, n, caps2, devox_pairs=False,
                                    assume_sorted_points=True),
                False,
            )
        )
        dt2 = _time(fwd2, p2, c2, f2, n2, n=N_ITER)
        return {
            "batch2_scans_per_sec": round(2 / dt2, 3),
            "batch2_fused_ms": round(dt2 * 1e3, 2),
        }

    # ---- companions (VERDICT r3 #3 / r4 #1): batch2 first (cheaper, and
    # a headline-promotion candidate), then train — each budget-gated and
    # exception-guarded so neither can sink what is already printed ------
    extras = {}
    if not os.environ.get("TASEG_BENCH_FAST"):
        if BATCH_SCANS == 1 and _remaining() > 180:
            try:
                extras.update(_batch2_metrics())
                _mark("batch2 timed")
                _emit({**headline, "breakdown": {
                    **headline["breakdown"], **extras}})
            except Exception as e:  # pragma: no cover
                extras["batch2_error"] = type(e).__name__
                print(f"batch2 probe failed: {e!r}", file=sys.stderr)
        # the train step's first execution pays a ~250 s one-time layout
        # cost through the tunnel (the warm loop converges after two
        # steps: 249 s then 0.34 s, profiled 2026-08-19); only start if
        # there is room for one relayout plus the timed loop
        if _remaining() > 300:
            try:
                tdt, _tloss = _time_train()
                _mark("train timed")
                extras["train_scans_per_sec"] = round(BATCH_SCANS / tdt, 3)
                extras["train_step_ms"] = round(tdt * 1e3, 2)
            except Exception as e:  # pragma: no cover — keep headline alive
                extras["train_error"] = type(e).__name__
                print(f"train probe failed: {e!r}", file=sys.stderr)

    def _ms(t):
        return round(t * 1e3, 2) if t is not None else None

    breakdown = {
        "batch_scans": BATCH_SCANS,
        "fused_step_ms": round(dt * 1e3, 2),
        "topology_ms": _ms(t_topo),
        "model_apply_ms": _ms(t_apply),
        "conv_gflops_per_scan": round(conv_tflops * 1e3 / BATCH_SCANS, 1),
        "conv_achieved_tfs": (
            round(achieved_tfs, 2) if achieved_tfs else None
        ),
        "mxu_probe_tfs": round(probe_tfs, 1) if probe_tfs else None,
        "conv_mfu_vs_probe": (
            round(achieved_tfs / probe_tfs, 3)
            if achieved_tfs and probe_tfs
            else None
        ),
        "gather_probe_mrows_per_s": (
            round(gather_rows_per_s / 1e6, 1) if gather_rows_per_s else None
        ),
        "conv_gather_mrows_per_scan": round(
            conv_gather_rows / 1e6 / BATCH_SCANS, 2
        ),
        "conv_roofline_floor_ms": (
            round(floor_ms, 2) if floor_ms is not None else None
        ),
        "bench_wallclock_s": round(time.monotonic() - _T0, 1),
        **extras,
        **({"topo_detail": topo_detail} if topo_detail else {}),
    }
    _emit({**headline, "breakdown": breakdown})


if __name__ == "__main__":
    main()
