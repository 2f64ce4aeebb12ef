"""Benchmark: CDSegNet single-step-inference (SSI) throughput on one chip.

Protocol mirrors the reference timing setup (`README.md:243-248`,
`tools/test_time.py:30-64`): no TTA, no fragmented inference, single forward
pass per scene (SSI), full CDSegNet ScanNet architecture.

Baseline derivation (see BASELINE.md): the reference reports ~22 s for the
full ScanNet val split (312 scenes, ~150k grid-sampled points/scene) on
4x4090 -> ~2.13M points/s aggregate -> ~266k points/s per accelerator of a
v5e-8 pod when matched pod-for-node. `vs_baseline` is measured points/s/chip
over that 266k figure (>1.0 = faster than the reference per-chip).

Prints ONE JSON line. The artifact is flake-resilient (round-4 verdict #1):

- every section runs behind a transient-error retry (the remote-compile
  relay drops long HTTP bodies: "response body closed before all bytes were
  read" killed the round-4 run 400 s into the train compile);
- the train/recipe sections are best-effort: a final failure records an
  ``*_error`` field instead of destroying the already-measured SSI number;
- after each section the accumulated result is written to
  ``bench_partial.json`` so even a SIGKILL leaves evidence;
- the persistent XLA compile cache (enabled in ``cdsegnet_tpu/__init__``,
  `.jax_cache/`) makes retried/repeated compiles cheap — the reference's
  timing protocol produces a number every run (`tools/test_time.py:30-64`);
  ours must too.
"""

import json
import os
import sys
import time


def _note(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship_cfg, _synthetic_point_batch
from cdsegnet_tpu.models.builder import build_model
from cdsegnet_tpu.models.segmentor import CNFSegmentor

BASELINE_PTS_PER_SEC_PER_CHIP = 266_000.0

PARTIAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_partial.json")

#: Error signatures of the tunnel/relay between this host and the chip —
#: retry the section, the chip and the program are fine. (Round 4's fatal
#: "INTERNAL: .../remote_compile: read body: response body closed before all
#: bytes were read" is a mid-compile HTTP disconnect, not a compile failure.)
_TRANSIENT_SIGNATURES = (
    "read body",
    "response body closed",
    "connection reset",
    "connection refused",
    "broken pipe",
    "socket closed",
    "unavailable",
    "deadline exceeded",
    "transport closed",
    "keepalive",
)


def _is_transient(e: Exception) -> bool:
    s = str(e).lower()
    return any(sig in s for sig in _TRANSIENT_SIGNATURES)


def _is_oom(e: Exception) -> bool:
    """Genuine memory exhaustion (runtime RESOURCE_EXHAUSTED, or the compile
    helper's HTTP 500 that names memory). A bare 'tpu_compile_helper' match
    used to misclassify relay flakes and HLO bugs as OOMs (round-4 advisor)."""
    s = str(e)
    sl = s.lower()
    if "resource_exhausted" in sl or "out of memory" in sl:
        return True
    return "tpu_compile_helper" in sl and any(
        t in sl for t in ("memor", "exhaust", "oom", "hbm", "allocat")
    )


def _retry_transient(fn, *args, what="section", retries=2, **kwargs):
    for attempt in range(retries + 1):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 - classify and re-raise below
            if attempt < retries and _is_transient(e):
                _note(
                    f"transient relay error in {what} "
                    f"(attempt {attempt + 1}/{retries + 1}): {str(e)[:160]}"
                    " — retrying in 10s (compile cache makes retries cheap)"
                )
                time.sleep(10)
                continue
            raise


def _write_partial(result: dict):
    try:
        with open(PARTIAL_PATH, "w") as f:
            json.dump(result, f)
            f.write("\n")
    except OSError as e:  # pragma: no cover - diagnostics only
        _note(f"could not write {PARTIAL_PATH}: {e}")


def check_pallas_parity():
    """On-chip Pallas-vs-XLA agreement, fwd and grad (counterpart of the
    reference's op-level comparison scripts,
    `libs/pointops2/functions/test_attention_op_step1.py:1-50`).

    The interpret-mode tests prove kernel *semantics*; this runs the real
    Mosaic-compiled kernel on the bench chip so a silent on-TPU miscompile
    fails the bench loudly. Returns {fwd_err, grad_err} (max abs, f32)."""
    from cdsegnet_tpu.ops.attention import patch_attention
    from cdsegnet_tpu.ops.pallas.flash_attention import flash_patch_attention

    n, h, d, patch = 2048, 4, 32, 512
    rng = np.random.RandomState(0)
    q, k, v = (
        jnp.asarray(rng.randn(n, h, d), jnp.float32) for _ in range(3)
    )
    n_real = int(n * 0.9)
    batch = jnp.asarray(
        np.where(np.arange(n) < n_real, np.arange(n) * 2 // n, 2), jnp.int32
    )
    mask = jnp.asarray(np.arange(n) < n_real)
    cot = jnp.asarray(rng.randn(n, h, d), jnp.float32)
    scale = d ** -0.5
    valid = np.asarray(mask)[:, None, None]

    def run(fn):
        def loss(q, k, v):
            out = fn(q, k, v, batch, mask, patch, scale)
            return jnp.sum(jnp.where(mask[:, None, None], out * cot, 0.0))

        out = fn(q, k, v, batch, mask, patch, scale)
        grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
        return np.asarray(out), [np.asarray(g) for g in grads]

    out_p, g_p = run(flash_patch_attention)
    out_x, g_x = run(patch_attention)
    fwd_err = float(np.abs((out_p - out_x) * valid).max())
    grad_err = max(
        float(np.abs((a - b) * valid).max()) for a, b in zip(g_p, g_x)
    )
    if fwd_err > 5e-4 or grad_err > 5e-3:
        raise RuntimeError(
            f"Pallas/XLA attention divergence on chip: fwd={fwd_err:.2e} "
            f"grad={grad_err:.2e}"
        )
    return dict(pallas_fwd_err=fwd_err, pallas_grad_err=grad_err)


def check_learning_dynamics():
    """Tiny-flagship overfit smoke: GLS train loss must drop >=3x in 150
    steps on learnable (spatial-quadrant) labels.

    Guards the geometry/gradient substrate — a `2f480b2`-class neighbor-
    table corruption stalls this immediately — so a correctness break can
    never again ship behind green perf numbers (the round-3 bench scored
    1.174x while the flagship could not learn). Counterpart of the
    reference's integration testing = evaluation harness (SURVEY §4)."""
    from cdsegnet_tpu.engine.optimizer import build_optimizer
    from cdsegnet_tpu.engine.state import TrainState, make_train_step
    from cdsegnet_tpu.models.losses import build_criteria

    num_points, patch, depth, steps = 2048, 256, 8, 150
    cfg = _flagship_cfg(num_points, patch, scale=4)
    # shallow depths: the gate guards the geometry/gradient substrate
    # (pyramid, neighbor tables, stem/xCPE gathers, losses), which is depth-
    # independent — fewer blocks just cut the gate's compile time
    cfg["backbone"] = dict(
        cfg["backbone"], drop_path=0.0, num_classes=4,
        capacity_div=(1, 2, 4, 8, 16),
        n_enc_depths=(1, 1, 1, 2, 2), n_dec_depths=(1, 1, 1, 1),
        c_enc_depths=(1, 1, 1), c_dec_depths=(1, 1),
    )
    cfg["num_classes"] = 4
    model = build_model(cfg)
    criteria = build_criteria(cfg["criteria"], loss_type="GLS", task_num=2)
    point = _synthetic_point_batch(num_points, 2, depth=depth, seed=3)
    # learnable labels: class = spatial (x, y) quadrant, features carry the
    # class prototype (the tests/test_convergence.py recipe at bench scale)
    gc = np.asarray(point.grid_coord)
    mx, my = gc[:, 0].max() // 2, gc[:, 1].max() // 2
    label = (gc[:, 0] > mx).astype(np.int32) * 2 + (gc[:, 1] > my).astype(np.int32)
    rng = np.random.RandomState(0)
    feat = (np.eye(4, 6, dtype=np.float32) * 2.0)[label]
    feat += rng.randn(num_points, 6).astype(np.float32) * 0.05
    batch = dict(
        coord=np.asarray(point.coord),
        grid_coord=gc.astype(np.int32),
        feat=feat,
        segment=np.where(np.asarray(point.mask), label, -1).astype(np.int32),
        batch=np.asarray(point.batch),
        mask=np.asarray(point.mask),
    )
    rngs = dict(
        params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
        shuffle=jax.random.PRNGKey(2), diffusion=jax.random.PRNGKey(3),
    )
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(rngs, point)
    tx = build_optimizer(
        dict(type="AdamW", lr=2e-3, weight_decay=0.01),
        variables["params"],
        scheduler_cfg=dict(type="OneCycleLR", pct_start=0.1,
                           div_factor=10.0, final_div_factor=100.0),
        total_steps=steps,
    )
    state = TrainState.create(variables, tx, jax.random.PRNGKey(0))
    step_fn = make_train_step(model, criteria, tx, depth, 2, mesh=None)
    losses = []
    for _ in range(steps):
        state, metrics = step_fn(state, batch)
        losses.append(metrics["loss"])
    losses = [float(x) for x in losses]
    first, last = float(np.mean(losses[:5])), float(np.mean(losses[-10:]))
    dropped = int(np.asarray(metrics.get("dropped_l1", 0)))
    if not np.isfinite(last) or last > first / 3.0:
        raise RuntimeError(
            f"learning-dynamics gate FAILED: loss {first:.3f} -> {last:.3f} "
            f"over {steps} steps (needs >=3x descent; dropped_l1={dropped})"
        )
    return dict(learn_loss_first=round(first, 3), learn_loss_last=round(last, 3))


def run_ssi(cfg, num_points):
    """Measure the SSI step (geometry + model) on the chip.

    Returns (pts_per_sec, fields-for-extra)."""
    model = build_model(cfg)
    point = _synthetic_point_batch(num_points, 1, depth=10, seed=0)
    n_real = int(np.asarray(point.mask).sum())

    rngs = dict(
        params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
        shuffle=jax.random.PRNGKey(2), diffusion=jax.random.PRNGKey(3),
    )
    _note("init...")
    t0 = time.time()
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(rngs, point)
    jax.block_until_ready(variables)
    init_s = time.time() - t0
    _note(f"init {init_s:.1f}s; geometry compile...")

    noise = jax.random.normal(jax.random.PRNGKey(7), (num_points, 6))

    # split executables (mirrors SemSegTester): the geometry pyramid is a
    # pure function of the coordinates and compiles separately from the
    # model compute; per-step cost still includes BOTH (the SSI protocol
    # charges geometry to every scene). exactness="parity" skips compiling
    # the sorted overflow fallback (fresh geometry compile 75.8 s -> ~4 s);
    # the hard drop gate below guarantees the parity path is the one the
    # in-model cond would take on this batch, so the timing is identical.
    geom = jax.jit(
        lambda p: model.backbone.precompute_geometry(p, exactness="parity")
    )

    @jax.jit
    def ssi(variables, point, noise, geometry):
        return model.apply(
            variables, point, noise, geometry, method=CNFSegmentor.inference,
        )["seg_logits"]

    # force full materialization with a host read — block_until_ready can
    # return early through the remote-device relay
    t0 = time.time()
    g = geom(point)
    jax.block_until_ready(g)
    geom_compile_s = time.time() - t0
    _note(f"geometry compile {geom_compile_s:.1f}s; ssi compile...")

    # overflow gate: the pyramid must drop (almost) nothing on the bench
    # batch, or the timing exercises a degraded model / the slow sorted
    # fallback instead of the parity path (reference never drops points,
    # `point_transformer_v3m1_base.py:431-555`)
    drops = [int(np.asarray(lvl.dropped)) for lvl in g[0][1:]]
    _note(f"pyramid dropped per level: {drops} of {n_real} valid points")
    if any(d > max(1, n_real // 1000) for d in drops):
        raise RuntimeError(
            f"pyramid overflow on bench batch: {drops} of {n_real} points "
            f"dropped (>0.1% at some level) — capacities or synthetic data "
            f"are wrong; the benched model would be degraded"
        )
    t0 = time.time()
    out = ssi(variables, point, noise, g)
    _ = float(jnp.sum(out))
    compile_s = time.time() - t0
    _note(f"ssi compile {compile_s:.1f}s; timing...")

    # dispatch all iterations (the device stream executes them in order),
    # then force ONE host read: a per-iteration read would add the ~32 ms
    # relay round-trip latency to every step and measure the tunnel, not
    # the chip
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        out = ssi(variables, point, noise, geom(point))
    _ = float(jnp.sum(out))
    dt = (time.time() - t0) / iters

    pts_per_sec = n_real / dt
    _note(f"ssi {dt*1e3:.1f} ms/step ({pts_per_sec:.0f} pts/s)")
    return pts_per_sec, dict(
        step_ms=round(dt * 1e3, 2),
        n_points=n_real,
        init_s=round(init_s, 1),
        geom_compile_s=round(geom_compile_s, 1),
        compile_s=round(compile_s, 1),
        device=str(jax.devices()[0]),
        pyramid_dropped=drops,
    )


def main():
    num_points = int(os.environ.get("BENCH_POINTS", 104448))  # ~ScanNet scene
    patch = 1024
    cfg = _flagship_cfg(num_points, patch, scale=1)
    attn = os.environ.get("CDSEG_ATTENTION")  # "pallas" | "xla" | unset=auto
    if attn:
        cfg["backbone"]["use_pallas"] = attn == "pallas"
    # timing-protocol configuration (the reference likewise times a
    # dedicated config, `configs/scannet/CDSegNet_time.py`): serve the
    # UNROLLED layout — measured 286.3 ms vs 295.6 ms scanned on the v5e
    # chip (round-5 A/B; the scanned layout's while-loop overhead costs
    # ~9 ms/step and only buys fresh-compile time, which the persistent
    # compile cache amortizes). Reachable in production via
    # `tools/test.py --options serve_scan_blocks=False`.
    scan = os.environ.get("CDSEG_SCAN", "0")  # "1" scans block stacks
    cfg["backbone"]["scan_blocks"] = scan != "0"
    fuse = os.environ.get("CDSEG_FUSE")  # "1" enables dual-gather fusion
    if fuse is not None:
        cfg["backbone"]["fuse_dual_gathers"] = fuse != "0"
    # zero-pad narrow xCPE gather rows (exact; serve default — measured
    # 243.5 vs 247.3 ms/step end-to-end on v5e, DESIGN §14). "0" disables.
    cfg["backbone"]["pad_narrow_gathers"] = int(
        os.environ.get("CDSEG_PAD_GATHERS", "64"))
    # parity-blocked k125 stem (27 block-row gathers instead of 125 rows;
    # 61 -> 17 ms isolated). Statically "blocked" here: the bench's hard
    # drop gate below proves the no-overflow precondition the formulation
    # needs; production uses "cond" (always exact, compiles both).
    cfg["backbone"]["stem_mode"] = os.environ.get("CDSEG_STEM", "blocked")
    # parity-blocked k27 xCPE: measured SLOWER end-to-end (268.8 vs
    # 219.1 ms) despite a 4x isolated win — in-graph the direct k27
    # gathers overlap with attention/MLP, while the blocked form adds
    # serial member-scatter + (N, 64C) block materializations. Default
    # stays "gather"; the op remains for k125-scale kernels (the stem).
    cfg["backbone"]["xcpe_mode"] = os.environ.get("CDSEG_XCPE", "gather")

    result = dict(
        metric="ssi_points_per_sec_per_chip",
        value=None,
        unit="points/s",
        vs_baseline=None,
        extra={},
    )
    extra = result["extra"]

    # ---- correctness gates (hard failures; transient flakes retried) ----
    if jax.default_backend() != "cpu" and not os.environ.get("BENCH_SKIP_PARITY"):
        _note("pallas parity check...")
        extra.update(_retry_transient(check_pallas_parity, what="pallas parity"))
        _note(f"parity ok: {extra}")
        _write_partial(result)
    if not os.environ.get("BENCH_SKIP_LEARNING"):
        _note("learning-dynamics gate (150-step tiny overfit)...")
        t0 = time.time()
        extra.update(
            _retry_transient(check_learning_dynamics, what="learning gate")
        )
        _note(f"learning ok in {time.time()-t0:.1f}s: {extra}")
        _write_partial(result)

    # ---- SSI headline (hard failure; transient flakes retried) ----
    pts_per_sec, ssi_fields = _retry_transient(
        run_ssi, cfg, num_points, what="ssi section"
    )
    extra.update(ssi_fields)
    result["value"] = round(pts_per_sec, 1)
    result["vs_baseline"] = round(pts_per_sec / BASELINE_PTS_PER_SEC_PER_CHIP, 3)
    # BASELINE.md north star: beat the 4-GPU reference's SSI points/sec on
    # one v5e-8. Scenes are independent and the fragment-parallel tester
    # (engine/test.py::make_sharded_infer_fn, exercised by the driver's
    # dryrun_multichip on the virtual mesh) runs one fragment per chip with
    # NO cross-chip collectives, so the pod aggregate is 8x per-chip
    # throughput; host-side vote accumulation overlaps device compute via
    # the group buffer. Reference aggregate (4x4090): ~2.13M pts/s.
    extra["ssi_v5e8_aggregate_est"] = round(8 * pts_per_sec, 1)
    extra["vs_reference_aggregate_4x4090"] = round(
        8 * pts_per_sec / 2_130_000.0, 3
    )
    _write_partial(result)

    # ---- train sections (best-effort: record errors, keep the artifact) ----
    if not os.environ.get("BENCH_SKIP_TRAIN"):
        _note("train bench @104k...")
        try:
            try:
                train_pps, train_ms, train_compile_s = _retry_transient(
                    bench_train, cfg, num_points, what="train@104k"
                )
                t_remat = False
            except Exception as e:
                if not _is_oom(e):
                    raise
                _note(f"train @104k OOM without remat ({str(e)[:80]}); "
                      "retrying with remat")
                train_pps, train_ms, train_compile_s = _retry_transient(
                    bench_train, cfg, num_points, remat=True,
                    what="train@104k (remat)",
                )
                t_remat = True
            extra.update(
                train_points_per_sec_per_chip=round(train_pps, 1),
                train_step_ms=round(train_ms, 2),
                train_compile_s=round(train_compile_s, 1),
                train_remat=t_remat,
                train_scan=os.environ.get("CDSEG_TRAIN_SCAN", "0") != "0",
                train_fused=os.environ.get("CDSEG_TRAIN_FUSE", "1") != "0",
            )
        except Exception as e:  # noqa: BLE001 - keep the SSI artifact alive
            _note(f"train@104k section FAILED after retries: {str(e)[:300]}")
            extra["train_error"] = str(e)[:300]
        _write_partial(result)

    if not os.environ.get("BENCH_SKIP_RECIPE"):
        # the shipped recipe bucket: 2 x SphereCrop-102,400 points/chip
        # (configs/scannet/cdsegnet.py:10-12, reference bs2/GPU).
        recipe_points = 204800
        _note("train bench @204800 (recipe scale)...")
        try:
            r_pps, r_ms, r_compile, r_cfg_note = _recipe_train(cfg, recipe_points)
            extra.update({
                "train_points_per_sec_per_chip@204800": round(r_pps, 1),
                "train_step_ms@204800": round(r_ms, 2),
                "train_compile_s@204800": round(r_compile, 1),
                "train_config@204800": r_cfg_note,
            })
        except Exception as e:  # noqa: BLE001 - keep the SSI artifact alive
            _note(f"recipe section FAILED after retries: {str(e)[:300]}")
            extra["recipe_error"] = str(e)[:300]
        _write_partial(result)

    print(json.dumps(result))


def _recipe_train(cfg, recipe_points):
    """Recipe-scale (204,800-pt) train step: gradient microbatching.

    Unrolled no-remat does NOT fit at this scale (~22 GB temp); instead of
    falling back to the slower scan+dots_saveable whole-graph remat
    (59.8k pts/s, round 4), accumulate gradients over 2 microbatches of
    102,400 points each — morally identical to the reference's bs2/GPU
    recipe (`configs/scannet/CDSegNet.py:4-152`), with each microbatch
    running the fast unrolled no-remat layout."""
    micro = int(os.environ.get("CDSEG_MICROBATCH", "2"))
    if micro > 1:
        try:
            pps, ms, compile_s = _retry_transient(
                bench_train, cfg, recipe_points, remat=False, iters=3,
                scan=False, microbatch=micro, what="recipe microbatch",
            )
            return pps, ms, compile_s, f"unrolled noremat x{micro} microbatch"
        except Exception as e:
            if not _is_oom(e):
                raise
            _note(f"recipe microbatch OOM ({str(e)[:80]}); "
                  "falling back to scan+dots_saveable")
    pps, ms, compile_s = _retry_transient(
        bench_train, cfg, recipe_points, remat=True, iters=3, scan=True,
        policy="dots_saveable", what="recipe scan+dots",
    )
    return pps, ms, compile_s, "scan + dots_saveable remat"


def bench_train(cfg, num_points, remat=None, iters=5, scan=None, policy=None,
                microbatch=1):
    """Full training step (fwd + bwd + AdamW, 2 scenes/bucket).

    Trains UNROLLED (``scan_blocks=False``) by default: `lax.scan` residual
    stacks cannot be rematerialized across while-loop iterations by XLA, so
    the scanned no-remat step needs 17.7 GB temp vs 10.7 GB unrolled at the
    104k bucket (tools/profile_train_mem.py, round 4) — unrolled no-remat
    fits v5e HBM and measured 74.6k pts/s vs 64.6k scan+remat
    (tools/bench_train_variants.py). Checkpoints convert to the scanned
    serving layout via `cdsegnet_tpu.utils.params.restack_block_params`.

    ``microbatch`` > 1 splits the bucket into that many equal microbatches
    and accumulates gradients (`make_train_step(..., microbatch=)`), so
    buckets whose activations exceed HBM still train the fast unrolled
    layout.
    """
    import optax  # noqa: F401

    from cdsegnet_tpu.engine.optimizer import build_optimizer
    from cdsegnet_tpu.engine.state import TrainState, make_train_step
    from cdsegnet_tpu.models.losses import build_criteria

    cfg = dict(cfg)
    # remat OFF by default: the 104k-point bucket's activations fit v5e HBM
    # (unrolled + rematerialized conv gathers) and full-recompute remat costs
    # ~14% train throughput; set CDSEG_REMAT=1 for larger buckets
    if remat is None:
        remat = os.environ.get("CDSEG_REMAT", "0") != "0"
    if scan is None:
        scan = os.environ.get("CDSEG_TRAIN_SCAN", "0") != "0"
    # fused dual gathers for TRAINING (the shipped config default): +2.8%
    # train throughput @104k (76.7k vs 74.6k pts/s, round-5 A/B); serving
    # stays unfused (DESIGN §14)
    t_fuse = os.environ.get("CDSEG_TRAIN_FUSE", "1") != "0"
    # train keeps its own pad switch (default off): the serve-side win is
    # measured, the train-side effect is not, and the wider remat'd gather
    # buffer could tip the memory-tight recipe microbatch path into OOM
    t_pad = int(os.environ.get("CDSEG_TRAIN_PAD", "0"))
    # train measures the production stem: "cond" picks the blocked path at
    # runtime when nothing dropped (the SSI gate's generator) and stays
    # exact by construction if a batch ever overflows
    t_stem = os.environ.get("CDSEG_TRAIN_STEM", "cond")
    cfg["backbone"] = dict(cfg["backbone"], remat_blocks=remat,
                           scan_blocks=scan, fuse_dual_gathers=t_fuse,
                           pad_narrow_gathers=t_pad, stem_mode=t_stem)
    rp = policy or os.environ.get("CDSEG_REMAT_POLICY")  # "dots_saveable"
    if rp:
        cfg["backbone"]["remat_policy"] = rp
    model = build_model(cfg)
    criteria = build_criteria(cfg["criteria"], loss_type="GLS", task_num=2)
    keys = ("coord", "grid_coord", "feat", "segment", "batch", "mask")
    if microbatch > 1:
        # one bucket per microbatch: scenes split across slices, each slice
        # a self-contained bucket with local scene ids and its own padding
        assert num_points % microbatch == 0 and 2 % min(microbatch, 2) == 0
        scenes_per_micro = max(1, 2 // microbatch)
        pts_per_micro = num_points // microbatch
        points = [
            _synthetic_point_batch(
                pts_per_micro, scenes_per_micro, depth=10, seed=1 + i
            )
            for i in range(microbatch)
        ]
        point = points[0]
        batch = {
            k: np.stack([np.asarray(getattr(p, k)) for p in points])
            for k in keys
        }
        n_real = sum(int(np.asarray(p.mask).sum()) for p in points)
        num_scenes = scenes_per_micro
    else:
        point = _synthetic_point_batch(num_points, 2, depth=10, seed=1)
        batch = {k: getattr(point, k) for k in keys}
        n_real = int(np.asarray(point.mask).sum())
        num_scenes = 2
    rngs = dict(
        params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
        shuffle=jax.random.PRNGKey(2), diffusion=jax.random.PRNGKey(3),
    )
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(rngs, point)
    tx = build_optimizer(
        dict(type="AdamW", lr=2e-3, weight_decay=0.05),
        variables["params"],
        scheduler_cfg=dict(type="OneCycleLR", pct_start=0.5,
                           div_factor=10.0, final_div_factor=1000.0),
        total_steps=1000,
        param_dicts=[dict(keyword="block", lr=2e-4)],
    )
    state = TrainState.create(variables, tx, jax.random.PRNGKey(0))
    step_fn = make_train_step(model, criteria, tx, 10, num_scenes, mesh=None,
                              microbatch=microbatch)
    t0 = time.time()
    state, metrics = step_fn(state, batch)
    _ = float(metrics["loss"])
    compile_s = time.time() - t0
    _note(f"train compile {compile_s:.1f}s @ {num_points} pts"
          + (f" (microbatch x{microbatch})" if microbatch > 1 else ""))
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step_fn(state, batch)
    _ = float(metrics["loss"])
    dt = (time.time() - t0) / iters
    return n_real / dt, dt * 1e3, compile_s


if __name__ == "__main__":
    main()
