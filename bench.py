"""Benchmark harness: CIFAR-10 ViT-tiny training throughput on one chip.

Headline metric (BASELINE.json): images/sec/chip, train fwd+bwd+update, for
the reference recipe — ViT-tiny/4 @ 32px (d192, depth 6, heads 6), CIFAR-10
shapes, batch 128, pos_encoding=rope-axial (the reference's best CIFAR-10
method), AdamW + cosine. vs_baseline is against the measured PyTorch-CPU
throughput of the ACTUAL reference model on this host class
(BASELINE_MEASURED.json; the reference publishes no throughput numbers).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Fail fast if the TPU tunnel is down (backend init otherwise hangs
# indefinitely and the harness records nothing). A SIGALRM handler can't
# interrupt a hang inside native PJRT code (Python handlers only run
# between bytecodes, and the native call may hold the GIL), so probe the
# backend in a SUBPROCESS with a hard timeout and emit a diagnosable JSON
# line if it never comes up.
if os.environ.get("BENCH_SKIP_BACKEND_PROBE") != "1":
    import subprocess
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=900, check=True, capture_output=True)
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
        print(json.dumps({
            "metric": "images_per_sec_per_chip", "value": 0,
            "unit": "img/s",
            "error": f"TPU backend init failed ({type(e).__name__}): "
                     "tunnel down?"}))
        sys.exit(3)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BATCH = 128
STEPS = 40
WARMUP = 3
PEAK_BF16_TFLOPS = 197.0  # TPU v5e per-chip bf16 peak (MFU denominator)


def train_step_flops(cfg, batch: int) -> float:
    """Analytic matmul FLOPs for one training step (fwd + bwd + update ≈
    3× forward: backward costs ~2 forward matmul passes; the optimizer is
    bandwidth-bound and not counted). Standard 2·M·N·K per matmul."""
    e, n = cfg.embed_dim, cfg.seq_len
    h, dh, hid = cfg.num_heads, cfg.head_dim, cfg.mlp_hidden_dim
    fwd = 2 * cfg.num_patches * (cfg.in_chans * cfg.patch_size ** 2) * e
    per_block = (
        2 * n * e * (3 * e)          # qkv projection
        + 2 * (2 * h * n * n * dh)   # q·kᵀ and p·v
        + 2 * n * e * e              # output projection
        + 2 * (2 * n * e * hid)      # mlp fc1 + fc2
    )
    fwd += cfg.depth * per_block
    fwd += 2 * e * cfg.num_classes
    return 3.0 * batch * fwd


def measure(pos_encoding="rope-axial", attention_impl="auto",
            compute_dtype="float32", batch=BATCH, steps=STEPS, **cfg_kw):
    from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig
    from vit_rpe_rope_tpu.data.datasets import NORMALIZATION
    from vit_rpe_rope_tpu.models import vit
    from vit_rpe_rope_tpu.parallel.mesh import (
        DATA_AXIS, NamedSharding, P, make_mesh)
    from vit_rpe_rope_tpu.train import train_step as ts

    cfg = ViTConfig(pos_encoding=pos_encoding, in_chans=3,
                    attention_impl=attention_impl,
                    compute_dtype=compute_dtype, **cfg_kw)
    tcfg = TrainConfig(dataset="cifar10", batch_size=batch, epochs=20)
    mesh = make_mesh(batch_size=batch)
    rep = NamedSharding(mesh, P())
    idx_sh = NamedSharding(mesh, P(None, DATA_AXIS))

    rng = np.random.default_rng(0)
    n = batch * steps
    data_x = jax.device_put(
        rng.integers(0, 256, (n, cfg.img_size, cfg.img_size, 3), dtype=np.uint8), rep)
    data_y = jax.device_put((np.arange(n) % 10).astype(np.int32), rep)
    from vit_rpe_rope_tpu.utils.flatten import Flattener

    pre = ts.make_preprocess(cfg, *NORMALIZATION["cifar10"], cfg.img_size)
    tx = ts.make_optimizer(tcfg, steps)
    params_dict = vit.init_params(jax.random.PRNGKey(0), cfg)
    stacked = vit.stack_block_params(params_dict, cfg)
    flattener = Flattener(stacked)
    params = jax.device_put(jax.jit(flattener.flatten)(stacked), rep)
    opt = jax.device_put(tx.init(params), rep)
    # Production driver: K steps fused per dispatch on a flat vector of
    # depth-stacked params (the training loop's default on TPU). K divides
    # the step count, so the padded-step guard is off.
    k = ts.pick_steps_per_dispatch(steps)
    step_fn = ts.make_flat_train_multi_step(cfg, tcfg, mesh, tx, pre, k,
                                            flattener,
                                            apply_fn=vit.apply_stacked,
                                            guard_padded_steps=False,
                                            feed="ordered")
    epoch_idx = jax.device_put(
        ts.pad_epoch_indices(
            ts.epoch_indices(jax.random.PRNGKey(1), n, batch, True), k),
        idx_sh)
    total_steps = epoch_idx.shape[0]
    # Ordered feed (train/loop.py does this once per epoch; here the whole
    # run is one epoch): batches pre-gathered contiguously so each step in
    # the fused scan fetches with ONE dynamic slice instead of a per-row
    # DMA chain (17% of device time in the r5 pre-trace,
    # docs/logs/r5_profile_stretch_pre.json).
    data_x, data_y = jax.jit(ts.epoch_order_data,
                             out_shardings=(rep, rep))(data_x, data_y,
                                                       epoch_idx)

    params, opt, m = step_fn(params, opt, jnp.asarray([0], jnp.int32),
                             data_x, data_y, epoch_idx)  # warmup/compile
    m.block_until_ready()
    starts = [s for s in range(0, total_steps, k)]
    n_dispatch = max(2, (steps - 1) // k)  # ≥ 2 timed dispatches
    prof_dir = os.environ.get("BENCH_PROFILE_DIR")
    if prof_dir:  # device-trace capture around the TIMED dispatches only
        jax.profiler.start_trace(prof_dir)
    t0 = time.perf_counter()
    measured = 0
    for i in range(n_dispatch):
        s = starts[(i + 1) % len(starts)]
        params, opt, m = step_fn(params, opt, jnp.asarray([s], jnp.int32),
                                 data_x, data_y, epoch_idx)
        measured += k
    m.block_until_ready()
    dt = time.perf_counter() - t0
    if prof_dir:
        jax.profiler.stop_trace()
    assert measured > 0 and np.isfinite(np.asarray(m)).all(), "bad metrics"
    ips = batch * measured / dt
    flops_per_step = train_step_flops(cfg, batch)
    tflops = flops_per_step * (measured / dt) / 1e12  # steps/sec × FLOPs/step
    return dict(images_per_sec=ips,
                step_ms=1e3 * dt / measured,
                tflops_per_sec=tflops,
                mfu=tflops / PEAK_BF16_TFLOPS)


STRETCH_KW = dict(pos_encoding="rope-mixed", img_size=224, patch_size=16,
                  embed_dim=384, depth=12, steps=20, batch=64)


def _baseline(path, key):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f).get(key)
    return None


def _result_line(metric: str, r: dict, base) -> dict:
    return {
        "metric": metric,
        "value": round(r["images_per_sec"], 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(r["images_per_sec"] / base, 1) if base else None,
        "tflops_per_sec": round(r["tflops_per_sec"], 2),
        "mfu": round(r["mfu"], 4),
    }


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    baseline_path = os.path.join(here, "BASELINE_MEASURED.json")
    baseline = _baseline(baseline_path, "pytorch_cpu_images_per_sec")

    if "--matrix" in sys.argv:
        # Utilization matrix: dtype × remat × config. Writes
        # docs/bench_matrix.json and prints one row per line (NOT the
        # driver's one-line contract — use plain `python bench.py` for that).
        rows = []
        for name, kw in (("headline", {}), ("stretch", STRETCH_KW)):
            for dtype in ("float32", "bfloat16"):
                for remat in (("off", "full", "dots", "softmax")
                              if name == "stretch" else ("off",)):
                    r = measure(compute_dtype=dtype, remat=remat != "off",
                                remat_policy=remat if remat != "off"
                                else "full", **kw)
                    row = dict(config=name, compute_dtype=dtype, remat=remat,
                               **{k_: round(v, 4) for k_, v in r.items()})
                    rows.append(row)
                    print(json.dumps(row))
        with open(os.path.join(here, "docs", "bench_matrix.json"), "w") as f:
            json.dump(rows, f, indent=1)
        return

    stretch_base = _baseline(baseline_path,
                             "pytorch_cpu_images_per_sec_stretch")
    if "--stretch" in sys.argv:
        # BASELINE.json config 5: ViT-S/16 @ 224px (197 tokens), rope-mixed.
        result = _result_line(
            "ViT-S/16 @224 rope-mixed images/sec/chip "
            "(train fwd+bwd+update, bs64)",
            measure(**STRETCH_KW), stretch_base)
    else:
        result = _result_line(
            "CIFAR-10 ViT-tiny/4 rope-axial images/sec/chip "
            "(train fwd+bwd+update, bs128)",
            measure(), baseline)
        # The headline config is bandwidth-bound by shape (AI ≤ 14 FLOP/byte
        # vs the ~240 ridge — ROADMAP.md roofline), so its MFU under-sells
        # the build. Report the MXU-bound stretch config (ViT-S/16 @224
        # bf16, no remat — the measured-best knob setting, ROADMAP round-3
        # closure) in the same line so BENCH_r*.json carries both regimes.
        try:
            result["stretch"] = _result_line(
                "ViT-S/16 @224 rope-mixed bf16 images/sec/chip "
                "(train fwd+bwd+update, bs64)",
                measure(compute_dtype="bfloat16", **STRETCH_KW),
                stretch_base)
        except Exception as e:  # the headline number must survive regardless
            result["stretch"] = {"error": repr(e)[:200]}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
