"""int8 serving-quantization tests: quantizer error bounds, q8_linear
numerics, whole-model agreement with the fp32 forward for every PE mode, and
the quantized Predictor/export path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_rpe_rope_tpu import quant, serving
from vit_rpe_rope_tpu.configs import ViTConfig
from vit_rpe_rope_tpu.data.datasets import NATIVE_SIZE, NORMALIZATION
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.train import train_step as ts

TINY = dict(img_size=8, patch_size=4, in_chans=1, embed_dim=32, depth=2,
            num_heads=2, attention_impl="reference")


def test_quantize_tensor_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.3, (16, 64)) *
                    rng.uniform(0.01, 3.0, (16, 1)))  # ragged channel scales
    w_q, scale = quant.quantize_tensor(w)
    assert w_q.dtype == jnp.int8 and scale.shape == (16,)
    err = np.abs(np.asarray(w) - np.asarray(w_q) * np.asarray(scale)[:, None])
    assert (err <= np.asarray(scale)[:, None] / 2 + 1e-7).all()


@pytest.mark.parametrize("linear", [quant.q8_linear, quant.q8_linear_wo])
def test_q8_linear_close_to_fp32(linear):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1.0, (4, 7, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (32, 64)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (32,)), jnp.float32)
    w_q, scale = quant.quantize_tensor(w)
    got = np.asarray(linear(x, w_q, scale, b))
    want = np.asarray(x @ w.T + b)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel


def test_q8_linear_static_close_to_fp32():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(0, 1.0, (4, 7, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (32, 64)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (32,)), jnp.float32)
    w_q, scale = quant.quantize_tensor(w)
    a_scale = jnp.max(jnp.abs(x)) / 127.0  # what calibration would produce
    got = np.asarray(quant.q8_linear_static(x, w_q, scale, a_scale, b))
    want = np.asarray(x @ w.T + b)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.03, rel


@pytest.mark.parametrize("mode", ["w8a8", "w8a8-static", "w8a16"])
@pytest.mark.parametrize("pe", ["none", "absolute", "relative", "polynomial",
                                "rope-axial", "rope-mixed"])
def test_apply_q8_matches_fp32_forward(pe, mode):
    cfg = ViTConfig(**TINY, pos_encoding=pe)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1.0, (8, 8, 8, 1)), jnp.float32)
    calib = x if mode == "w8a8-static" else None
    qparams = quant.quantize_params(params, cfg, calib_images=calib)
    # quantized keys replaced, the rest passed through
    assert "patch_embed.weight:q8" in qparams
    assert "blocks.0.attn.qkv.weight:scale" in qparams
    assert "norm.weight" in qparams and "patch_embed.weight" not in qparams
    if mode == "w8a8-static":
        assert "blocks.1.mlp.fc2.weight:act_scale" in qparams
        assert qparams["head.weight:act_scale"].shape == ()

    want = np.asarray(vit.apply(params, x, cfg))
    got = np.asarray(quant.apply_q8(qparams, x, cfg, mode=mode))
    rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-6)
    # w8a16 runs bf16 activations on top of the int8 weight grid; the
    # static mode's per-tensor grid is coarser than w8a8's per-token one.
    assert rel < (0.08 if mode != "w8a8" else 0.05), (pe, mode, rel)


def test_static_mode_requires_calibration():
    cfg = ViTConfig(**TINY, pos_encoding="none")
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_params(params, cfg)  # no calib_images
    with pytest.raises(ValueError, match="act_scale"):
        quant.apply_q8(qparams, jnp.zeros((1, 8, 8, 1)), cfg,
                       mode="w8a8-static")


def test_static_calibration_generalizes_off_calib_batch():
    """Scales calibrated on one batch must serve OTHER batches from the same
    distribution — the whole point of static quantization."""
    cfg = ViTConfig(**TINY, pos_encoding="rope-axial")
    params = vit.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(13)
    calib = jnp.asarray(rng.normal(0, 1.0, (8, 8, 8, 1)), jnp.float32)
    qparams = quant.quantize_params(params, cfg, calib_images=calib)
    x = jnp.asarray(rng.normal(0, 1.0, (8, 8, 8, 1)), jnp.float32)  # fresh
    want = np.asarray(vit.apply(params, x, cfg))
    got = np.asarray(quant.apply_q8(qparams, x, cfg, mode="w8a8-static"))
    rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-6)
    assert rel < 0.10, rel


def test_static_predictor_and_artifact(tmp_path):
    """w8a8-static through the serving layer: load_serving_state(calib),
    Predictor, and a CPU artifact that replays identically."""
    from vit_rpe_rope_tpu.utils import checkpoint

    cfg = ViTConfig(**TINY, pos_encoding="polynomial")
    params = vit.init_params(jax.random.PRNGKey(4), cfg)
    ckpt = checkpoint.save(str(tmp_path / "mnist_polynomial_best.npz"),
                           jax.device_get(params), vit.buffers(cfg),
                           aliases=vit.reference_alias_keys(cfg))
    native = NATIVE_SIZE["mnist"]
    rng = np.random.default_rng(17)
    calib_u8 = rng.integers(0, 256, (6, native, native, 1), dtype=np.uint8)
    images = rng.integers(0, 256, (6, native, native, 1), dtype=np.uint8)

    with pytest.raises(ValueError, match="w8a8-static"):
        serving.load_serving_state(ckpt, int8="w8a8-static", num_heads=2,
                                   grid_size=2)
    qparams, scfg, mean, std, nat, _ = serving.load_serving_state(
        ckpt, int8="w8a8-static", calib_images_u8=calib_u8, num_heads=2,
        grid_size=2)
    assert any(k.endswith(":act_scale") for k in qparams)

    fp = serving.Predictor.from_params(params, cfg, mean, std, native)
    q8s = serving.Predictor.from_params(qparams, scfg, mean, std, nat,
                                        int8="w8a8-static")
    lf, lq = fp.logits(images), q8s.logits(images)
    rel = np.linalg.norm(lq - lf) / max(np.linalg.norm(lf), 1e-6)
    assert rel < 0.08, rel

    exported = serving.export_model(qparams, scfg, mean, std, nat,
                                    platforms=("cpu",), int8="w8a8-static")
    path = serving.save_artifact(str(tmp_path / "q8s"), exported)
    served = serving.Predictor.from_artifact(path)
    np.testing.assert_allclose(served.logits(images), lq, rtol=1e-5,
                               atol=1e-5)


def test_apply_q8_rejects_unknown_mode():
    cfg = ViTConfig(**TINY, pos_encoding="none")
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_params(params, cfg)
    with pytest.raises(ValueError, match="unknown int8 mode"):
        quant.apply_q8(qparams, jnp.zeros((1, 8, 8, 1)), cfg, mode="w4a4")


def test_int8_predictor_and_artifact(tmp_path):
    cfg = ViTConfig(**TINY, pos_encoding="rope-axial")
    params = vit.init_params(jax.random.PRNGKey(1), cfg)
    mean, std = NORMALIZATION["mnist"]
    native = NATIVE_SIZE["mnist"]
    rng = np.random.default_rng(3)
    images = rng.integers(0, 256, (6, native, native, 1), dtype=np.uint8)

    fp = serving.Predictor.from_params(params, cfg, mean, std, native)
    q8 = serving.Predictor.from_params(params, cfg, mean, std, native,
                                       int8=True)
    lf, lq = fp.logits(images), q8.logits(images)
    rel = np.linalg.norm(lq - lf) / max(np.linalg.norm(lf), 1e-6)
    assert rel < 0.05, rel

    exported = serving.export_model(params, cfg, mean, std, native,
                                    platforms=("cpu",), int8=True)
    path = serving.save_artifact(str(tmp_path / "q8"), exported)
    served = serving.Predictor.from_artifact(path)
    np.testing.assert_allclose(served.logits(images), lq, rtol=1e-5,
                               atol=1e-5)


def test_predict_cli_int8(tmp_path, capsys):
    from vit_rpe_rope_tpu.cli import predict as predict_cli
    from vit_rpe_rope_tpu.utils import checkpoint

    cfg = ViTConfig(**TINY, pos_encoding="polynomial")
    params = vit.init_params(jax.random.PRNGKey(2), cfg)
    ckpt = checkpoint.save(str(tmp_path / "mnist_polynomial_best.npz"),
                           jax.device_get(params), vit.buffers(cfg),
                           aliases=vit.reference_alias_keys(cfg))
    mean, std = NORMALIZATION["mnist"]
    native = NATIVE_SIZE["mnist"]
    rng = np.random.default_rng(5)
    images = rng.integers(0, 256, (5, native, native, 1), dtype=np.uint8)
    inp = str(tmp_path / "in.npz")
    np.savez(inp, images=images)
    art = str(tmp_path / "q8.stablehlo")
    preds = predict_cli.main([ckpt, "--input", inp, "--export", art,
                              "--int8", "--grid_size", "2",
                              "--num_heads", "2"])
    q8 = serving.Predictor.from_params(params, cfg, mean, std, native,
                                       int8=True)
    np.testing.assert_array_equal(preds, q8.predict(images))
    served = serving.Predictor.from_artifact(art)
    np.testing.assert_array_equal(np.argmax(served.logits(images), -1), preds)


def test_int8_agreement_on_trained_model():
    """Quantization must preserve the DECISIONS of a model that has actually
    learned something — train briefly on the synthetic task, then compare
    top-1 between fp32 and int8 paths."""
    from vit_rpe_rope_tpu.configs import TrainConfig
    from vit_rpe_rope_tpu.data import datasets
    from vit_rpe_rope_tpu.parallel.mesh import (
        DATA_AXIS, NamedSharding, P, make_mesh)

    cfg = ViTConfig(**TINY, pos_encoding="rope-axial")
    tcfg = TrainConfig(dataset="mnist", batch_size=32, epochs=1)
    bundle = datasets.get_dataset("mnist", use_synthetic=True, seed=0)
    mesh = make_mesh(batch_size=32)
    rep = NamedSharding(mesh, P())
    pre = ts.make_preprocess(cfg, bundle.mean, bundle.std,
                             bundle.train_x.shape[1])
    tx = ts.make_optimizer(tcfg, steps_per_epoch=20)
    params = jax.device_put(vit.init_params(jax.random.PRNGKey(0), cfg), rep)
    opt = jax.device_put(tx.init(params), rep)
    step = ts.make_train_step(cfg, tcfg, mesh, tx, pre)
    idx = jax.device_put(
        ts.epoch_indices(jax.random.PRNGKey(1), len(bundle.train_y), 32, True),
        NamedSharding(mesh, P(None, DATA_AXIS)))
    data_x = jax.device_put(bundle.train_x, rep)
    data_y = jax.device_put(bundle.train_y, rep)
    for s in range(20):
        params, opt, _ = step(params, opt, jnp.asarray([s], jnp.int32),
                              data_x, data_y, idx)

    native = bundle.train_x.shape[1]
    fp = serving.Predictor.from_params(params, cfg, bundle.mean, bundle.std,
                                       native)
    q8 = serving.Predictor.from_params(params, cfg, bundle.mean, bundle.std,
                                       native, int8=True)
    test_images = bundle.test_x[:128]
    agree = (fp.predict(test_images) == q8.predict(test_images)).mean()
    assert agree >= 0.95, agree


@pytest.mark.parametrize("pe", ["polynomial", "relative"])
def test_apply_q8_streaming_generated_bias_marker(monkeypatch, pe):
    """int8 serving of a bias-mode PE above the (patched-down) streaming
    threshold must route through the in-kernel-generated bias marker — the
    quantized twin of vit's _logits_bias dispatch — and stay close to the
    fp32 forward."""
    from vit_rpe_rope_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "STREAMING_THRESHOLD", 128)
    cfg = ViTConfig(img_size=48, patch_size=4, in_chans=1, embed_dim=32,
                    depth=2, num_heads=2, pos_encoding=pe,
                    attention_impl="flash")  # grid 12 -> N=145 > 128
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_params(params, cfg)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1.0, (4, 48, 48, 1)), jnp.float32)
    want = np.asarray(vit.apply(params, x, cfg))
    got = np.asarray(quant.apply_q8(qparams, x, cfg))
    rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-6)
    assert rel < 0.05, rel
