"""AOT serving tests: architecture inference from checkpoint shapes, the
Predictor wrapper, StableHLO export round-trips (batch-polymorphic), and the
predict CLI end to end."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from vit_rpe_rope_tpu import serving
from vit_rpe_rope_tpu.cli import predict as predict_cli
from vit_rpe_rope_tpu.configs import ViTConfig
from vit_rpe_rope_tpu.data.datasets import NATIVE_SIZE, NORMALIZATION
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.train import train_step as ts
from vit_rpe_rope_tpu.utils import checkpoint
from vit_rpe_rope_tpu.viz import introspect

TINY = dict(img_size=8, patch_size=4, in_chans=1, embed_dim=16, depth=2,
            num_heads=2, attention_impl="reference")


def _save_tiny(tmp_path, name, **over):
    cfg = ViTConfig(**{**TINY, **over})
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    path = checkpoint.save(str(tmp_path / name), jax.device_get(params),
                           vit.buffers(cfg),
                           aliases=vit.reference_alias_keys(cfg))
    return cfg, params, path


@pytest.mark.parametrize("pe", ["none", "absolute", "relative", "polynomial",
                                "rope-axial", "rope-mixed"])
def test_infer_vit_config_roundtrip(tmp_path, pe):
    over = dict(pos_encoding=pe)
    if pe == "rope-axial":
        over["rope_theta"] = 37.0  # recovered from the inv_freq buffer
    if pe == "polynomial":
        over["poly_shared_heads"] = False  # per-head pins num_heads
        over["poly_degree"] = 2
    cfg, _, path = _save_tiny(tmp_path, f"mnist_{pe}_best.npz", **over)
    state = checkpoint.load_state(path)
    got = introspect.infer_vit_config(state, path=path, num_heads=2,
                                      grid_size=2)
    for field in ("img_size", "patch_size", "in_chans", "embed_dim", "depth",
                  "num_heads", "pos_encoding", "num_classes"):
        assert getattr(got, field) == getattr(cfg, field), field
    if pe == "rope-axial":
        assert got.rope_theta == pytest.approx(37.0, rel=1e-5)
    if pe == "polynomial":
        assert got.poly_degree == 2 and not got.poly_shared_heads


def test_infer_vit_config_pins_from_shapes_not_fallbacks(tmp_path):
    # relative's table pins BOTH num_heads and the grid: wrong fallbacks
    # must not matter.
    cfg, _, path = _save_tiny(tmp_path, "m_relative_best.npz",
                              pos_encoding="relative")
    got = introspect.infer_vit_config(checkpoint.load_state(path), path=path,
                                      num_heads=5, grid_size=7)
    assert got.num_heads == cfg.num_heads
    assert got.img_size == cfg.img_size


def test_infer_vit_config_cifar10_filename_quirk(tmp_path):
    # 'cifar10' in the filename implies grid 8 when nothing pins the grid
    # (the reference tools' behavior) — but an EXPLICIT grid_size wins.
    _, _, path = _save_tiny(tmp_path, "cifar10_absolute_best.npz",
                            pos_encoding="absolute")
    state = checkpoint.load_state(path)
    got = introspect.infer_vit_config(state, path=path, num_heads=2)
    assert got.img_size == 8 * 4  # filename quirk
    got = introspect.infer_vit_config(state, path=path, num_heads=2,
                                      grid_size=2)
    assert got.img_size == 2 * 4  # explicit flag beats the filename


def _mnist_contract(cfg):
    mean, std = NORMALIZATION["mnist"]
    return mean, std, NATIVE_SIZE["mnist"]


def test_predictor_matches_apply():
    cfg = ViTConfig(**TINY, pos_encoding="rope-axial")
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    mean, std, native = _mnist_contract(cfg)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (5, native, native, 1), dtype=np.uint8)

    pred = serving.Predictor.from_params(params, cfg, mean, std, native)
    got = pred.logits(images)
    want = vit.apply(params, ts.make_preprocess(cfg, mean, std, native)(
        images), cfg)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)
    assert pred.predict(images).shape == (5,)
    # single unbatched image gets a batch dim
    assert pred.predict(images[0]).shape == (1,)
    with pytest.raises(ValueError, match="uint8"):
        pred.logits(images.astype(np.float32))


def test_export_roundtrip_batch_polymorphic(tmp_path):
    cfg = ViTConfig(**TINY, pos_encoding="polynomial")
    params = vit.init_params(jax.random.PRNGKey(1), cfg)
    mean, std, native = _mnist_contract(cfg)
    exported = serving.export_model(params, cfg, mean, std, native,
                                    platforms=("cpu",))
    path = serving.save_artifact(str(tmp_path / "m"), exported)
    assert path.endswith(serving.ARTIFACT_SUFFIX)

    served = serving.Predictor.from_artifact(path)
    live = serving.Predictor.from_params(params, cfg, mean, std, native)
    rng = np.random.default_rng(1)
    for batch in (1, 3, 8):  # one export, any batch size
        images = rng.integers(0, 256, (batch, native, native, 1),
                              dtype=np.uint8)
        np.testing.assert_allclose(served.logits(images),
                                   live.logits(images), rtol=1e-5, atol=1e-5)


def test_data_parallel_predictor_matches_single_device():
    from vit_rpe_rope_tpu.parallel.mesh import make_mesh

    cfg = ViTConfig(**TINY, pos_encoding="rope-mixed")
    params = vit.init_params(jax.random.PRNGKey(3), cfg)
    mean, std, native = _mnist_contract(cfg)
    mesh = make_mesh()  # all 8 virtual CPU devices on the data axis
    assert mesh.devices.size == 8
    dp = serving.Predictor.from_params(params, cfg, mean, std, native,
                                       mesh=mesh)
    single = serving.Predictor.from_params(params, cfg, mean, std, native)
    rng = np.random.default_rng(4)
    for batch in (16, 5):  # divisible and ragged (padded to the shard count)
        images = rng.integers(0, 256, (batch, native, native, 1),
                              dtype=np.uint8)
        np.testing.assert_allclose(dp.logits(images), single.logits(images),
                                   rtol=1e-5, atol=1e-5)


def test_sharded_export_replay_matches_single_device(tmp_path):
    """Round-3 (VERDICT #9): jax.export with shardings — the artifact
    partitions the batch over the mesh's 'data' axis, records the device
    count, and replays on the 8-CPU mesh matching the single-device
    predictor (ragged batches padded up to Exported.nr_devices)."""
    from vit_rpe_rope_tpu.parallel.mesh import make_mesh

    cfg = ViTConfig(**TINY, pos_encoding="relative")
    params = vit.init_params(jax.random.PRNGKey(5), cfg)
    mean, std, native = _mnist_contract(cfg)
    mesh = make_mesh()  # all 8 virtual CPU devices on the data axis
    assert mesh.devices.size == 8
    exported = serving.export_model(params, cfg, mean, std, native,
                                    platforms=("cpu",), mesh=mesh)
    assert exported.nr_devices == 8
    path = serving.save_artifact(str(tmp_path / "sharded"), exported)

    served = serving.Predictor.from_artifact(path)
    assert served._pad_to == 8
    single = serving.Predictor.from_params(params, cfg, mean, std, native)
    rng = np.random.default_rng(6)
    for batch in (16, 5):  # divisible and ragged
        images = rng.integers(0, 256, (batch, native, native, 1),
                              dtype=np.uint8)
        np.testing.assert_allclose(served.logits(images),
                                   single.logits(images),
                                   rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError, match="must divide"):
        serving.export_model(params, cfg, mean, std, native,
                             platforms=("cpu",), mesh=mesh, batch=12)


def test_predict_cli_end_to_end(tmp_path, capsys):
    cfg, params, ckpt = _save_tiny(tmp_path, "mnist_rope-axial_best.npz",
                                   pos_encoding="rope-axial")
    mean, std, native = _mnist_contract(cfg)
    rng = np.random.default_rng(2)
    images = rng.integers(0, 256, (6, native, native, 1), dtype=np.uint8)
    live = serving.Predictor.from_params(params, cfg, mean, std, native)
    labels = live.predict(images)
    inp = str(tmp_path / "batch.npz")
    np.savez(inp, images=images, labels=labels)

    art = str(tmp_path / "model.stablehlo")
    preds = predict_cli.main([ckpt, "--input", inp, "--export", art,
                              "--grid_size", "2", "--batch_size", "4"])
    out = capsys.readouterr().out
    np.testing.assert_array_equal(preds, labels)
    assert "accuracy: 100.00%" in out
    assert os.path.exists(art)

    # Serve from the artifact alone (no checkpoint path).
    preds2 = predict_cli.main(["--artifact", art, "--input", inp])
    np.testing.assert_array_equal(preds2, labels)


def test_predict_cli_serves_reference_pth(tmp_path):
    """A torch-format .pth (the reference's checkpoint container) drops
    straight into the serving CLI — same predictions as the .npz."""
    pytest.importorskip("torch")
    cfg, params, ckpt = _save_tiny(tmp_path, "mnist_relative_best.npz",
                                   pos_encoding="relative")
    pth = checkpoint.export_torch(ckpt)
    mean, std, native = _mnist_contract(cfg)
    rng = np.random.default_rng(6)
    images = rng.integers(0, 256, (4, native, native, 1), dtype=np.uint8)
    inp = str(tmp_path / "in.npz")
    np.savez(inp, images=images)
    want = serving.Predictor.from_params(params, cfg, mean, std,
                                         native).predict(images)
    got = predict_cli.main([pth, "--input", inp])
    np.testing.assert_array_equal(got, want)


def test_predict_cli_requires_source():
    with pytest.raises(SystemExit):
        predict_cli.main(["--input", "x.npz"])


def test_predict_cli_rejects_artifact_conflicts(tmp_path):
    # --artifact is a finished program: combining it with a checkpoint,
    # --export, or --int8 is an error, not a silent no-op.
    for extra in (["ckpt.npz"], ["--export", "out.stablehlo"], ["--int8"]):
        with pytest.raises(SystemExit):
            predict_cli.main(["--artifact", "m.stablehlo", *extra])
