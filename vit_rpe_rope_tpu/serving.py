"""AOT inference export: package a trained model as a self-contained,
batch-polymorphic StableHLO artifact (jax.export) and run it back without
the model code.

The reference has no deployment story beyond `torch.load` + eager forward
(/root/reference/pe_similarity_visualizer.py:101-178 is its only inference
path); the TPU-native equivalent is ahead-of-time lowering: the full
pipeline — uint8 decode, normalize, resize, ViT forward — is traced ONCE,
with the trained params baked in as constants, serialized to portable
StableHLO bytes, and replayed on any supported platform (tpu/cpu) via
`jax.export.deserialize(...).call`. The artifact has a symbolic batch
dimension, so one export serves any batch size.

CLI: `python -m vit_rpe_rope_tpu.cli.predict` (classify / export / serve).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from vit_rpe_rope_tpu.configs import ViTConfig
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.train import train_step as ts

ARTIFACT_SUFFIX = ".stablehlo"


def _is_quantized_state(params: dict) -> bool:
    """True when `params` is already quant.quantize_params output — lets
    callers pre-quantize once and share across Predictor + export_model."""
    return any(k.endswith(":q8") for k in params)


def _int8_mode(int8) -> str | None:
    """Normalize the int8 option: False -> None, True -> "w8a8" (the
    original behavior), or an explicit mode string ("w8a8" /
    "w8a8-static" / "w8a16")."""
    if not int8:
        return None
    return "w8a8" if int8 is True else str(int8)


def make_infer_fn(cfg: ViTConfig, mean, std, native_size: int,
                  int8=False):
    """(params, images uint8 [B, native, native, C]) -> logits [B, classes].

    Bakes the eval preprocessing (normalize + resize to cfg.img_size) in
    front of the forward, so the serving input contract is raw dataset-format
    pixels — the same tensors the training data pipeline stages.

    int8: truthy values expect quant.quantize_params output; True/"w8a8"
    runs the int8-MXU W8A8 forward, "w8a16" the weight-only bf16 forward
    (both over the same artifacts — see quant.py)."""
    preprocess = ts.make_preprocess(cfg, mean, std, native_size)
    mode = _int8_mode(int8)

    def infer(params, images_u8):
        x = preprocess(images_u8)
        if mode is not None:
            from vit_rpe_rope_tpu import quant

            return quant.apply_q8(params, x, cfg, mode=mode)
        return vit.apply(params, x, cfg)

    return infer


def export_model(params, cfg: ViTConfig, mean, std, native_size: int,
                 batch: int | None = None, platforms=("tpu", "cpu"),
                 int8=False, mesh=None) -> jax_export.Exported:
    """AOT-lower inference to a multi-platform Exported with params embedded
    as constants. batch=None exports a symbolic batch dimension ("b") —
    callable at ANY batch size; an int pins a static batch (marginally
    faster launches, fixed shape). int8=True quantizes (quant.py) before
    lowering — the artifact carries int8 weights.

    mesh: export a SHARDED computation for multi-chip batch serving — the
    batch dimension is partitioned over the mesh's 'data' axis (params ride
    replicated), and the artifact records the shardings + device count
    (Exported.nr_devices). Replay needs the same number of devices but no
    model code, exactly like the single-device artifact; the symbolic batch
    becomes "<n_data>*b" so every callable batch divides the axis
    (Predictor pads ragged batches up to Exported.nr_devices). Sharded
    exports are single-platform (jax.export limitation) — the first entry
    of `platforms` wins."""
    if int8 and not _is_quantized_state(params):
        from vit_rpe_rope_tpu import quant

        params = quant.quantize_params(params, cfg)
    infer = make_infer_fn(cfg, mean, std, native_size, int8=int8)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    if mesh is None:
        fn = jax.jit(lambda images: infer(params, images))
        if batch is None:
            (b,) = jax_export.symbolic_shape("b")
        else:
            b = int(batch)
        spec = jax.ShapeDtypeStruct(
            (b, native_size, native_size, cfg.in_chans), jnp.uint8)
        return jax_export.export(fn, platforms=tuple(platforms))(spec)

    from jax.sharding import Mesh

    from vit_rpe_rope_tpu.parallel.mesh import DATA_AXIS, NamedSharding, P

    # Normalize to a FLAT ('data',) mesh over all the given mesh's devices:
    # the artifact's recorded AbstractMesh is then reconstructible at replay
    # from nothing but nr_devices (Predictor.from_artifact builds the same
    # shape), and every chip serves batch shards.
    mesh = Mesh(mesh.devices.reshape(-1), (DATA_AXIS,))
    n_data = mesh.devices.size
    rep = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    params = jax.device_put(params, rep)
    fn = jax.jit(lambda images: infer(params, images),
                 in_shardings=batch_sh, out_shardings=batch_sh)
    if batch is None:
        (b,) = jax_export.symbolic_shape(f"{n_data}*b")
    else:
        if batch % n_data:
            raise ValueError(
                f"static batch {batch} must divide the {n_data}-way data "
                f"axis")
        b = int(batch)
    spec = jax.ShapeDtypeStruct((b, native_size, native_size, cfg.in_chans),
                                jnp.uint8)
    return jax_export.export(fn, platforms=(platforms[0],))(spec)


def save_artifact(path: str, exported: jax_export.Exported) -> str:
    if not path.endswith(ARTIFACT_SUFFIX):
        path = path + ARTIFACT_SUFFIX
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def load_artifact(path: str) -> jax_export.Exported:
    with open(path, "rb") as f:
        return jax_export.deserialize(bytearray(f.read()))


def load_serving_state(checkpoint_path: str, dataset: str = "auto",
                       num_heads: int = 6, grid_size: int | None = None,
                       rope_mixed_compat_scramble: bool = False,
                       int8=False, calib_images_u8=None):
    """Checkpoint (.npz ours / .pth reference) -> (params, cfg, mean, std,
    native_size, dataset): everything needed to build a Predictor or export
    an artifact. Architecture is reconstructed from the checkpoint's shapes
    (viz.introspect.infer_vit_config); dataset="auto" picks the
    normalization contract by channel count (1=mnist, 3=cifar10); int8=True
    returns quantized params (quant.quantize_params).

    calib_images_u8: uint8 [B, native, native, C] batch for int8
    "w8a8-static" — preprocessed here with the same normalize/resize the
    serving path applies, then fed to quant.calibrate_act_scales (the
    activation statistics must be taken on serving-identical inputs)."""
    import dataclasses

    from vit_rpe_rope_tpu.data.datasets import NATIVE_SIZE, NORMALIZATION
    from vit_rpe_rope_tpu.utils import checkpoint
    from vit_rpe_rope_tpu.viz import introspect

    state = checkpoint.load_state(checkpoint_path)
    cfg = introspect.infer_vit_config(state, path=checkpoint_path,
                                      num_heads=num_heads,
                                      grid_size=grid_size)
    if rope_mixed_compat_scramble:
        cfg = dataclasses.replace(cfg, rope_mixed_compat_scramble=True)
    if dataset == "auto":
        dataset = "mnist" if cfg.in_chans == 1 else "cifar10"
    mean, std = NORMALIZATION[dataset]
    native = NATIVE_SIZE[dataset]
    params, _ = checkpoint.split_state(state, vit.buffers(cfg))
    if int8:
        from vit_rpe_rope_tpu import quant

        calib = None
        mode = _int8_mode(int8)
        if mode == "w8a8-static":
            if calib_images_u8 is None:
                raise ValueError(
                    "int8 mode 'w8a8-static' needs calibration images "
                    "(calib_images_u8= / --calib): per-tensor activation "
                    "scales are measured offline")
            import numpy as _np

            calib_u8 = _np.asarray(calib_images_u8)
            if calib_u8.ndim == 3:
                calib_u8 = calib_u8[None]
            pre = ts.make_preprocess(cfg, mean, std, native)
            calib = pre(jnp.asarray(calib_u8))
        params = quant.quantize_params(params, cfg, calib_images=calib)
    return params, cfg, mean, std, native, dataset


class Predictor:
    """Thin serving wrapper: jitted `call` on uint8 image batches.

    Built either from a live (params, cfg) pair or from a saved artifact
    (`Predictor.from_artifact`) — the latter needs no model code or params,
    only jax. Pass a mesh to `from_params` for data-parallel batch serving:
    params are replicated, the batch is sharded over the mesh's 'data' axis
    (XLA partitions the forward; ragged batches are padded up to the shard
    multiple and sliced back)."""

    def __init__(self, call_fn, in_shape, pad_to: int = 1):
        """call_fn: ready-to-call (images_u8) -> logits (already jitted /
        exported — NOT re-jitted here)."""
        self._call = call_fn
        self.in_shape = in_shape  # (native, native, chans)
        self._pad_to = pad_to

    @classmethod
    def from_params(cls, params, cfg: ViTConfig, mean, std, native_size: int,
                    mesh=None, int8=False):
        if int8 and not _is_quantized_state(params):
            from vit_rpe_rope_tpu import quant

            params = quant.quantize_params(params, cfg)
        infer = make_infer_fn(cfg, mean, std, native_size, int8=int8)
        # Params ride as jit ARGUMENTS (device-resident between calls), not
        # closure constants — constants would be re-embedded into the HLO
        # and round-tripped through the host on every trace.
        params = jax.tree_util.tree_map(jnp.asarray, params)
        in_shape = (native_size, native_size, cfg.in_chans)
        if mesh is None:
            jitted = jax.jit(infer)
            return cls(lambda x: jitted(params, x), in_shape)
        from vit_rpe_rope_tpu.parallel.mesh import (
            DATA_AXIS, NamedSharding, P)

        n_data = mesh.shape[DATA_AXIS]
        rep = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, P(DATA_AXIS))
        params = jax.device_put(params, rep)
        jitted = jax.jit(infer, in_shardings=(
            jax.tree_util.tree_map(lambda _: rep, params), batch_sh),
            out_shardings=batch_sh)
        return cls(lambda x: jitted(params, x), in_shape, pad_to=n_data)

    @classmethod
    def from_artifact(cls, path: str):
        exported = load_artifact(path)
        (spec,) = exported.in_avals
        if exported.nr_devices > 1:
            # Sharded artifact (export_model(mesh=...)): rebuild a mesh of
            # the recorded device count and replay under the artifact's own
            # shardings (in/out_shardings_jax); ragged batches pad up to
            # nr_devices so the symbolic "<n>*b" batch constraint always
            # holds (padding rows are sliced off the logits).
            devices = jax.devices()
            if len(devices) < exported.nr_devices:
                raise ValueError(
                    f"artifact was exported for {exported.nr_devices} "
                    f"devices; this process has {len(devices)}")
            from jax.sharding import Mesh

            # Mirror export_model's flat ('data',) mesh — the axis layout
            # the artifact's NamedShardings were recorded against.
            mesh = Mesh(np.array(devices[:exported.nr_devices]), ("data",))
            call = jax.jit(
                exported.call,
                in_shardings=exported.in_shardings_jax(mesh)[0],
                out_shardings=exported.out_shardings_jax(mesh)[0])
        else:
            call = jax.jit(exported.call)
        return cls(call,
                   tuple(int(d) if not jax_export.is_symbolic_dim(d)
                         else -1 for d in spec.shape)[1:],
                   pad_to=max(1, exported.nr_devices))

    def logits(self, images_u8) -> np.ndarray:
        images_u8 = np.asarray(images_u8)
        if images_u8.dtype != np.uint8:
            raise ValueError(f"expected uint8 images, got {images_u8.dtype}")
        if images_u8.ndim == 3:
            images_u8 = images_u8[None]
        n = images_u8.shape[0]
        pad = -n % self._pad_to
        if pad:
            images_u8 = np.concatenate(
                [images_u8, np.zeros((pad,) + images_u8.shape[1:], np.uint8)])
        return np.asarray(self._call(images_u8))[:n]

    def predict(self, images_u8) -> np.ndarray:
        """-> int class ids [B]."""
        return np.argmax(self.logits(images_u8), axis=-1)
