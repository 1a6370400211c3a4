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


def make_infer_fn(cfg: ViTConfig, mean, std, native_size: int):
    """(params, images uint8 [B, native, native, C]) -> logits [B, classes].

    Bakes the eval preprocessing (normalize + resize to cfg.img_size) in
    front of the forward, so the serving input contract is raw dataset-format
    pixels — the same tensors the training data pipeline stages."""
    preprocess = ts.make_preprocess(cfg, mean, std, native_size)

    def infer(params, images_u8):
        return vit.apply(params, preprocess(images_u8), cfg)

    return infer


def export_model(params, cfg: ViTConfig, mean, std, native_size: int,
                 batch: int | None = None,
                 platforms=("tpu", "cpu")) -> jax_export.Exported:
    """AOT-lower inference to a multi-platform Exported with params embedded
    as constants. batch=None exports a symbolic batch dimension ("b") —
    callable at ANY batch size; an int pins a static batch (marginally
    faster launches, fixed shape)."""
    infer = make_infer_fn(cfg, mean, std, native_size)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    fn = jax.jit(lambda images: infer(params, images))
    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = int(batch)
    spec = jax.ShapeDtypeStruct((b, native_size, native_size, cfg.in_chans),
                                jnp.uint8)
    return jax_export.export(fn, platforms=tuple(platforms))(spec)


def save_artifact(path: str, exported: jax_export.Exported) -> str:
    if not path.endswith(ARTIFACT_SUFFIX):
        path = path + ARTIFACT_SUFFIX
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def load_artifact(path: str) -> jax_export.Exported:
    with open(path, "rb") as f:
        return jax_export.deserialize(bytearray(f.read()))


class Predictor:
    """Thin serving wrapper: jitted `call` on uint8 image batches.

    Built either from a live (params, cfg) pair or from a saved artifact
    (`Predictor.from_artifact`) — the latter needs no model code or params,
    only jax."""

    def __init__(self, call_fn, in_shape):
        self._call = jax.jit(call_fn)
        self.in_shape = in_shape  # (native, native, chans)

    @classmethod
    def from_params(cls, params, cfg: ViTConfig, mean, std, native_size: int):
        infer = make_infer_fn(cfg, mean, std, native_size)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        return cls(lambda x: infer(params, x),
                   (native_size, native_size, cfg.in_chans))

    @classmethod
    def from_artifact(cls, path: str):
        exported = load_artifact(path)
        (spec,) = exported.in_avals
        return cls(exported.call, tuple(int(d) if not jax_export.is_symbolic_dim(d)
                                        else -1 for d in spec.shape)[1:])

    def logits(self, images_u8) -> np.ndarray:
        images_u8 = np.asarray(images_u8)
        if images_u8.dtype != np.uint8:
            raise ValueError(f"expected uint8 images, got {images_u8.dtype}")
        if images_u8.ndim == 3:
            images_u8 = images_u8[None]
        return np.asarray(self._call(images_u8))

    def predict(self, images_u8) -> np.ndarray:
        """-> int class ids [B]."""
        return np.argmax(self.logits(images_u8), axis=-1)
