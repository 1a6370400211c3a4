"""Block-level custom_vjp experiment (ops/block_vjp.py): full-model forward
and gradient parity against the per-call-boundary paths for the bias-free PE
modes it scopes (none / rope-axial / rope-mixed incl. learnable-frequency
gradients), plus the fallback routing for out-of-scope configs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_rpe_rope_tpu.configs import ViTConfig
from vit_rpe_rope_tpu.models import vit

TINY = dict(img_size=16, patch_size=4, in_chans=3, embed_dim=32, depth=2,
            num_heads=2)


def _loss_fn(cfg):
    def loss(params, x, y):
        logits = vit.apply(params, x, cfg)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))
    return loss


def _rel(a, b):
    na = np.linalg.norm(np.asarray(a, np.float64).ravel())
    return np.linalg.norm(
        np.asarray(a, np.float64).ravel()
        - np.asarray(b, np.float64).ravel()) / max(na, 1e-12)


@pytest.mark.parametrize("pe", ["none", "rope-axial", "rope-mixed"])
def test_block_vjp_grad_parity_vs_flash(pe):
    """flash_block vs flash: identical attention kernels, so the only
    difference is the hand-written segment backward vs XLA autodiff —
    gradients must agree tightly for every param (incl. the learnable
    rope-mixed frequencies, which flow through the freqs_cis cotangent)."""
    cfg_b = ViTConfig(**TINY, pos_encoding=pe, attention_impl="flash_block")
    cfg_f = dataclasses.replace(cfg_b, attention_impl="flash")
    params = vit.init_params(jax.random.PRNGKey(0), cfg_b)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1.0, (4, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, (4,)), jnp.int32)

    lb, gb = jax.jit(jax.value_and_grad(_loss_fn(cfg_b)))(params, x, y)
    lf, gf = jax.jit(jax.value_and_grad(_loss_fn(cfg_f)))(params, x, y)
    assert np.allclose(float(lb), float(lf), rtol=2e-5), (lb, lf)
    for k in params:
        assert _rel(gf[k], gb[k]) < 2e-3, (k, _rel(gf[k], gb[k]))
    if pe == "rope-mixed":  # the learnable-freq grads must be nonzero
        assert float(jnp.abs(gb["pos_embed.freqs"]).sum()) > 0


@pytest.mark.parametrize("pe", ["rope-axial"])
def test_block_vjp_grad_parity_vs_reference(pe):
    """Looser cross-check against the unfused XLA oracle (bf16 in-kernel
    multiplies bound the agreement)."""
    cfg_b = ViTConfig(**TINY, pos_encoding=pe, attention_impl="flash_block")
    cfg_r = dataclasses.replace(cfg_b, attention_impl="reference")
    params = vit.init_params(jax.random.PRNGKey(1), cfg_b)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1.0, (4, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, (4,)), jnp.int32)
    lb, gb = jax.jit(jax.value_and_grad(_loss_fn(cfg_b)))(params, x, y)
    lr, gr = jax.jit(jax.value_and_grad(_loss_fn(cfg_r)))(params, x, y)
    assert np.allclose(float(lb), float(lr), rtol=5e-3)
    for k in params:
        assert _rel(gr[k], gb[k]) < 5e-2, (k, _rel(gr[k], gb[k]))


def test_block_vjp_bias_mode_falls_back():
    """Bias-mode PEs are out of the experiment's scope: flash_block must
    route to the regular flash path (same result, no error)."""
    cfg_b = ViTConfig(**TINY, pos_encoding="polynomial",
                      attention_impl="flash_block")
    cfg_f = dataclasses.replace(cfg_b, attention_impl="flash")
    params = vit.init_params(jax.random.PRNGKey(2), cfg_b)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1.0, (2, 16, 16, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(vit.apply(params, x, cfg_b)),
                               np.asarray(vit.apply(params, x, cfg_f)),
                               rtol=1e-5, atol=1e-5)


def test_block_vjp_matches_stacked_driver():
    """The fused train driver goes through apply_stacked — the flash_block
    routing must produce the same logits there too."""
    cfg = ViTConfig(**TINY, pos_encoding="rope-axial",
                    attention_impl="flash_block")
    params = vit.init_params(jax.random.PRNGKey(4), cfg)
    stacked = vit.stack_block_params(params, cfg)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(0, 1.0, (2, 16, 16, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(vit.apply_stacked(stacked, x, cfg)),
                               np.asarray(vit.apply(params, x, cfg)),
                               rtol=1e-5, atol=1e-5)
