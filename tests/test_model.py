"""Full-model cross-framework golden tests: the JAX model fed the reference
model's exact weights must reproduce its logits for all 6 PE modes
(SURVEY.md §4.3), plus init/shape sanity checks."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_rpe_rope_tpu.configs import ViTConfig
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.utils import checkpoint

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
PE_NAMES = ["none", "absolute", "relative", "polynomial", "rope-axial",
            "rope-mixed"]


def make_cfg(pe_name, **kw):
    defaults = dict(
        img_size=32, patch_size=4, in_chans=3, num_classes=10, embed_dim=192,
        depth=6, num_heads=6, pos_encoding=pe_name, rope_theta=100.0,
        poly_degree=3, poly_shared_heads=True, attention_impl="reference",
    )
    defaults.update(kw)
    return ViTConfig(**defaults)


@pytest.mark.parametrize("pe_name", PE_NAMES)
def test_forward_matches_reference_pytorch(pe_name):
    fname = os.path.join(
        GOLDEN_DIR, f"model_golden_{pe_name.replace('-', '_')}.npz")
    state = checkpoint.load_state(fname)
    images = state.pop("__images")  # [B, C, H, W] torch layout
    ref_logits = state.pop("__logits")
    # rope-mixed parity requires the reference's Q1 scramble semantics.
    cfg = make_cfg(pe_name, rope_mixed_compat_scramble=(pe_name == "rope-mixed"))
    params, _ = checkpoint.split_state(state, vit.buffers(cfg).keys())
    images_nhwc = jnp.asarray(np.transpose(images, (0, 2, 3, 1)))
    logits = jax.jit(vit.apply, static_argnums=2)(params, images_nhwc, cfg)
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("pe_name", PE_NAMES)
def test_init_shapes_match_reference_state_dict(pe_name):
    """Our init produces exactly the reference's key set and shapes (Q9)."""
    fname = os.path.join(
        GOLDEN_DIR, f"model_golden_{pe_name.replace('-', '_')}.npz")
    state = checkpoint.load_state(fname)
    ref_keys = {k: v.shape for k, v in state.items() if not k.startswith("__")}
    cfg = make_cfg(pe_name)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    ours = {k: tuple(v.shape) for k, v in params.items()}
    for k, v in vit.buffers(cfg).items():
        ours[k] = tuple(v.shape)
    # The reference duplicates shared-PE tensors per block (alias keys).
    for alias, canonical in vit.reference_alias_keys(cfg).items():
        ours[alias] = ours[canonical]
    assert ours == {k: tuple(s) for k, s in ref_keys.items()}


def test_init_statistics():
    cfg = make_cfg("absolute")
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    assert float(jnp.abs(params["cls_token"]).max()) == 0.0
    assert float(jnp.abs(params["blocks.0.attn.proj.bias"]).max()) == 0.0
    qkv_std = float(jnp.std(params["blocks.0.attn.qkv.weight"]))
    assert 0.015 < qkv_std < 0.025  # trunc_normal(0.02)
    ape_std = float(jnp.std(params["pos_embed.pos_embed"]))
    assert 0.015 < ape_std < 0.025
    # kaiming fan_out for conv: std = sqrt(2 / (192·4·4)) ≈ 0.0255
    conv_std = float(jnp.std(params["patch_embed.weight"]))
    assert 0.02 < conv_std < 0.032


def test_param_count_matches_reference():
    # Reference ViT-tiny (d192, depth 6, heads 6) with APE: embed conv
    # 3·192·16+192, 5000·192 APE table, 6 blocks, head. Just pin the total so
    # refactors can't silently change architecture.
    cfg = make_cfg("absolute")
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    n = vit.num_params(params)
    assert n == sum(v.size for v in params.values())
    # per-block: LN(2·192·2) + qkv(3·192·192) + proj(192·192+192)
    #            + fc1(768·192+768) + fc2(192·768+192)
    per_block = 2 * 2 * 192 + 3 * 192 * 192 + 192 * 192 + 192 \
        + 768 * 192 + 768 + 192 * 768 + 192
    expected = (1 * 1 * 192                      # cls
                + 192 * 3 * 4 * 4 + 192          # patch embed
                + 5000 * 192                     # APE
                + 6 * per_block
                + 2 * 192                        # final norm
                + 10 * 192 + 10)                 # head
    assert n == expected


def test_grad_flows_to_all_params():
    cfg = make_cfg("polynomial", in_chans=1)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))

    def loss_fn(p):
        return jnp.sum(vit.apply(p, x, cfg) ** 2)

    grads = jax.grad(loss_fn)(params)
    zero_grads = [k for k, g in grads.items()
                  if float(jnp.abs(g).max()) == 0.0 and k != "cls_token"]
    # cls_token gets gradient too (it feeds the head); nothing should be dead.
    assert float(jnp.abs(grads["cls_token"]).max()) > 0
    assert float(jnp.abs(grads["pos_embed.coefficients"]).max()) > 0
    assert zero_grads == []


def test_bf16_compute_close_to_fp32():
    cfg32 = make_cfg("rope-axial")
    cfg16 = make_cfg("rope-axial", compute_dtype="bfloat16")
    params = vit.init_params(jax.random.PRNGKey(0), cfg32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    l32 = vit.apply(params, x, cfg32)
    l16 = vit.apply(params, x, cfg16)
    np.testing.assert_allclose(np.asarray(l16), np.asarray(l32),
                               rtol=0.1, atol=0.15)


@pytest.mark.parametrize("pe_name", PE_NAMES)
def test_apply_stacked_matches_apply(pe_name):
    """Depth-stacked lax.scan forward must equal the unrolled forward."""
    cfg = make_cfg(pe_name, img_size=16, embed_dim=96, depth=3, num_heads=4,
                   in_chans=1)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 1))
    ref = vit.apply(params, x, cfg)
    stacked = vit.stack_block_params(params, cfg)
    out = vit.apply_stacked(stacked, x, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # round-trip
    back = vit.unstack_block_params(stacked, cfg)
    for k in params:
        np.testing.assert_array_equal(np.asarray(back[k]),
                                      np.asarray(params[k]))


@pytest.mark.parametrize("policy", ["full", "dots"])
def test_remat_same_values_and_grads(policy):
    """jax.checkpoint over blocks must not change outputs or gradients —
    for the full-recompute policy and the selective dots policy (save matmul
    outputs, recompute elementwise)."""
    base = make_cfg("rope-axial", img_size=16, embed_dim=96, depth=2,
                    num_heads=4, in_chans=1)
    remat = make_cfg("rope-axial", img_size=16, embed_dim=96, depth=2,
                     num_heads=4, in_chans=1, remat=True,
                     remat_policy=policy)
    params = vit.init_params(jax.random.PRNGKey(0), base)
    stacked = vit.stack_block_params(params, base)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))

    def loss(s, cfg):
        return jnp.sum(vit.apply_stacked(s, x, cfg) ** 2)

    np.testing.assert_allclose(
        np.asarray(vit.apply_stacked(stacked, x, remat)),
        np.asarray(vit.apply_stacked(stacked, x, base)),
        rtol=1e-5, atol=1e-6)
    g1 = jax.grad(lambda s: loss(s, base))(stacked)
    g2 = jax.grad(lambda s: loss(s, remat))(stacked)
    for k in g1:
        # remat re-fuses the backward; diffs are float-reduction noise
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                   rtol=1e-4, atol=5e-5, err_msg=k)


def test_auto_attention_impl_switches_at_streaming_threshold():
    """auto = XLA at reference shapes (measured faster), Pallas flash in the
    long-sequence streaming regime (measured faster AND avoids the [B,H,N,N]
    logits materialization)."""
    from vit_rpe_rope_tpu.models.vit import _attention_impl

    small = ViTConfig(img_size=32, patch_size=4, attention_impl="auto")
    assert _attention_impl(small) == "reference"
    big = ViTConfig(img_size=256, patch_size=4, attention_impl="auto")
    assert big.seq_len > 2048
    assert _attention_impl(big) == "flash"
