"""Pallas fused-attention parity vs the jnp oracle, interpret-mode on CPU
(SURVEY.md §4.2): forward and gradients for every PE injection mode, both
reference shapes (N=65) and the ViT-S/16@224 stretch shape (N=197)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_rpe_rope_tpu.configs import ViTConfig
from vit_rpe_rope_tpu.ops import flash_attention as fa
from vit_rpe_rope_tpu.ops import reference_attention as ra
from vit_rpe_rope_tpu.pe import polynomial, relative, rope_axial, rope_mixed


def make_qkv(key, b, h, n, d):
    ks = jax.random.split(key, 3)
    shape = (b, h, n, d)
    return tuple(jax.random.normal(k, shape, jnp.float32) * 0.5 for k in ks)


def cfg_for(n_patches, heads, head_dim, pe, **kw):
    grid = int(np.sqrt(n_patches))
    assert grid * grid == n_patches
    return ViTConfig(img_size=grid * 4, patch_size=4,
                     embed_dim=heads * head_dim, num_heads=heads, depth=1,
                     pos_encoding=pe, **kw)


CASES = [
    # (n_tokens incl cls, heads, head_dim)
    (65, 6, 32),    # reference ViT-tiny/4 @ 32px
    (197, 6, 64),   # ViT-S/16 @ 224px stretch (BASELINE.json config 5)
]


@pytest.mark.parametrize("n,h,d", CASES)
def test_plain_matches_oracle(n, h, d):
    q, k, v = make_qkv(jax.random.PRNGKey(0), 2, h, n, d)
    scale = d ** -0.5
    out_ref = ra.attention(q, k, v, scale)
    out = fa.flash_attention_hp(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,h,d", CASES)
def test_bias_matches_oracle(n, h, d):
    cfg = cfg_for(n - 1, h, d, "relative")
    params = relative.init_params(jax.random.PRNGKey(1), cfg)
    bias = relative.attn_bias(params, cfg) * 5.0
    q, k, v = make_qkv(jax.random.PRNGKey(2), 2, h, n, d)
    scale = d ** -0.5
    out_ref = ra.attention(q, k, v, scale, bias=bias)
    out = fa.flash_attention_hp(q, k, v, scale, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,h,d", CASES)
@pytest.mark.parametrize("variant", ["axial", "mixed"])
def test_rope_matches_oracle(n, h, d, variant):
    cfg = cfg_for(n - 1, h, d, f"rope-{variant}")
    if variant == "axial":
        freqs = rope_axial.freqs_cis({}, cfg)
    else:
        params = rope_mixed.init_params(jax.random.PRNGKey(3), cfg)
        freqs = rope_mixed.freqs_cis(params, cfg)
    q, k, v = make_qkv(jax.random.PRNGKey(4), 2, h, n, d)
    scale = d ** -0.5
    out_ref = ra.attention(q, k, v, scale, freqs_cis=freqs)
    out = fa.flash_attention_hp(q, k, v, scale, freqs_cis=freqs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_cls_token_unrotated_in_kernel():
    """Row 0 of the kernel output must equal attention with NO rotation
    applied to the cls query when all keys equal (identity check via the
    identity cos/sin row)."""
    n, h, d = 17, 2, 8
    cfg = cfg_for(16, h, d, "rope-axial")
    freqs = rope_axial.freqs_cis({}, cfg)
    q, k, v = make_qkv(jax.random.PRNGKey(5), 1, h, n, d)
    out = fa.flash_attention_hp(q, k, v, d ** -0.5, freqs_cis=freqs)
    out_ref = ra.attention(q, k, v, d ** -0.5, freqs_cis=freqs)
    np.testing.assert_allclose(np.asarray(out[:, :, 0]),
                               np.asarray(out_ref[:, :, 0]),
                               rtol=1e-5, atol=1e-6)


def test_gradients_match_oracle_bias():
    n, h, d = 65, 3, 32
    cfg = cfg_for(64, h, d, "polynomial")
    params = polynomial.init_params(jax.random.PRNGKey(6), cfg)
    q, k, v = make_qkv(jax.random.PRNGKey(7), 2, h, n, d)
    scale = d ** -0.5

    def loss_flash(p, q, k, v):
        bias = polynomial.attn_bias(p, cfg)
        return jnp.sum(fa.flash_attention_hp(q, k, v, scale, bias=bias) ** 2)

    def loss_ref(p, q, k, v):
        bias = polynomial.attn_bias(p, cfg)
        return jnp.sum(ra.attention(q, k, v, scale, bias=bias) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(params, q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(params, q, k, v)
    np.testing.assert_allclose(
        np.asarray(gf[0]["pos_embed.coefficients"]),
        np.asarray(gr[0]["pos_embed.coefficients"]), rtol=1e-4, atol=1e-5)
    for a, b in zip(gf[1:], gr[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_gradients_match_oracle_rope_mixed():
    """Gradients must flow through the kernel to the learnable RoPE-Mixed
    frequencies."""
    n, h, d = 17, 2, 8
    cfg = cfg_for(16, h, d, "rope-mixed")
    params = rope_mixed.init_params(jax.random.PRNGKey(8), cfg)
    q, k, v = make_qkv(jax.random.PRNGKey(9), 1, h, n, d)
    scale = d ** -0.5

    def loss(p, use_flash):
        freqs = rope_mixed.freqs_cis(p, cfg)
        f = fa.flash_attention_hp if use_flash else ra.attention
        return jnp.sum(f(q, k, v, scale, freqs_cis=freqs) ** 2)

    gf = jax.grad(lambda p: loss(p, True))(params)
    gr = jax.grad(lambda p: loss(p, False))(params)
    g1, g2 = gf["pos_embed.freqs"], gr["pos_embed.freqs"]
    assert float(jnp.abs(g1).max()) > 0
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_full_model_flash_equals_reference_impl():
    """End-to-end: model forward with attention_impl flash vs reference."""
    from vit_rpe_rope_tpu.models import vit

    for pe in ["absolute", "relative", "rope-axial"]:
        cfg_r = ViTConfig(img_size=16, patch_size=4, in_chans=1, embed_dim=64,
                          depth=2, num_heads=4, pos_encoding=pe,
                          attention_impl="reference")
        cfg_f = ViTConfig(img_size=16, patch_size=4, in_chans=1, embed_dim=64,
                          depth=2, num_heads=4, pos_encoding=pe,
                          attention_impl="flash")
        params = vit.init_params(jax.random.PRNGKey(0), cfg_r)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))
        lr_ = vit.apply(params, x, cfg_r)
        lf = vit.apply(params, x, cfg_f)
        # Production kernel multiplies in bf16 → bf16-level tolerance.
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lr_),
                                   rtol=2e-2, atol=2e-2)


def test_default_precision_is_bf16_close():
    """The production kernel multiplies in bf16 (XLA's DEFAULT f32-matmul
    regime on TPU); outputs stay within bf16 tolerance of full f32."""
    q, k, v = make_qkv(jax.random.PRNGKey(10), 2, 4, 65, 32)
    hi = fa.flash_attention_hp(q, k, v, 32 ** -0.5)
    lo = fa.flash_attention(q, k, v, 32 ** -0.5)
    np.testing.assert_allclose(np.asarray(lo), np.asarray(hi),
                               rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("n", [600, 2100])
def test_streaming_kv_matches_oracle(n):
    """Online-softmax KV streaming (long sequences) must match the oracle;
    exercises multi-tile KV with a padded final tile."""
    b, h, d = 1, 2, 64
    q, k, v = make_qkv(jax.random.PRNGKey(11), b, h, n, d)
    scale = d ** -0.5
    out = fa._forward_streaming(q, k, v, scale, None, None, interpret=True,
                                mm_dtype=jnp.float32)
    ref = ra.attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_streaming_kv_with_rope_and_bias():
    n, h, d = 626, 2, 32  # 625 patches (25x25 grid) + cls
    cfg = cfg_for(625, h, d, "rope-axial")
    freqs = rope_axial.freqs_cis({}, cfg)
    q, k, v = make_qkv(jax.random.PRNGKey(12), 1, h, n, d)
    scale = d ** -0.5
    out = fa._forward_streaming(q, k, v, scale, None, freqs, interpret=True,
                                mm_dtype=jnp.float32)
    ref = ra.attention(q, k, v, scale, freqs_cis=freqs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # bias path
    bias = jax.random.normal(jax.random.PRNGKey(13), (h, n, n)) * 0.5
    out = fa._forward_streaming(q, k, v, scale, bias, None, interpret=True,
                                mm_dtype=jnp.float32)
    ref = ra.attention(q, k, v, scale, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("rope", [False, True])
def test_streaming_backward_matches_oracle(rope):
    """Streaming flash backward (recompute from logsumexp, tiled) must match
    the oracle's gradients — plain and fixed-frequency axial rope."""
    n, h, d = 626, 2, 32  # 25x25 grid + cls, multi-tile
    if rope:
        cfg = cfg_for(625, h, d, "rope-axial")
        freqs = rope_axial.freqs_cis({}, cfg)
    else:
        freqs = None
    q, k, v = make_qkv(jax.random.PRNGKey(20), 1, h, n, d)
    scale = d ** -0.5
    out = fa._forward_streaming(q, k, v, scale, None, freqs, interpret=True,
                                mm_dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(21), out.shape) * 0.1
    dq, dk, dv, _, _, _, _ = fa._bwd_streaming(scale, q, k, v, None, freqs, out, g,
                                         interpret=True,
                                         mm_dtype=jnp.float32)

    def oracle(q, k, v):
        return ra.attention(q, k, v, scale, freqs_cis=freqs)

    _, vjp = jax.vjp(oracle, q, k, v)
    dq_r, dk_r, dv_r = vjp(g)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r),
                               rtol=1e-4, atol=1e-5)


def test_long_sequence_custom_vjp_end_to_end():
    """Above the streaming threshold, grad(flash_attention) routes through
    the tiled backward and matches the oracle."""
    n, h, d = fa.STREAMING_THRESHOLD + 60, 1, 32
    q, k, v = make_qkv(jax.random.PRNGKey(22), 1, h, n, d)
    scale = d ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention_hp(q, k, v, scale) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(ra.attention(q, k, v, scale) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-4)


def test_streaming_backward_dbias_matches_oracle():
    """The in-kernel batch-accumulated dbias (VERDICT r1 #4): streaming
    backward with a bias tensor must match the oracle's bias gradient —
    no [B, H, Nq, Nk] materialization anywhere."""
    n, h, d, b = 626, 2, 32, 3
    q, k, v = make_qkv(jax.random.PRNGKey(30), b, h, n, d)
    bias = jax.random.normal(jax.random.PRNGKey(31), (h, n, n)) * 0.3
    scale = d ** -0.5
    out = fa._forward_streaming(q, k, v, scale, bias, None, interpret=True,
                                mm_dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(32), out.shape) * 0.1
    dq, dk, dv, dbias, dfreqs, _, _ = fa._bwd_streaming(
        scale, q, k, v, bias, None, out, g, interpret=True,
        mm_dtype=jnp.float32, want_dbias=True)
    assert dfreqs is None

    def oracle(q, k, v, bias):
        return ra.attention(q, k, v, scale, bias=bias)

    _, vjp = jax.vjp(oracle, q, k, v, bias)
    dq_r, dk_r, dv_r, dbias_r = vjp(g)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(dbias_r),
                               rtol=1e-4, atol=1e-5)
    for a, bb in ((dq, dq_r), (dk, dk_r), (dv, dv_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-5)


def test_streaming_backward_dfreqs_learnable_rope():
    """Learnable per-head (rope-mixed-style) frequencies: the streaming
    backward's (dcos, dsin) — reduced from rotated-space q/k gradients —
    must match the oracle's cotangents."""
    n, h, d, b = 626, 2, 32, 2
    q, k, v = make_qkv(jax.random.PRNGKey(40), b, h, n, d)
    cos = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(41),
                                        (h, n - 1, d // 2))
    sin = 0.1 * jax.random.normal(jax.random.PRNGKey(42), (h, n - 1, d // 2))
    scale = d ** -0.5
    out = fa._forward_streaming(q, k, v, scale, None, (cos, sin),
                                interpret=True, mm_dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(43), out.shape) * 0.1
    dq, dk, dv, dbias, dfreqs, _, _ = fa._bwd_streaming(
        scale, q, k, v, None, (cos, sin), out, g, interpret=True,
        mm_dtype=jnp.float32, want_dfreqs=True)
    assert dbias is None

    def oracle(q, k, v, cos, sin):
        return ra.attention(q, k, v, scale, freqs_cis=(cos, sin))

    _, vjp = jax.vjp(oracle, q, k, v, cos, sin)
    dq_r, dk_r, dv_r, dcos_r, dsin_r = vjp(g)
    np.testing.assert_allclose(np.asarray(dfreqs[0]), np.asarray(dcos_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dfreqs[1]), np.asarray(dsin_r),
                               rtol=1e-4, atol=1e-5)
    for a, bb in ((dq, dq_r), (dk, dk_r), (dv, dv_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["bias", "mixed"])
def test_long_sequence_vjp_bias_and_mixed_end_to_end(mode):
    """Above the streaming threshold, grad(flash_attention) now covers the
    bias and learnable-frequency regimes through the tiled backward (no
    oracle fallback)."""
    n, h, d = fa.STREAMING_THRESHOLD + 60, 1, 32
    q, k, v = make_qkv(jax.random.PRNGKey(50), 1, h, n, d)
    scale = d ** -0.5
    if mode == "bias":
        bias = jax.random.normal(jax.random.PRNGKey(51), (h, n, n)) * 0.1

        def loss_flash(bias):
            return jnp.sum(fa.flash_attention_hp(q, k, v, scale,
                                                 bias=bias) ** 2)

        def loss_ref(bias):
            return jnp.sum(ra.attention(q, k, v, scale, bias=bias) ** 2)

        gf = jax.grad(loss_flash)(bias)
        gr = jax.grad(loss_ref)(bias)
    else:
        cos = 1.0 + 0.05 * jax.random.normal(jax.random.PRNGKey(52),
                                             (h, n - 1, d // 2))
        sin = 0.05 * jax.random.normal(jax.random.PRNGKey(53),
                                       (h, n - 1, d // 2))

        def loss_flash(cos, sin):
            return jnp.sum(fa.flash_attention_hp(
                q, k, v, scale, freqs_cis=(cos, sin)) ** 2)

        def loss_ref(cos, sin):
            return jnp.sum(ra.attention(
                q, k, v, scale, freqs_cis=(cos, sin)) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1))(cos, sin)[0]
        gr = jax.grad(loss_ref, argnums=(0, 1))(cos, sin)[0]
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# In-kernel polynomial bias GENERATION (streaming poly mode): the bias is
# computed per tile from the coefficients inside the kernels, and the
# coefficient gradient is accumulated in-kernel — no [H, N, N] tensor exists
# in either direction (the capability that makes polynomial PE reachable at
# N >= 8k, where the bias alone is tens of GB).
# ---------------------------------------------------------------------------

def _poly_case(key, grid=17, b=2, h=3, d=8, degree=3, shared=False):
    n = grid * grid + 1
    q, k, v = make_qkv(key, b, h, n, d)
    ck = jax.random.split(key, 4)[3]
    shape = (degree + 1,) if shared else (h, degree + 1)
    coeff = jax.random.normal(ck, shape, jnp.float32) * 0.02
    coeff_hk = jnp.broadcast_to(coeff[None], (h, degree + 1)) \
        if shared else coeff
    bias = fa._poly_bias_cols(coeff_hk, grid, n, 0, n, degree)
    return q, k, v, coeff_hk, bias, grid, n


def test_poly_bias_cols_matches_pe_module():
    """The jnp generator must agree with pe/polynomial.attn_bias (the
    reference semantics oracle), shared and per-head."""
    for shared in (True, False):
        cfg = cfg_for(16, 2, 8, "polynomial", poly_degree=3,
                      poly_shared_heads=shared)
        key = jax.random.PRNGKey(0)
        params = polynomial.init_params(key, cfg)
        want = polynomial.attn_bias(params, cfg)
        coeff_hk = polynomial.coeff_per_head(params, cfg)
        got = fa._poly_bias_cols(coeff_hk, cfg.grid_size, cfg.seq_len, 0,
                                 cfg.seq_len, cfg.poly_degree)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_streaming_poly_generated_bias_matches_oracle():
    q, k, v, coeff_hk, bias, grid, n = _poly_case(jax.random.PRNGKey(3))
    scale = q.shape[-1] ** -0.5
    want = ra.attention(q, k, v, scale, bias=bias)
    got = fa._forward_streaming(q, k, v, scale, None, None, interpret=True,
                                mm_dtype=jnp.float32, q_tile=128,
                                kv_tile=128, poly=(coeff_hk, grid))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_streaming_poly_backward_matches_oracle():
    q, k, v, coeff_hk, bias, grid, n = _poly_case(jax.random.PRNGKey(4))
    scale = q.shape[-1] ** -0.5

    def loss_oracle(q, k, v, c):
        bias = fa._poly_bias_cols(c, grid, n, 0, n, c.shape[1] - 1)
        return jnp.sum(ra.attention(q, k, v, scale, bias=bias) ** 2)

    want = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(q, k, v, coeff_hk)

    out = fa._forward_streaming(q, k, v, scale, None, None, interpret=True,
                                mm_dtype=jnp.float32, q_tile=128,
                                kv_tile=128, poly=(coeff_hk, grid))
    g = 2.0 * out
    dq, dk, dv, dbias, dfreqs, dcoeff, _ = fa._bwd_streaming(
        scale, q, k, v, None, None, out, g, interpret=True,
        mm_dtype=jnp.float32, q_tile=128, kv_tile=128,
        poly=(coeff_hk, grid))
    assert dbias is None and dfreqs is None
    np.testing.assert_allclose(dq, want[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(dk, want[1], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(dv, want[2], rtol=2e-4, atol=2e-4)
    # dcoeff tolerance is relative to the gradient's overall scale: the
    # softmax-jacobian identity sum_j ds_ij = 0 makes near-zero entries the
    # cancellation residue of terms ~1e4x larger, so their f32 noise floor
    # (in the oracle and the kernel alike, through different groupings) is
    # absolute, not relative.
    np.testing.assert_allclose(dcoeff, want[3], rtol=2e-4,
                               atol=1e-3 * np.abs(want[3]).max())


def test_poly_dense_path_custom_vjp_small_n():
    """Below the streaming threshold the poly argument takes the dense path
    (bias materialized from the coefficients) — value and grads must match
    the oracle, shared-coefficient broadcast included."""
    cfg = cfg_for(64, 2, 16, "polynomial", poly_degree=3,
                  poly_shared_heads=True)
    params = polynomial.init_params(jax.random.PRNGKey(5), cfg)
    q, k, v = make_qkv(jax.random.PRNGKey(6), 2, 2, cfg.seq_len, 16)
    scale = 16 ** -0.5

    def loss_flash(q, k, v, p):
        coeff_hk = polynomial.coeff_per_head(p, cfg)
        return jnp.sum(fa.flash_attention_hp(
            q, k, v, scale, poly=(coeff_hk, cfg.grid_size)) ** 2)

    def loss_oracle(q, k, v, p):
        return jnp.sum(ra.attention(
            q, k, v, scale, bias=polynomial.attn_bias(p, cfg)) ** 2)

    np.testing.assert_allclose(loss_flash(q, k, v, params),
                               loss_oracle(q, k, v, params), rtol=1e-5)
    got = jax.grad(loss_flash, argnums=3)(q, k, v, params)
    want = jax.grad(loss_oracle, argnums=3)(q, k, v, params)
    np.testing.assert_allclose(got["pos_embed.coefficients"],
                               want["pos_embed.coefficients"],
                               rtol=1e-4, atol=1e-5)


def test_model_streaming_poly_with_remat(monkeypatch):
    """The coefficient marker (a tuple arg) must survive jax.checkpoint on
    the block body: remat'd streaming-poly forward+grad equals non-remat."""
    from vit_rpe_rope_tpu.models import vit

    monkeypatch.setattr(fa, "STREAMING_THRESHOLD", 128)
    base = dict(poly_degree=2, poly_shared_heads=True,
                attention_impl="flash")
    cfg = cfg_for(144, 2, 8, "polynomial", **base)
    cfg_r = cfg_for(144, 2, 8, "polynomial", **base, remat=True)
    params = vit.init_params(jax.random.PRNGKey(9), cfg)
    x = jax.random.normal(jax.random.PRNGKey(10),
                          (1, cfg.img_size, cfg.img_size, 3))

    def loss(p, c):
        return jnp.mean(vit.apply(p, x, c) ** 2)

    np.testing.assert_allclose(loss(params, cfg), loss(params, cfg_r),
                               rtol=1e-6)
    g = jax.grad(loss)(params, cfg)
    g_r = jax.grad(loss)(params, cfg_r)
    np.testing.assert_allclose(
        g["pos_embed.coefficients"], g_r["pos_embed.coefficients"],
        rtol=1e-5, atol=1e-7)


def test_model_streaming_poly_end_to_end(monkeypatch):
    """vit.apply with polynomial PE above the (patched-down) streaming
    threshold: the in-kernel-generated path must match the reference
    implementation for logits AND parameter gradients, with NO [H, N, N]
    bias in the program."""
    from vit_rpe_rope_tpu.models import vit

    monkeypatch.setattr(fa, "STREAMING_THRESHOLD", 128)
    cfg = cfg_for(144, 2, 8, "polynomial", poly_degree=3,
                  poly_shared_heads=False, attention_impl="flash")
    cfg_ref = cfg_for(144, 2, 8, "polynomial", poly_degree=3,
                      poly_shared_heads=False, attention_impl="reference")
    params = vit.init_params(jax.random.PRNGKey(7), cfg)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, cfg.img_size,
                                                  cfg.img_size, 3))

    def loss(p, c):
        return jnp.mean(vit.apply(p, x, c) ** 2)

    # bf16 in-kernel multiplies vs the f32 reference: loose value tolerance.
    np.testing.assert_allclose(loss(params, cfg), loss(params, cfg_ref),
                               rtol=5e-3)
    got = jax.grad(loss)(params, cfg)
    want = jax.grad(loss)(params, cfg_ref)
    np.testing.assert_allclose(
        got["pos_embed.coefficients"], want["pos_embed.coefficients"],
        rtol=5e-3, atol=1e-6)
    for key in ("blocks.0.attn.qkv.weight", "head.weight"):
        np.testing.assert_allclose(got[key], want[key], rtol=5e-3, atol=5e-5)


# ---------------------------------------------------------------------------
# In-kernel RELATIVE-table bias generation (streaming rel mode): Toeplitz
# tiles expanded in-kernel from the [H, 2L-1] table via dynamic pltpu.roll +
# binary-shift decomposition (no gather), with the table gradient
# accumulated in-kernel by the transpose — closing the last PE mode that
# still materialized [H, N, N] at long N.
# ---------------------------------------------------------------------------

def _rel_case(key, n=290, b=2, h=3, d=8):
    q, k, v = make_qkv(key, b, h, n, d)
    tk = jax.random.split(key, 4)[3]
    table = jax.random.normal(tk, (h, 2 * n - 1), jnp.float32) * 0.1
    bias = fa._rel_bias_cols(table, n, 0, n)
    return q, k, v, table, bias, n


def test_rel_bias_cols_matches_pe_module():
    cfg = cfg_for(64, 2, 8, "relative")
    params = relative.init_params(jax.random.PRNGKey(0), cfg)
    want = relative.attn_bias(params, cfg)
    got = fa._rel_bias_cols(
        params["pos_embed.relative_position_bias_table"],
        cfg.seq_len, 0, cfg.seq_len)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_streaming_rel_generated_bias_matches_oracle():
    q, k, v, table, bias, n = _rel_case(jax.random.PRNGKey(12))
    scale = q.shape[-1] ** -0.5
    want = ra.attention(q, k, v, scale, bias=bias)
    got = fa._forward_streaming(q, k, v, scale, None, None, interpret=True,
                                mm_dtype=jnp.float32, q_tile=128,
                                kv_tile=128, rel=table)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_streaming_rel_backward_matches_oracle():
    q, k, v, table, bias, n = _rel_case(jax.random.PRNGKey(13))
    scale = q.shape[-1] ** -0.5

    def loss_oracle(q, k, v, t):
        return jnp.sum(ra.attention(
            q, k, v, scale, bias=fa._rel_bias_cols(t, n, 0, n)) ** 2)

    want = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(q, k, v, table)

    out = fa._forward_streaming(q, k, v, scale, None, None, interpret=True,
                                mm_dtype=jnp.float32, q_tile=128,
                                kv_tile=128, rel=table)
    g = 2.0 * out
    dq, dk, dv, dbias, dfreqs, dcoeff, dtable = fa._bwd_streaming(
        scale, q, k, v, None, None, out, g, interpret=True,
        mm_dtype=jnp.float32, q_tile=128, kv_tile=128, rel=table)
    assert dbias is None and dfreqs is None and dcoeff is None
    np.testing.assert_allclose(dq, want[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(dk, want[1], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(dv, want[2], rtol=2e-4, atol=2e-4)
    # Same softmax-jacobian cancellation caveat as dcoeff: near-zero
    # entries are residues of much larger terms; scale-relative atol.
    np.testing.assert_allclose(
        dtable, want[3], rtol=2e-4,
        atol=1e-3 * max(float(np.abs(np.asarray(want[3])).max()), 1e-3))


def test_rel_dense_path_custom_vjp_small_n():
    cfg = cfg_for(64, 2, 16, "relative")
    params = relative.init_params(jax.random.PRNGKey(14), cfg)
    q, k, v = make_qkv(jax.random.PRNGKey(15), 2, 2, cfg.seq_len, 16)
    scale = 16 ** -0.5

    def loss_flash(q, k, v, p):
        return jnp.sum(fa.flash_attention_hp(
            q, k, v, scale,
            rel=p["pos_embed.relative_position_bias_table"]) ** 2)

    def loss_oracle(q, k, v, p):
        return jnp.sum(ra.attention(
            q, k, v, scale, bias=relative.attn_bias(p, cfg)) ** 2)

    np.testing.assert_allclose(loss_flash(q, k, v, params),
                               loss_oracle(q, k, v, params), rtol=1e-5)
    got = jax.grad(loss_flash, argnums=3)(q, k, v, params)
    want = jax.grad(loss_oracle, argnums=3)(q, k, v, params)
    np.testing.assert_allclose(
        got["pos_embed.relative_position_bias_table"],
        want["pos_embed.relative_position_bias_table"],
        rtol=1e-4, atol=1e-5)


def test_model_streaming_rel_end_to_end(monkeypatch):
    """vit.apply with relative PE above the (patched-down) streaming
    threshold: in-kernel-generated Toeplitz bias must match the reference
    implementation for logits AND the table gradient."""
    from vit_rpe_rope_tpu.models import vit

    monkeypatch.setattr(fa, "STREAMING_THRESHOLD", 128)
    cfg = cfg_for(144, 2, 8, "relative", attention_impl="flash")
    cfg_ref = cfg_for(144, 2, 8, "relative", attention_impl="reference")
    params = vit.init_params(jax.random.PRNGKey(16), cfg)
    x = jax.random.normal(jax.random.PRNGKey(17), (2, cfg.img_size,
                                                   cfg.img_size, 3))

    def loss(p, c):
        return jnp.mean(vit.apply(p, x, c) ** 2)

    np.testing.assert_allclose(loss(params, cfg), loss(params, cfg_ref),
                               rtol=5e-3)
    got = jax.grad(loss)(params, cfg)
    want = jax.grad(loss)(params, cfg_ref)
    np.testing.assert_allclose(
        got["pos_embed.relative_position_bias_table"],
        want["pos_embed.relative_position_bias_table"],
        rtol=5e-3, atol=5e-5)
    np.testing.assert_allclose(got["head.weight"], want["head.weight"],
                               rtol=5e-3, atol=5e-5)


@pytest.mark.parametrize("mode", ["none", "rope", "poly", "rel"])
def test_fused_streaming_backward_matches_separate_passes(mode):
    """The round-3 ONE-pass backward (_stream_bwd_fused_kernel: dq/dk/dv/
    dparam from a single (b, h, q, kv) sweep with resident [N, D] output
    blocks) must reproduce the separate-pass results exactly — same tile
    math, computed once instead of 3-4×."""
    b, h, n, d, grid = 1, 2, 2100, 16, 45
    ks = jax.random.split(jax.random.PRNGKey(20), 6)
    q, k, v, g = (jax.random.normal(ks[i], (b, h, n, d)) for i in range(4))
    scale = d ** -0.5
    poly = rel = freqs = None
    if mode == "poly":
        poly = (0.1 * jax.random.normal(ks[4], (h, 3)), grid)
    elif mode == "rel":
        rel = 0.5 * jax.random.normal(ks[4], (h, 2 * n - 1))
    elif mode == "rope":
        cos = jnp.cos(jax.random.normal(ks[4], (n - 1, d // 2)))
        sin = jnp.sin(jax.random.normal(ks[5], (n - 1, d // 2)))
        freqs = (cos, sin)
    out, lse = fa._forward(q, k, v, scale, None, freqs,
                           poly[0] if poly else None,
                           poly[1] if poly else 0, rel, want_lse=True)
    delta = jnp.sum(g * out, axis=-1)
    # Same q_tile as the separate passes → identical accumulation order →
    # bit-exact comparison (the product default q_tile=256 differs only by
    # fp32 summation order).
    dq1, dk1, dv1, dc1, dt1 = fa._bwd_streaming_fused(
        scale, q, k, v, freqs, g, lse, delta, interpret=True,
        mm_dtype=jnp.float32, poly=poly, rel=rel, q_tile=512)
    dq2, dk2, dv2, _, _, dc2, dt2 = fa._bwd_streaming(
        scale, q, k, v, None, freqs, out, g, interpret=True,
        mm_dtype=jnp.float32, want_dbias=False, want_dfreqs=False,
        poly=poly, rel=rel, lse=lse)
    np.testing.assert_allclose(dq1, dq2, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(dk1, dk2, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(dv1, dv2, rtol=1e-6, atol=1e-6)
    if poly is not None:
        np.testing.assert_allclose(dc1, dc2, rtol=1e-6, atol=1e-6)
    if rel is not None:
        np.testing.assert_allclose(dt1, dt2, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("mode", ["none", "rope", "poly", "rel"])
def test_fused_backward_kv_segmented_matches_unsegmented(mode, monkeypatch):
    """When dk/dv's full-extent residency would blow the VMEM budget, the
    fused driver sweeps kv in segments at global column offsets
    (_bwd_fused_segmented). Forcing tiny segments must reproduce the
    single-call result: dq/dparam partials sum, dk/dv segments concat, and
    rope rotates outside the loop (R(θ)ᵀ applied once)."""
    b, h, n, d = 1, 2, 1100, 16
    ks = jax.random.split(jax.random.PRNGKey(21), 6)
    q, k, v, g = (jax.random.normal(ks[i], (b, h, n, d)) for i in range(4))
    scale = d ** -0.5
    poly = rel = freqs = None
    if mode == "poly":
        poly = (0.1 * jax.random.normal(ks[4], (h, 3)), 34)
    elif mode == "rel":
        rel = 0.5 * jax.random.normal(ks[4], (h, 2 * n - 1))
    elif mode == "rope":
        cos = jnp.cos(jax.random.normal(ks[4], (n - 1, d // 2)))
        sin = jnp.sin(jax.random.normal(ks[5], (n - 1, d // 2)))
        freqs = (cos, sin)
    out, lse = fa._forward(q, k, v, scale, None, freqs,
                           poly[0] if poly else None,
                           poly[1] if poly else 0, rel, want_lse=True)
    delta = jnp.sum(g * out, axis=-1)
    args = (scale, q, k, v, freqs, g, lse, delta)
    kw = dict(interpret=True, mm_dtype=jnp.float32, poly=poly, rel=rel)
    want = fa._bwd_streaming_fused(*args, **kw)
    # 1100 tokens / 512-col segments -> 3 segments (last one ragged).
    monkeypatch.setattr(fa, "_fused_kv_seg_cols", lambda d_, qt, kvt, fixed_extra=0: 512)
    got = fa._bwd_streaming_fused(*args, **kw)
    for a, b_ in zip(got[:3], want[:3]):
        np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-5)
    if poly is not None:
        # Per-segment partial sums change the fp32 accumulation order on
        # the large-magnitude high-degree coefficients (~1e-5 relative).
        np.testing.assert_allclose(got[3], want[3], rtol=5e-5, atol=1e-4)
    if rel is not None:
        np.testing.assert_allclose(got[4], want[4], rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("seg", [False, True])
def test_fused_rel_multigroup_windows_match(seg, monkeypatch):
    """The relative mode's windowed design (round 3): shrinking
    _REL_WIN_BUDGET forces rel_qg < n_qt, so the pre-rolled row is sliced
    into several per-q-group windows and the dtable gradient flushes to the
    HBM output once per (b, h, group) via RMW DMA. Multi-group (and
    multi-group WITHIN kv segments) must reproduce the single-window
    result. Also exercises TRACED row0/col0 (the ring-chunk path), which
    makes the driver's alignment roll a dynamic jnp.roll."""
    b, h, n, d = 1, 2, 1100, 16
    ks = jax.random.split(jax.random.PRNGKey(23), 5)
    q, k, v, g = (jax.random.normal(ks[i], (b, h, n, d)) for i in range(4))
    rel = 0.5 * jax.random.normal(ks[4], (h, 2 * n - 1))
    scale = d ** -0.5
    out, lse = fa._forward(q, k, v, scale, None, None, None, 0, rel,
                           want_lse=True)
    delta = jnp.sum(g * out, axis=-1)
    args = (scale, q, k, v, None, g, lse, delta)
    kw = dict(interpret=True, mm_dtype=jnp.float32, rel=rel,
              row0=jnp.int32(0), col0=jnp.int32(0))
    want = fa._bwd_streaming_fused(*args, **kw)
    if seg:
        # 3 ragged kv segments; inside each, budget 24576 -> rel_qg=3 of
        # n_qt=5 -> 2 q-groups per segment call.
        monkeypatch.setattr(fa, "_fused_kv_seg_cols",
                            lambda d_, qt, kvt, fixed_extra=0: 512)
        monkeypatch.setattr(fa, "_REL_WIN_BUDGET", 24576)
    else:
        # Unsegmented: budget 38912 -> rel_qg=2 -> 3 q-groups.
        monkeypatch.setattr(fa, "_REL_WIN_BUDGET", 38912)
    got = fa._bwd_streaming_fused(*args, **kw)
    for a, b_ in zip(got[:3], want[:3]):
        np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[4], want[4], rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("tq,wpad", [(1, 128), (5, 128), (8, 256),
                                     (13, 256), (128, 384), (256, 512)])
def test_expand_shifts_matches_naive(tq, wpad):
    """_expand_shifts doubling construction == per-row jnp.roll (the
    definition the kernel's Toeplitz tile relies on)."""
    row = jax.random.normal(jax.random.PRNGKey(tq), (1, wpad), jnp.float32)
    want = jnp.concatenate([jnp.roll(row, i, axis=1) for i in range(tq)])
    got = fa._expand_shifts(row, tq, wpad)
    assert got.shape == (tq, wpad)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


@pytest.mark.parametrize("tq,wpad", [(1, 128), (5, 128), (8, 256),
                                     (13, 256), (128, 384), (256, 512)])
def test_fold_shifts_is_expand_transpose(tq, wpad):
    """_fold_shifts == sum_i roll(d[i], -i), the linear adjoint of
    _expand_shifts (<expand(r), D> == <r, fold(D)>), which is what makes
    the dtable gradient correct."""
    d = jax.random.normal(jax.random.PRNGKey(100 + tq), (tq, wpad),
                          jnp.float32)
    want = sum(jnp.roll(d[i], -i) for i in range(tq))[None]
    got = fa._fold_shifts(d, tq, wpad)
    assert got.shape == (1, wpad)
    # fp32 summation-order noise only: ~2e-5 abs on O(sqrt(tq)) sums.
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)
