"""PE generator numerics: golden tests vs the reference PyTorch modules
(fixtures from tests/golden/generate_fixtures.py) plus rotation property
tests (SURVEY.md §4.1 — all parity risk Q1-Q4, Q7, Q10 lives here)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_rpe_rope_tpu import pe as pe_registry
from vit_rpe_rope_tpu.configs import ViTConfig
from vit_rpe_rope_tpu.ops.rotary import apply_rotary_emb
from vit_rpe_rope_tpu.pe import polynomial, relative, rope_axial, rope_mixed

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pe_golden.npz")


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN))


def tiny_cfg(**kw):
    return ViTConfig(img_size=32, patch_size=4, embed_dim=192, depth=6,
                     num_heads=6, **kw)


# ---- Relative (Q3: 1-D over flattened index, cls included) ----------------

def test_relative_index_matrix_matches_reference(golden):
    idx = relative._index_matrix(65)
    np.testing.assert_array_equal(np.asarray(idx), golden["relative.index"])


def test_relative_bias_golden(golden):
    cfg = tiny_cfg(pos_encoding="relative")
    params = {"pos_embed.relative_position_bias_table":
              jnp.asarray(golden["relative.table"])}
    bias = relative.attn_bias(params, cfg)
    np.testing.assert_allclose(np.asarray(bias), golden["relative.bias"],
                               rtol=0, atol=1e-6)
    assert bias.shape == (6, 65, 65)


def test_relative_rows_one_grid_row_apart_share_bucket():
    # Q3 semantics: Δindex = 8 (one grid row) and Δindex = 8 (8 columns)
    # share a bias bucket — 1-D flattened indexing, not 2-D bucketed.
    idx = np.asarray(relative._index_matrix(65))
    assert idx[9, 1] == idx[17, 9]  # both Δ = 8


# ---- Polynomial (L1 distance over grid, zero cls row/col) ------------------

@pytest.mark.parametrize("tag,shared", [("shared", True), ("perhead", False)])
def test_polynomial_bias_golden(golden, tag, shared):
    cfg = tiny_cfg(pos_encoding="polynomial", poly_shared_heads=shared)
    params = {"pos_embed.coefficients": jnp.asarray(golden[f"poly.{tag}.coeff"])}
    bias = polynomial.attn_bias(params, cfg)
    np.testing.assert_allclose(np.asarray(bias), golden[f"poly.{tag}.bias"],
                               rtol=1e-5, atol=1e-5)
    # cls row/col zero (Q2)
    assert np.abs(np.asarray(bias)[:, 0, :]).max() == 0
    assert np.abs(np.asarray(bias)[:, :, 0]).max() == 0


# ---- RoPE-Axial (Q4: half-split, dim//4 bands per axis) --------------------

def test_axial_inv_freq_and_freqs_golden(golden):
    cfg = tiny_cfg(pos_encoding="rope-axial", rope_theta=100.0)
    np.testing.assert_allclose(np.asarray(rope_axial.inv_freq(cfg)),
                               golden["axial.inv_freq"], rtol=1e-6)
    cos, sin = rope_axial.freqs_cis({}, cfg)
    np.testing.assert_allclose(np.asarray(cos), golden["axial.cos"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), golden["axial.sin"],
                               rtol=1e-5, atol=1e-6)
    assert cos.shape == (64, 16)  # [S, head_dim/2]


# ---- RoPE-Mixed (Q1 scramble compat + clean default) -----------------------

def test_mixed_freqs_compat_scramble_matches_reference(golden):
    cfg = tiny_cfg(pos_encoding="rope-mixed", rope_mixed_compat_scramble=True)
    params = {"pos_embed.freqs": jnp.asarray(golden["mixed.freqs"])}
    cos, sin = rope_mixed.freqs_cis(params, cfg)
    np.testing.assert_allclose(np.asarray(cos), golden["mixed.cos"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), golden["mixed.sin"],
                               rtol=1e-5, atol=1e-6)


def test_mixed_clean_einsum_differs_from_scramble(golden):
    # Q1: the clean semantics intentionally diverge from the reference's
    # memory reinterpretation when num_heads != seq_len.
    params = {"pos_embed.freqs": jnp.asarray(golden["mixed.freqs"])}
    clean = rope_mixed.freqs_cis(
        params, tiny_cfg(pos_encoding="rope-mixed"))
    assert not np.allclose(np.asarray(clean[0]), golden["mixed.cos"])


def test_mixed_init_magnitudes():
    # Init magnitude law: |f| bands = 1/theta^(arange(0,dim,4)[:dim//4]/dim),
    # identical for fx and fy per band (cos²+sin² = 1).
    key = jax.random.PRNGKey(0)
    freqs = rope_mixed.init_freqs(key, head_dim=32, num_heads=6, theta=10.0)
    mag = np.sqrt(np.asarray(freqs[0]) ** 2 + np.asarray(freqs[1]) ** 2)
    expected = 1.0 / (10.0 ** (np.arange(0, 32, 4)[:8] / 32.0))
    for h in range(6):
        np.testing.assert_allclose(mag[h, :8], expected, rtol=1e-5)
        np.testing.assert_allclose(mag[h, 8:], expected, rtol=1e-5)


# ---- Rotation math (half-split convention) ---------------------------------

def test_apply_rotary_golden(golden):
    q = jnp.asarray(golden["rot.q"])
    k = jnp.asarray(golden["rot.k"])
    q_rot, k_rot = apply_rotary_emb(
        q, k, jnp.asarray(golden["axial.cos"]), jnp.asarray(golden["axial.sin"])
    )
    np.testing.assert_allclose(np.asarray(q_rot), golden["rot.q_rot"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(k_rot), golden["rot.k_rot"],
                               rtol=1e-5, atol=1e-6)


def test_rotation_preserves_norm(golden):
    q = jnp.asarray(golden["rot.q"])
    q_rot, _ = apply_rotary_emb(
        q, q, jnp.asarray(golden["axial.cos"]), jnp.asarray(golden["axial.sin"])
    )
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q_rot), axis=-1),
        np.linalg.norm(np.asarray(q), axis=-1), rtol=1e-5)


def test_rotation_relative_phase_property():
    """⟨rot_m(q), rot_n(q)⟩ depends only on m − n (1-D RoPE property, checked
    along grid row 0 where only t_x varies): rotate one fixed vector to every
    position and compare inner products at equal offsets."""
    cfg = tiny_cfg(pos_encoding="rope-axial", rope_theta=100.0)
    cos, sin = rope_axial.freqs_cis({}, cfg)
    q = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 1, 32))
    q_same = jnp.broadcast_to(q, (1, 1, 64, 32))
    r, _ = apply_rotary_emb(q_same, q_same, cos, sin)
    r = np.asarray(r)[0, 0]
    d01 = float(np.dot(r[0], r[1]))
    d23 = float(np.dot(r[2], r[3]))
    d45 = float(np.dot(r[4], r[5]))
    np.testing.assert_allclose([d01, d23], [d23, d45], rtol=1e-4)


# ---- Registry / config guards ----------------------------------------------

def test_registry_covers_all_choices():
    from vit_rpe_rope_tpu.configs import PE_CHOICES

    for name in PE_CHOICES:
        assert pe_registry.get(name) is not None
    with pytest.raises(ValueError):
        pe_registry.get("bogus")


def test_rope_requires_head_dim_multiple_of_4():
    with pytest.raises(ValueError):
        ViTConfig(embed_dim=180, num_heads=6, pos_encoding="rope-axial")
