"""Visualizer analytics parity vs the reference visualizer's own similarity /
FFT functions (golden fixtures), plus end-to-end CLI smoke tests producing
PNGs and checkpoint introspection round-trips (SURVEY.md §2 #14-#18, Q9)."""

import os

import numpy as np
import pytest

from vit_rpe_rope_tpu.viz import introspect, rope_freq, similarity

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "viz_golden.npz")


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN))


# ---- similarity analytics goldens ------------------------------------------

def test_absolute_similarity_golden(golden):
    sim, g = similarity.absolute_similarity(golden["abs.table"], 8)
    assert g == 8
    np.testing.assert_allclose(sim, golden["abs.sim"], rtol=1e-4, atol=1e-5)


def test_relative_similarity_golden(golden):
    sim, g = similarity.relative_similarity(golden["rel.table"], 8)
    assert g == 8
    np.testing.assert_allclose(sim, golden["rel.sim"], rtol=1e-4, atol=1e-5)


def test_polynomial_similarity_golden(golden):
    sim, g = similarity.polynomial_similarity(golden["poly.coeff"], 8,
                                              num_heads=4)
    np.testing.assert_allclose(sim, golden["poly.sim"], rtol=1e-4, atol=1e-4)


def test_rope_axial_similarity_golden(golden):
    cfg_inv = 1.0 / (100.0 ** (np.arange(8, dtype=np.float32) / 8))
    sim, g = similarity.rope_axial_similarity(cfg_inv, 8, rope_theta=100.0)
    np.testing.assert_allclose(sim, golden["axial.sim"], rtol=1e-4, atol=1e-5)


def test_rope_mixed_similarity_golden(golden):
    # The reference visualizer inherits the Q1 scramble — compat mode here.
    sim, g = similarity.rope_mixed_similarity(
        golden["mixed.freqs"], 8, head_idx=1, compat_scramble=True)
    np.testing.assert_allclose(sim, golden["mixed.sim"], rtol=1e-4, atol=1e-5)


# ---- rope FFT analytics goldens ---------------------------------------------

@pytest.mark.parametrize("pattern", ["single", "diagonal"])
def test_patterns_match_reference(golden, pattern):
    pos = rope_freq.create_input_positions(pattern, 8)
    np.testing.assert_array_equal(pos, golden[f"pat.{pattern}"])


@pytest.mark.parametrize("pattern", ["single", "diagonal"])
def test_fft_axial_golden(golden, pattern):
    pos = rope_freq.create_input_positions(pattern, 8)
    cos, sin = rope_freq.axial_freqs(32, 100.0, 8)
    mag, rec = rope_freq.apply_rope_and_fft(pos, cos, sin)
    np.testing.assert_allclose(mag, golden[f"fft.axial.{pattern}.mag"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(rec, golden[f"fft.axial.{pattern}.rec"],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pattern", ["single", "diagonal"])
def test_fft_mixed_golden(golden, pattern):
    pos = rope_freq.create_input_positions(pattern, 8)
    cos, sin = rope_freq.mixed_freqs(
        32, 4, 10.0, 8, freqs_param=golden["mixed.freqs"],
        compat_scramble=True)
    mag, rec = rope_freq.apply_rope_and_fft(pos, cos, sin, head_idx=1)
    np.testing.assert_allclose(mag, golden[f"fft.mixed.{pattern}.mag"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(rec, golden[f"fft.mixed.{pattern}.rec"],
                               rtol=1e-4, atol=1e-5)


def test_custom_pattern():
    pos = rope_freq.create_input_positions("custom", 8,
                                           custom_coords=["1", "2", "3", "4"])
    assert pos[1, 2] == 1.0 and pos[3, 4] == 1.0 and pos.sum() == 2.0


# ---- checkpoint introspection -----------------------------------------------

def _save_ckpt(tmp_path, pe_name, fname=None):
    import jax

    from vit_rpe_rope_tpu.configs import ViTConfig
    from vit_rpe_rope_tpu.models import vit
    from vit_rpe_rope_tpu.utils import checkpoint

    cfg = ViTConfig(img_size=32, patch_size=4, in_chans=3, embed_dim=96,
                    depth=2, num_heads=4, pos_encoding=pe_name)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / (fname or f"cifar10_{pe_name}_best.npz"))
    return checkpoint.save(path, params, vit.buffers(cfg),
                           aliases=vit.reference_alias_keys(cfg)), cfg


@pytest.mark.parametrize("pe_name,checks", [
    ("relative", dict(num_heads=4, grid_size=8)),
    ("polynomial", dict(embed_dim=96)),
    ("rope-axial", dict(head_dim=24)),
    ("rope-mixed", dict(num_heads=4, head_dim=24)),
    ("absolute", dict(embed_dim=96)),
])
def test_introspect_infers_architecture(tmp_path, pe_name, checks):
    path, cfg = _save_ckpt(tmp_path, pe_name)
    model = introspect.load_pe_model(path, pe_name, grid_size=14, num_heads=4)
    for attr, expected in checks.items():
        assert getattr(model, attr) == expected, attr
    # 'cifar10' in the filename forces grid 8 (reference quirk).
    assert model.grid_size == 8


def test_introspect_reads_reference_pth():
    golden_dir = os.path.join(os.path.dirname(__file__), "golden")
    path = os.path.join(golden_dir, "model_golden_rope_mixed.npz")
    model = introspect.load_pe_model(path, "rope-mixed")
    assert model.num_heads == 6 and model.head_dim == 32
    assert model.embed_dim == 192


def test_discover_checkpoints(tmp_path):
    _save_ckpt(tmp_path, "relative")
    _save_ckpt(tmp_path, "rope-axial")
    found = introspect.discover_checkpoints(
        str(tmp_path), ["absolute", "relative", "rope-axial"])
    assert sorted(found) == ["relative", "rope-axial"]


# ---- CLI end-to-end smoke ----------------------------------------------------

def test_pe_similarity_cli_random(tmp_path):
    from vit_rpe_rope_tpu.cli import pe_similarity_visualizer as cli

    cli.main(["--methods", "relative", "rope-axial", "--grid_size", "4",
              "--dim", "32", "--num_heads", "2", "--dpi", "50",
              "--output_dir", str(tmp_path)])
    pngs = os.listdir(tmp_path)
    assert len([p for p in pngs if p.endswith(".png")]) == 4  # grid+compact ×2


def test_pe_similarity_cli_load_model(tmp_path):
    from vit_rpe_rope_tpu.cli import pe_similarity_visualizer as cli

    path, _ = _save_ckpt(tmp_path, "polynomial")
    cli.main(["--load_model", "--model_path", path, "--model_config",
              "polynomial", "--dpi", "50", "--output_dir", str(tmp_path)])
    # Reference filename scheme: pe_similarity_compact_{stem}_{method}_{ts}
    # (/root/reference/pe_similarity_visualizer.py:676).
    assert any(
        p.startswith("pe_similarity_compact_cifar10_polynomial_best_polynomial")
        for p in os.listdir(tmp_path))


def test_rope_visualizer_cli_default(tmp_path):
    from vit_rpe_rope_tpu.cli import rope_visualizer as cli

    cli.main(["--patterns", "single", "--grid_size", "8", "--dim", "16",
              "--num_heads", "2", "--dpi", "50", "--compare_thetas",
              "--theta_values", "10", "100",
              "--output_dir", str(tmp_path)])
    pngs = os.listdir(tmp_path)
    assert any("single" in p for p in pngs)
    assert any("theta_comparison" in p for p in pngs)


def test_rope_visualizer_cli_compare_models(tmp_path):
    from vit_rpe_rope_tpu.cli import rope_visualizer as cli

    ax_path, _ = _save_ckpt(tmp_path, "rope-axial", "cifar10_rope-axial_best.npz")
    mx_path, _ = _save_ckpt(tmp_path, "rope-mixed", "cifar10_rope-mixed_best.npz")
    cli.main(["--compare_models", "--axial_model_path", ax_path,
              "--mixed_model_path", mx_path, "--patterns", "corner",
              "--dpi", "50", "--output_dir", str(tmp_path)])
    assert any(p.startswith("rope_freq_models_corner")
               for p in os.listdir(tmp_path))


def test_rope_visualizer_cli_load_model(tmp_path):
    from vit_rpe_rope_tpu.cli import rope_visualizer as cli

    path, _ = _save_ckpt(tmp_path, "rope-mixed", "mnist_rope-mixed_best.npz")
    cli.main(["--load_model", "--model_path", path, "--model_config",
              "rope-mixed", "--patterns", "corner", "--dpi", "50",
              "--output_dir", str(tmp_path)])
    assert any(p.startswith("rope_freq_trained_corner")
               for p in os.listdir(tmp_path))


def test_introspect_wrong_method_helpful_error(tmp_path):
    path, _ = _save_ckpt(tmp_path, "rope-axial")
    with pytest.raises(ValueError, match="looks like \\['rope-axial'\\]"):
        introspect.load_pe_model(path, "rope-mixed")


def test_pe_similarity_comparison_skips_bad_model(tmp_path, capsys):
    """Multi-model comparison warns and SKIPS a checkpoint that fails to
    load instead of aborting (reference behavior,
    /root/reference/pe_similarity_visualizer.py:557-572)."""
    from vit_rpe_rope_tpu.cli import pe_similarity_visualizer as cli

    good, _ = _save_ckpt(tmp_path, "relative")
    bad, _ = _save_ckpt(tmp_path, "rope-axial",
                        fname="cifar10_rope-axial_best.npz")
    # Deliberate mismatch: claim the rope-axial checkpoint is 'polynomial'.
    cli.main(["--compare_models", "--model_paths", good, bad,
              "--model_configs", "relative", "polynomial",
              "--dpi", "50", "--output_dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "Skipping polynomial." in out
    # Reference filename scheme: pe_model_comparison_{ts}
    # (/root/reference/pe_similarity_visualizer.py:856).
    assert any(p.startswith("pe_model_comparison")
               for p in os.listdir(tmp_path))


def test_rope_visualizer_compare_skips_bad_model(tmp_path, capsys):
    """--compare_models warns and degrades to the surviving model when one
    checkpoint fails to load (reference recovers instead of aborting)."""
    from vit_rpe_rope_tpu.cli import rope_visualizer as cli

    good, _ = _save_ckpt(tmp_path, "rope-axial")
    bad, _ = _save_ckpt(tmp_path, "relative")  # not a rope-mixed checkpoint
    cli.main(["--compare_models", "--axial_model_path", good,
              "--mixed_model_path", bad, "--grid_size", "8", "--dim", "16",
              "--num_heads", "2", "--dpi", "50",
              "--output_dir", str(tmp_path / "out")])
    out = capsys.readouterr().out
    assert "Skipping rope-mixed." in out
    assert any(p.endswith(".png") for p in os.listdir(tmp_path / "out"))


def test_infer_vit_config_stripped_buffers_filename_fallback(tmp_path):
    """Pathological checkpoint with the pos_embed.* buffers stripped
    (reference recovers via its load-error regex,
    /root/reference/rope_visualizer.py:249-275): the method comes from the
    filename and the dimensions from patch_embed/blocks shapes, with the
    caller's num_heads fallback standing in for the missing buffer."""
    import jax
    import numpy as np

    from vit_rpe_rope_tpu.configs import ViTConfig
    from vit_rpe_rope_tpu.models import vit as vit_mod

    cfg = ViTConfig(img_size=32, patch_size=4, in_chans=3, embed_dim=192,
                    depth=2, num_heads=6, pos_encoding="rope-axial")
    params = vit_mod.init_params(jax.random.PRNGKey(0), cfg)
    state = {k: np.asarray(v) for k, v in params.items()
             if not k.startswith("pos_embed.")}
    path = tmp_path / "cifar10_rope-axial_best.npz"
    np.savez(path, **state)

    got = introspect.infer_vit_config(state, path=str(path), num_heads=6)
    assert got.pos_encoding == "rope-axial"
    assert got.embed_dim == 192 and got.depth == 2 and got.num_heads == 6
    assert got.img_size == 32  # cifar10-filename grid quirk

    # No filename hint either -> "none" (plain shape inference).
    got2 = introspect.infer_vit_config(state, path="mystery.npz")
    assert got2.pos_encoding == "none"


@pytest.mark.parametrize("pe_name,want_dim", [
    ("rope-axial", 96),   # inv_freq [head_dim//4] -> head_dim*num_heads
    ("rope-mixed", 96),   # freqs [2, H, head_dim//2] -> head_dim*H
])
def test_introspect_pe_only_checkpoint_recovers_dim(tmp_path, pe_name,
                                                    want_dim):
    """Pathological PE-only checkpoint (patch_embed/qkv keys stripped):
    embed_dim is recovered from the rope buffer shapes — the case the
    reference handles by regex-parsing load_state_dict size-mismatch
    errors (/root/reference/rope_visualizer.py:249-275)."""
    import numpy as np

    from vit_rpe_rope_tpu.utils import checkpoint

    path, cfg = _save_ckpt(tmp_path, pe_name)
    state = checkpoint.load_state(path)
    pe_only = {k: np.asarray(v) for k, v in state.items()
               if k.startswith("pos_embed.")}
    stripped = str(tmp_path / f"cifar10_{pe_name}_pe_only.npz")
    np.savez(stripped, **pe_only)
    model = introspect.load_pe_model(stripped, pe_name, num_heads=4)
    assert model.embed_dim == want_dim
    assert model.head_dim == 24
    assert model.embed_dim == model.num_heads * model.head_dim
