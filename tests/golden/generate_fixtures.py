"""Generate cross-framework golden fixtures from the reference PyTorch repo.

Run ONCE on a machine where /root/reference exists; the resulting .npz
fixtures are committed so the test suite is standalone (SURVEY.md §4.3).

The reference's models/positional_encoding.py and models/rope_utils.py import
only torch+math and run directly. models/vit.py imports timm, which is not
installed here — a minimal behavioral stub (timm Mlp = fc1/GELU/fc2,
DropPath(0) = identity, PatchEmbed unused) is injected so the REAL reference
model produces the full-model goldens. No reference code is copied anywhere.

Usage:  python tests/golden/generate_fixtures.py
Writes: tests/golden/pe_golden.npz, tests/golden/model_golden_<pe>.npz
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REFERENCE = os.environ.get("VIT_PE_REFERENCE", "/root/reference")
OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def install_timm_stub():
    import torch.nn as nn

    class Mlp(nn.Module):
        """Behavioral stand-in for timm.layers.Mlp as used by the reference
        (fc1 -> act -> drop -> fc2 -> drop; drop=0 here)."""

        def __init__(self, in_features, hidden_features=None, act_layer=nn.GELU,
                     drop=0.0, out_features=None):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.drop = nn.Dropout(drop)
            self.fc2 = nn.Linear(hidden_features, out_features)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    class DropPath(nn.Identity):
        def __init__(self, drop_prob=0.0):
            super().__init__()

    class PatchEmbed(nn.Module):  # imported but unused by the reference
        pass

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vt = types.ModuleType("timm.models.vision_transformer")
    vt.PatchEmbed, vt.Mlp = PatchEmbed, Mlp
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    timm.models = models
    models.vision_transformer = vt
    models.layers = layers
    sys.modules.update({
        "timm": timm,
        "timm.models": models,
        "timm.models.vision_transformer": vt,
        "timm.models.layers": layers,
    })


def gen_pe_goldens():
    import torch

    sys.path.insert(0, REFERENCE)
    from models import positional_encoding as ref_pe  # noqa: E402
    from models import rope_utils as ref_ru  # noqa: E402

    torch.manual_seed(0)
    out = {}

    # Relative: bias from a fixed random table, default ViT-tiny shape.
    rel = ref_pe.RelativePositionalEncoding(num_patches=64, num_heads=6)
    with torch.no_grad():
        rel.relative_position_bias_table.copy_(
            torch.randn(6, 2 * 65 - 1, generator=torch.Generator().manual_seed(1))
        )
    out["relative.table"] = rel.relative_position_bias_table.detach().numpy()
    out["relative.index"] = rel.relative_position_index.numpy()
    out["relative.bias"] = rel.get_bias().detach().numpy()

    # Polynomial shared + per-head.
    for shared in (True, False):
        poly = ref_pe.PolynomialRPE(num_patches=64, degree=3, num_heads=6,
                                    shared_across_heads=shared)
        with torch.no_grad():
            poly.coefficients.copy_(
                torch.randn(poly.coefficients.shape,
                            generator=torch.Generator().manual_seed(2))
            )
        tag = "shared" if shared else "perhead"
        out[f"poly.{tag}.coeff"] = poly.coefficients.detach().numpy()
        out[f"poly.{tag}.bias"] = poly.get_bias().detach().numpy()

    # RoPE-Axial freqs for head_dim=32, theta=100, seq 64.
    ax = ref_pe.RoPEAxial(dim=32, theta=100.0)
    cos, sin = ax.get_freqs_cis(64, torch.device("cpu"))
    out["axial.inv_freq"] = ax.inv_freq.numpy()
    out["axial.cos"], out["axial.sin"] = cos.numpy(), sin.numpy()

    # RoPE-Mixed: freqs param + cos/sin INCLUDING the Q1 scramble.
    mx = ref_pe.RoPEMixed(dim=32, num_heads=6, theta=10.0)
    with torch.no_grad():
        mx.freqs.copy_(torch.randn(2, 6, 16,
                                   generator=torch.Generator().manual_seed(3)))
    with torch.no_grad():
        cos, sin = mx.get_freqs_cis(64, torch.device("cpu"))
    out["mixed.freqs"] = mx.freqs.detach().numpy()
    out["mixed.cos"], out["mixed.sin"] = cos.detach().numpy(), sin.detach().numpy()

    # Rotation math golden: apply_rotary_emb on random q/k with axial freqs.
    g = torch.Generator().manual_seed(4)
    q = torch.randn(2, 6, 64, 32, generator=g)
    k = torch.randn(2, 6, 64, 32, generator=g)
    cos_b = ref_ru.reshape_for_broadcast(torch.as_tensor(out["axial.cos"]), q)
    sin_b = ref_ru.reshape_for_broadcast(torch.as_tensor(out["axial.sin"]), q)
    q_rot, k_rot = ref_ru.apply_rotary_emb(q, k, cos_b, sin_b)
    out["rot.q"], out["rot.k"] = q.numpy(), k.numpy()
    out["rot.q_rot"], out["rot.k_rot"] = q_rot.numpy(), k_rot.numpy()

    np.savez_compressed(os.path.join(OUT_DIR, "pe_golden.npz"), **out)
    print("wrote pe_golden.npz:", sorted(out))


def gen_model_goldens():
    import torch

    install_timm_stub()
    sys.path.insert(0, REFERENCE)
    from models.vit import VisionTransformer  # noqa: E402

    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(7)
    images = torch.randn(4, 3, 32, 32, generator=gen)

    for pe_name in ("none", "absolute", "relative", "polynomial",
                    "rope-axial", "rope-mixed"):
        torch.manual_seed(11)  # fixed init per variant
        model = VisionTransformer(
            img_size=32, patch_size=4, in_chans=3, num_classes=10,
            embed_dim=192, depth=6, num_heads=6, pos_encoding=pe_name,
            rope_theta=100.0, poly_degree=3, poly_shared_heads=True,
        ).eval()
        with torch.no_grad():
            logits = model(images)
        state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        state["__images"] = images.numpy()
        state["__logits"] = logits.numpy()
        fname = f"model_golden_{pe_name.replace('-', '_')}.npz"
        np.savez_compressed(os.path.join(OUT_DIR, fname), **state)
        print(f"wrote {fname}: logits mean {logits.mean():.6f}")




def gen_viz_goldens():
    """Similarity matrices + FFT analytics computed by the REFERENCE
    visualizer functions, for tests of our numpy ports."""
    import torch

    install_timm_stub()
    sys.path.insert(0, REFERENCE)
    import importlib

    ref_sim = importlib.import_module("pe_similarity_visualizer")
    ref_rope = importlib.import_module("rope_visualizer")
    from models import positional_encoding as ref_pe

    out = {}
    g = 8

    # absolute: fixed random table
    ape = ref_pe.AbsolutePositionalEncoding(48)
    with torch.no_grad():
        ape.pos_embed.copy_(torch.randn(1, 5000, 48,
                            generator=torch.Generator().manual_seed(21)))
    sim, gg = ref_sim.get_absolute_similarity(ape, g)
    out["abs.table"] = ape.pos_embed.detach().numpy()
    out["abs.sim"] = sim

    # relative
    rel = ref_pe.RelativePositionalEncoding(num_patches=g * g, num_heads=4)
    with torch.no_grad():
        rel.relative_position_bias_table.copy_(
            torch.randn(4, 2 * (g * g + 1) - 1,
                        generator=torch.Generator().manual_seed(22)))
    sim, _ = ref_sim.get_relative_similarity(rel, g)
    out["rel.table"] = rel.relative_position_bias_table.detach().numpy()
    out["rel.sim"] = sim

    # polynomial (shared)
    poly = ref_pe.PolynomialRPE(num_patches=g * g, degree=3, num_heads=4,
                                shared_across_heads=True)
    with torch.no_grad():
        poly.coefficients.copy_(
            torch.randn(4, generator=torch.Generator().manual_seed(23)))
    sim, _ = ref_sim.get_polynomial_similarity(poly, g)
    out["poly.coeff"] = poly.coefficients.detach().numpy()
    out["poly.sim"] = sim

    # rope-axial
    ax = ref_pe.RoPEAxial(dim=32, theta=100.0)
    sim, _ = ref_sim.get_rope_axial_similarity(ax, g)
    out["axial.sim"] = sim

    # rope-mixed (head 1)
    mx = ref_pe.RoPEMixed(dim=32, num_heads=4, theta=10.0)
    with torch.no_grad():
        mx.freqs.copy_(torch.randn(2, 4, 16,
                       generator=torch.Generator().manual_seed(24)))
    sim, _ = ref_sim.get_rope_mixed_similarity(mx, g, head_idx=1)
    out["mixed.freqs"] = mx.freqs.detach().numpy()
    out["mixed.sim"] = sim

    # rope FFT analytics: single + diagonal patterns through axial & mixed
    for pattern in ("single", "diagonal"):
        pos = ref_rope.create_input_positions(pattern, g)
        out[f"pat.{pattern}"] = pos.numpy()
        mag, rec = ref_rope.apply_rope_and_fft(pos, ax)
        out[f"fft.axial.{pattern}.mag"] = mag
        out[f"fft.axial.{pattern}.rec"] = rec
        mag, rec = ref_rope.apply_rope_and_fft(pos, mx, head_idx=1)
        out[f"fft.mixed.{pattern}.mag"] = mag
        out[f"fft.mixed.{pattern}.rec"] = rec

    np.savez_compressed(os.path.join(OUT_DIR, "viz_golden.npz"), **out)
    print("wrote viz_golden.npz:", sorted(out))


if __name__ == "__main__":
    gen_pe_goldens()
    gen_model_goldens()
    gen_viz_goldens()
