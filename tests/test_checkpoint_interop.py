"""Bidirectional checkpoint interop with the ORIGINAL reference model:

* export: our .npz -> torch .pth that the reference VisionTransformer loads
  with strict=True, producing identical logits to our JAX model;
* import: reference .pth state dicts load into our model (already covered by
  the golden tests; asserted again here through the torch round-trip).

Runs only where /root/reference and torch are available (fixture-generation
machines); the rest of the suite stays standalone.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = os.environ.get("VIT_PE_REFERENCE", "/root/reference")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted")


@pytest.mark.parametrize("pe_name", ["relative", "rope-axial", "rope-mixed"])
def test_npz_export_loads_into_reference_model(tmp_path, pe_name):
    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "golden"))
    from generate_fixtures import install_timm_stub

    install_timm_stub()
    sys.path.insert(0, REFERENCE)
    from models.vit import VisionTransformer

    from vit_rpe_rope_tpu.configs import ViTConfig
    from vit_rpe_rope_tpu.models import vit
    from vit_rpe_rope_tpu.utils import checkpoint

    cfg = ViTConfig(img_size=32, patch_size=4, in_chans=3, embed_dim=96,
                    depth=2, num_heads=4, pos_encoding=pe_name,
                    rope_theta=100.0, attention_impl="reference",
                    rope_mixed_compat_scramble=True)
    params = vit.init_params(jax.random.PRNGKey(3), cfg)
    npz = checkpoint.save(str(tmp_path / "ours.npz"), params,
                          vit.buffers(cfg),
                          aliases=vit.reference_alias_keys(cfg))
    pth = checkpoint.export_torch(npz)

    ref = VisionTransformer(
        img_size=32, patch_size=4, in_chans=3, num_classes=10, embed_dim=96,
        depth=2, num_heads=4, pos_encoding=pe_name, rope_theta=100.0).eval()
    missing = ref.load_state_dict(torch.load(pth, weights_only=True),
                                  strict=True)
    assert not missing.missing_keys and not missing.unexpected_keys

    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        torch_logits = ref(torch.from_numpy(x)).numpy()
    jax_logits = np.asarray(
        vit.apply(params, np.transpose(x, (0, 2, 3, 1)), cfg))
    np.testing.assert_allclose(jax_logits, torch_logits, rtol=1e-4, atol=1e-4)
