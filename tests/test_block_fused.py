"""Experimental whole-block fused kernel: forward parity vs the model's
block (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_rpe_rope_tpu.configs import ViTConfig
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.ops import block_fused
from vit_rpe_rope_tpu.pe import rope_axial


@pytest.mark.parametrize("rope", [False, True])
def test_block_fused_matches_model_block(rope):
    cfg = ViTConfig(img_size=32, patch_size=4, in_chans=3, embed_dim=192,
                    depth=1, num_heads=6,
                    pos_encoding="rope-axial" if rope else "none",
                    attention_impl="reference")
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    block = {name: params[f"blocks.0.{name}"]
             for name in vit.BLOCK_PARAM_NAMES}
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 65, 192)) * 0.5
    freqs = rope_axial.freqs_cis({}, cfg) if rope else None
    ref = vit._block_body(block, x, cfg, None, freqs, "reference")
    out = block_fused.block_forward(x, block, cfg, freqs_cis=freqs,
                                    batch_tile=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)  # bf16 multiplies
