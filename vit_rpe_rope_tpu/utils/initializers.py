"""Weight initializers matching the reference's torch init semantics
(/root/reference/models/vit.py:216-233; SURVEY.md Q10).

torch.nn.init.trunc_normal_(t, std=0.02) truncates at ABSOLUTE bounds
[a=-2.0, b=2.0] — i.e. ±100σ for σ=0.02, effectively an untruncated normal.
We reproduce that exactly (bounds are divided by std before sampling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def trunc_normal(key, shape, std: float = 0.02, mean: float = 0.0,
                 lower: float = -2.0, upper: float = 2.0,
                 dtype=jnp.float32):
    """torch-style truncated normal: absolute truncation bounds."""
    if std == 0.0:
        return jnp.full(shape, mean, dtype)
    a = (lower - mean) / std
    b = (upper - mean) / std
    x = jax.random.truncated_normal(key, a, b, shape, dtype)
    return x * std + mean


def kaiming_normal_fan_out(key, shape, dtype=jnp.float32):
    """torch kaiming_normal_(mode='fan_out', nonlinearity='relu') for a conv
    weight in torch layout [out_ch, in_ch, kh, kw]: std = sqrt(2 / fan_out)
    with fan_out = out_ch * kh * kw (/root/reference/models/vit.py:231)."""
    out_ch, _, kh, kw = shape
    fan_out = out_ch * kh * kw
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, shape, dtype) * std
