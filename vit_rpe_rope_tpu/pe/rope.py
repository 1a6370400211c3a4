"""RoPE frequency generators: axial (fixed) and mixed (learnable per-head)
(/root/reference/models/positional_encoding.py:173-351).

Shared geometry: tokens are a flattened square grid; for flat index t,
t_x = t % w (column) and t_y = t // w (row)
(/root/reference/models/positional_encoding.py:199-214). All PE paths assume a
square grid (SURVEY.md Q7) — asserted loudly here.

This module re-exports the two variants as `axial` and `mixed` submodules.
"""

from vit_rpe_rope_tpu.pe import rope_axial as axial  # noqa: F401
from vit_rpe_rope_tpu.pe import rope_mixed as mixed  # noqa: F401
