"""No positional encoding — baseline
(/root/reference/models/positional_encoding.py:5-21)."""

from vit_rpe_rope_tpu.configs import PE_KIND_NONE

KIND = PE_KIND_NONE


def init_params(key, cfg):
    del key, cfg
    return {}


def buffers(cfg):
    del cfg
    return {}
