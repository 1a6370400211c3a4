"""Positional-encoding strategy registry.

The reference wires PE modules into the model through a duck-typed protocol
(forward / get_bias / get_freqs_cis — SURVEY.md §2.3). Here each strategy is a
module exposing a uniform functional interface:

    KIND                      one of configs.PE_KIND_* (how it plugs in)
    init_params(key, cfg)     -> flat dict of trainables, keys "pos_embed.*"
    buffers(cfg)              -> flat dict of non-trainable state_dict entries
                                 (reference registers these as torch buffers;
                                  we persist them for checkpoint parity, Q9)

and kind-specific generators:

    additive:  add_embedding(params, x)            x: [B, L, E]
    bias:      attn_bias(params, cfg)              -> [H, L, L] float32
    rotary:    freqs_cis(params, cfg)              -> (cos, sin)
               axial: [S, D/2]   mixed: [H, S, D/2]   (S = num_patches)
"""

from __future__ import annotations

from vit_rpe_rope_tpu.pe import absolute, none, polynomial, relative, rope

REGISTRY = {
    "none": none,
    "absolute": absolute,
    "relative": relative,
    "polynomial": polynomial,
    "rope-axial": rope.axial,
    "rope-mixed": rope.mixed,
}


def get(name: str):
    try:
        return REGISTRY[name]
    except KeyError:
        raise ValueError(f"Unknown positional encoding type: {name}") from None
