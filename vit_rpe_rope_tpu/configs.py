"""Frozen config dataclasses mirroring the reference argparse surface.

The reference configures everything through argparse flags
(/root/reference/train.py:20-56); we mirror those flags onto hashable frozen
dataclasses so they can be closed over by jit'd functions (static arguments).
"""

from __future__ import annotations

import dataclasses

# PE strategy names, matching the reference CLI choices verbatim
# (/root/reference/train.py:33-34).
PE_CHOICES = ("none", "absolute", "relative", "polynomial", "rope-axial", "rope-mixed")

# Taxonomy of how a PE strategy interacts with the model (SURVEY.md §2.3):
# the de-facto duck-typed protocol of the reference, formalized as an enum.
PE_KIND_NONE = "none"                 # no positional information
PE_KIND_EMBED_ADDITIVE = "additive"   # added to patch embeddings before blocks
PE_KIND_LOGITS_BIAS = "bias"          # [H, L, L] bias added to attention logits
PE_KIND_QK_ROTATION = "rotary"        # (cos, sin) rotation applied to q/k


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Model architecture config (reference: VisionTransformer kwargs,
    /root/reference/models/vit.py:148-151)."""

    img_size: int = 32
    patch_size: int = 4
    in_chans: int = 3
    num_classes: int = 10
    embed_dim: int = 192
    depth: int = 6
    num_heads: int = 6
    mlp_ratio: float = 4.0
    pos_encoding: str = "absolute"
    rope_theta: float = 100.0
    poly_degree: int = 3
    poly_shared_heads: bool = True
    # Regularization knobs, constructor-parity with the reference
    # (/root/reference/models/vit.py:28,110-115 accepts drop_rate /
    # attn_drop_rate and instantiates DropPath). Note the reference never
    # actually forwards them into its blocks (Block(embed_dim, num_heads,
    # mlp_ratio) at vit.py:200 drops them), so its effective rates are always
    # 0 (SURVEY.md Q11); here they are functional. Placement when nonzero
    # matches where the reference modules would apply them: attn_drop on the
    # softmax probabilities, drop (proj_drop/Mlp drop) after attn-proj and
    # after each MLP linear, drop_path on each residual branch per sample.
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    # Reference RoPE-Mixed reinterprets the [H, S, D/2] phase tensor through a
    # .view(S, H, -1).permute(1, 0, 2), scrambling (head, position) when H != S
    # (/root/reference/models/positional_encoding.py:337-342; SURVEY.md Q1).
    # Default False = clean einsum semantics; True reproduces the reference
    # memory reinterpretation for checkpoint-level parity.
    rope_mixed_compat_scramble: bool = False
    layer_norm_eps: float = 1e-5  # torch nn.LayerNorm default
    # Attention implementation: "reference" = unfused jnp path (XLA-fused),
    # "flash" = Pallas fused kernel, "auto" = fastest measured (see
    # models.vit._attention_impl).
    attention_impl: str = "auto"
    # Compute dtype for activations inside blocks ("float32" or "bfloat16").
    # Params and softmax statistics stay float32 either way.
    compute_dtype: str = "float32"
    # Rematerialize each block in the backward pass (jax.checkpoint):
    # trades ~1 extra forward of FLOPs for O(depth) less activation memory
    # — for scaling past HBM limits (ViT-S @224 and beyond).
    remat: bool = False
    # Remat selectivity: "full" recomputes the whole block; "dots" saves
    # matmul outputs and recomputes only elementwise/LN work
    # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable) — most of
    # full remat's memory saving at a fraction of its recompute cost;
    # "softmax" saves EVERYTHING except the f32 [B, H, N, N] attention
    # softmax intermediates (tagged in ops/reference_attention.py) — those
    # are the dense regime's dominant residual HBM traffic, and the exp/
    # normalize chain recomputes from the saved logits for almost free.
    remat_policy: str = "full"

    def __post_init__(self):
        if self.pos_encoding not in PE_CHOICES:
            raise ValueError(
                f"Unknown positional encoding type: {self.pos_encoding}"
            )
        if self.img_size % self.patch_size != 0:
            raise ValueError("img_size must be divisible by patch_size")
        if self.embed_dim % self.num_heads != 0:
            raise ValueError("embed_dim must be divisible by num_heads")
        if self.pos_encoding in ("rope-axial", "rope-mixed"):
            # Axial RoPE splits head_dim into 4 bands (x/y × re/im); the
            # reference implicitly requires this (SURVEY.md Q4).
            if self.head_dim % 4 != 0:
                raise ValueError(
                    "RoPE variants require head_dim divisible by 4; got "
                    f"head_dim={self.head_dim}"
                )
        if self.remat_policy not in ("full", "dots", "softmax"):
            raise ValueError(
                f"remat_policy must be 'full', 'dots' or 'softmax'; got "
                f"{self.remat_policy!r}")
        for name in ("drop_rate", "attn_drop_rate", "drop_path_rate"):
            rate = getattr(self, name)
            if not 0.0 <= rate < 1.0:
                raise ValueError(f"{name} must be in [0, 1); got {rate}")

    @property
    def has_dropout(self) -> bool:
        return (self.drop_rate > 0.0 or self.attn_drop_rate > 0.0
                or self.drop_path_rate > 0.0)

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def seq_len(self) -> int:
        """Token count including the cls token."""
        return self.num_patches + 1

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def mlp_hidden_dim(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training loop config (reference: train.py flags + main(),
    /root/reference/train.py:24-56,194-196)."""

    dataset: str = "mnist"
    batch_size: int = 128
    epochs: int = 25
    lr: float = 1e-3
    weight_decay: float = 0.01
    log_dir: str = "logs"
    ckpt_dir: str = "checkpoints"
    data_dir: str = "./data"
    seed: int = 0
    # Extensions beyond the reference surface (documented divergences):
    synthetic_data: bool = False   # procedural dataset when real data absent
    profile_dir: str | None = None  # jax.profiler trace output (SURVEY.md §5.1)
    debug_nans: bool = False        # jax_debug_nans sanitizer (SURVEY.md §5.2)
    resume: bool = False            # continue from the last-state checkpoint
    save_last: bool = True          # write {..}_last.npz each epoch (resume)
    # On-device augmentation (random flip + 4px pad-and-crop). OFF by
    # default: the reference has none (SURVEY.md Q11).
    augment: bool = False
    # Train steps fused into one dispatch via lax.scan (0 = auto: a divisor
    # of steps-per-epoch ≤ 32 on TPU, 1 on CPU). Removes per-step host
    # dispatch overhead.
    steps_per_dispatch: int = 0
    # Tensor parallelism degree: shard attention heads / MLP hidden over the
    # mesh's 'model' axis (parallel/tensor_parallel.py). 1 = pure DP.
    model_parallel: int = 1
    # ZeRO stage 1: shard the optimizer moments over the data axis (each
    # chip keeps 1/n_data of the Adam state; updated params ride one tiled
    # all_gather over ICI). Elementwise-identical trajectory. Composes with
    # model_parallel (per-model-shard flat vectors) and with
    # sequence_parallel (moments sharded over the full data × seq product);
    # incompatible with pipeline parallelism.
    zero1: bool = False
    # Sequence/context parallelism degree: shard tokens over a mesh axis
    # and run attention as a KV ring over ICI
    # (parallel/context_parallel.py). 1 = no token sharding. COMPOSES with
    # model_parallel (3-axis data × seq × model mesh — parallel/tp_cp.py)
    # and with pipeline_parallel (4-axis data × pipe × seq × model mesh —
    # parallel/pp_tp_cp.py).
    sequence_parallel: int = 1
    # Pipeline parallelism degree: stage the blocks over a mesh axis with a
    # GPipe microbatch schedule (parallel/pipeline_parallel.py). COMPOSES
    # with model_parallel (3-axis data × pipe × model mesh —
    # parallel/pp_tp.py) and with sequence_parallel (4-axis mesh —
    # parallel/pp_tp_cp.py).
    pipeline_parallel: int = 1
    # Microbatches per device batch under pipeline parallelism
    # (0 = auto: the stage count — the minimum that fills the pipe).
    pp_microbatches: int = 0
    # Gradient accumulation: each optimizer step accumulates this many
    # consecutive batches (effective batch = batch_size × grad_accum) with
    # per-microbatch fwd+bwd, so activation memory stays one batch. The
    # update is bit-comparable to one step on the concatenated batch.
    grad_accum: int = 1
    # Bounded-program stepping (train/bounded.py): > 0 slices each train
    # step into many short single-device programs — the attention runs
    # q_chunk query rows per program — for environments with a per-program
    # execution deadline and for remat-free explicit residency at very
    # long N. 0 = monolithic step (default). Composes with data/sequence
    # parallelism (per-chunk KV ring) and with grad_accum (host-
    # accumulated micro-rows); incompatible with model/pipeline
    # parallelism, zero1, and augment.
    q_chunk: int = 0
    # With q_chunk: also segment the KEY axis of the backward at the host
    # level (kv_chunk keys per program) — bounds dk/dv gradient residency
    # by the segment size (the N=2M single-chip regime needs it). 0 = the
    # backward sees all keys per program.
    kv_chunk: int = 0

    def __post_init__(self):
        if self.dataset not in ("mnist", "cifar10"):
            raise ValueError(f"Unknown dataset: {self.dataset}")
        if self.model_parallel < 1:
            raise ValueError(
                f"model_parallel must be >= 1; got {self.model_parallel}")
        if self.sequence_parallel < 1:
            raise ValueError(
                f"sequence_parallel must be >= 1; got {self.sequence_parallel}")
        if self.pipeline_parallel < 1:
            raise ValueError(
                f"pipeline_parallel must be >= 1; got {self.pipeline_parallel}")
        if self.grad_accum < 1:
            raise ValueError(
                f"grad_accum must be >= 1; got {self.grad_accum}")
        if self.pp_microbatches < 0:
            raise ValueError(
                f"pp_microbatches must be >= 0 (0 = auto); got "
                f"{self.pp_microbatches}")
        if self.zero1 and self.pipeline_parallel > 1:
            raise ValueError(
                "zero1 is incompatible with pipeline parallelism > 1 (PP "
                "moments live per-stage with the stacked block params; a "
                "data-axis re-shard of those is not implemented); it "
                "composes with data parallelism (flat-vector driver), "
                "with model_parallel (per-model-shard flat vectors — "
                "train_step.make_tp_train_step(zero1=True)) and with "
                "sequence_parallel (moments sharded over the full "
                "data × seq device product — make_cp_train_step)")
        if self.zero1 and self.sequence_parallel > 1 \
                and self.model_parallel > 1:
            raise ValueError(
                "zero1 composes with sequence_parallel OR model_parallel, "
                "not the 3-axis product (the TP×CP driver keeps a "
                "replicated optimizer)")
        if self.q_chunk < 0:
            raise ValueError(f"q_chunk must be >= 0; got {self.q_chunk}")
        if self.kv_chunk < 0:
            raise ValueError(f"kv_chunk must be >= 0; got {self.kv_chunk}")
        if self.kv_chunk > 0 and self.q_chunk == 0:
            raise ValueError("kv_chunk requires q_chunk > 0 "
                             "(bounded-program stepping)")
        if self.q_chunk > 0 and (self.model_parallel > 1
                                 or self.pipeline_parallel > 1
                                 or self.zero1 or self.augment):
            raise ValueError(
                "q_chunk (bounded-program stepping) composes with data and "
                "sequence parallelism (the per-chunk programs run a KV ring "
                "over the mesh — train/bounded.py) and with grad_accum "
                "(host-accumulated micro-rows) but not with model/pipeline "
                "parallelism, zero1, or augment")
        if self.q_chunk > 0 and self.kv_chunk > 0 \
                and self.sequence_parallel > 1:
            raise ValueError(
                "kv_chunk does not compose with sequence_parallel: the KV "
                "ring already bounds backward kv residency by the shard "
                "size N/R")

    @property
    def in_chans(self) -> int:
        return 1 if self.dataset == "mnist" else 3

    @property
    def num_classes(self) -> int:
        return 10


def cosine_lr_by_epoch(base_lr: float, epochs: int, steps_per_epoch: int):
    """torch CosineAnnealingLR(T_max=epochs) stepped once per epoch
    (/root/reference/train.py:196,205): the LR used throughout epoch e
    (0-indexed) is base_lr * (1 + cos(pi * e / T_max)) / 2, eta_min=0.

    Returns an optax-compatible schedule fn of the global step.
    """

    def schedule(step):
        import jax.numpy as jnp

        epoch = jnp.minimum(step // steps_per_epoch, epochs)
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / epochs))

    return schedule
