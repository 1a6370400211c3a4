"""Distribution layer: device meshes and the parallelism strategies.

The reference is single-process, single-device (SURVEY.md §2 #20, §5.8 —
no torch.distributed/NCCL anywhere); everything here is the TPU-native
extension built on jax.sharding.Mesh + shard_map with XLA collectives over
ICI:

* mesh.py               — ('data', 'model') mesh, exact-gradient custom-VJP
                          psum pairs (Megatron f/g operators)
* distributed.py        — multi-host bootstrap + per-host data staging (DCN)
* tensor_parallel.py    — TP: heads / MLP-hidden sharded (--model_parallel)
* context_parallel.py   — SP/CP: tokens sharded, ppermute KV-ring attention
                          (--sequence_parallel)
* pipeline_parallel.py  — PP: blocks staged, GPipe microbatch schedule
                          (--pipeline_parallel)
* tp_cp.py              — TP × CP composed on a 3-axis
                          ('data', 'seq', 'model') mesh
                          (--model_parallel with --sequence_parallel)
* pp_tp.py              — PP × TP composed on a 3-axis
                          ('data', 'pipe', 'model') mesh
                          (--pipeline_parallel with --model_parallel)

Data parallelism (psum gradient all-reduce) and ZeRO-1 optimizer-state
sharding live in train/train_step.py; gradient accumulation
(--grad_accum) composes with DP/ZeRO-1 and with TP/CP/TP×CP. Every
strategy composes with DP on the leading 'data' axis; TP additionally
composes with CP (tp_cp.py — width × tokens) and with PP (pp_tp.py —
depth × width). Only PP × CP has no composed mesh (it would need a
4th axis); configs.py rejects that pair.

Expert parallelism is deliberately ABSENT: the reference model family has no
mixture-of-experts layer (a ViT with a dense MLP — /root/reference/models/
vit.py:117), so there is no expert dimension to shard. If an MoE variant
ever lands, the 'model' axis and the psum/ppermute toolkit here are the
intended substrate.
"""
