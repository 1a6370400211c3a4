"""vit_rpe_rope_tpu — TPU-native (JAX/XLA/Pallas/shard_map) rebuild of the
zhengyk19/vit-rpe-rope ViT positional-encoding testbed.

Layer map (SURVEY.md §1):
  cli/       — argparse entry points (flag-for-flag clone of the reference CLIs)
  models/    — pure-functional ViT (params pytree + apply fn)
  pe/        — positional-encoding strategy registry (6 strategies)
  ops/       — attention kernels (jnp oracle + Pallas fused flash attention)
  parallel/  — device mesh + shard_map SPMD training step
  data/      — dataset decoding + on-device pipeline
  train/     — loss/optimizer/schedule + host training loop
  utils/     — checkpointing (reference-compatible logical keys), CSV logging
"""

__version__ = "0.1.0"
