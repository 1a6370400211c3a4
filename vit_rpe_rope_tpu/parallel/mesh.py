"""Device mesh construction for SPMD training.

The reference has no distribution layer at all (single process, single device
— SURVEY.md §2 #20, §5.8). The TPU-native equivalent is a jax.sharding.Mesh
over ICI with shard_map: data parallelism along the 'data' axis (gradient
all-reduce via lax.psum — XLA lowers it to an ICI all-reduce, the TPU-native
NCCL), with a 'model' axis reserved for tensor parallelism.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"
PIPE_AXIS = "pipe"


def make_mesh(batch_size: int | None = None, num_devices: int | None = None,
              model_parallel: int = 1, devices=None,
              seq_parallel: int = 1, pipe_parallel: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh — or, when non-data strategies
    compose, a 3- or 4-axis mesh:

      * seq_parallel > 1 AND model_parallel > 1 →
        ('data', 'seq', 'model') — KV ring over 'seq' × Megatron sharding
        over 'model' (parallel/tp_cp.py);
      * pipe_parallel > 1 AND model_parallel > 1 →
        ('data', 'pipe', 'model') — pipeline stages over 'pipe' × Megatron
        sharding over 'model' (parallel/pp_tp.py);
      * pipe_parallel > 1 AND seq_parallel > 1 →
        ('data', 'pipe', 'seq', 'model') — the full 4-axis composition
        (parallel/pp_tp_cp.py), with 'model' possibly size 1 (lone PP×CP).

    'model' is fastest-varying so TP's two-psums-per-block ride adjacent
    ICI links; the seq ring hops at stride TP, and the pipeline's
    once-per-tick shift crosses the slowest links (Megatron axis-ordering
    convention — collective frequency matched to link speed). A LONE seq or
    pipe strategy keeps the 2-axis ('data', 'model') mesh with its shards
    on 'model' (the callers pass the stage/shard count as model_parallel in
    that case).

    Uses as many devices as divide evenly into both the device count and the
    (per-step global) batch size, so every shard gets identical static shapes.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = num_devices or len(devices)
    n = min(n, len(devices))
    model_total = model_parallel * seq_parallel * pipe_parallel
    if n % model_total != 0:
        raise ValueError(
            f"device count {n} not divisible by model_parallel="
            f"{model_parallel} × seq_parallel={seq_parallel} × "
            f"pipe_parallel={pipe_parallel}")
    n_data = n // model_total
    if batch_size is not None:
        n_data = math.gcd(n_data, batch_size)
    n_use = n_data * model_total
    if n_use < n:
        import warnings

        warnings.warn(
            f"make_mesh: using {n_use} of {n} devices — batch_size="
            f"{batch_size} is not divisible by the {n // model_total}"
            f"-way data axis (shards need identical static shapes). Pick a "
            f"batch size divisible by the device count to use all devices.",
            stacklevel=2)
    if seq_parallel > 1 and pipe_parallel > 1:
        arr = np.array(devices[:n_use]).reshape(
            n_data, pipe_parallel, seq_parallel, model_parallel)
        return Mesh(arr, (DATA_AXIS, PIPE_AXIS, SEQ_AXIS, MODEL_AXIS))
    if seq_parallel > 1 and model_parallel > 1:
        arr = np.array(devices[:n_use]).reshape(n_data, seq_parallel,
                                                model_parallel)
        return Mesh(arr, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))
    if pipe_parallel > 1 and model_parallel > 1:
        arr = np.array(devices[:n_use]).reshape(n_data, pipe_parallel,
                                                model_parallel)
        return Mesh(arr, (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))
    arr = np.array(devices[:n_use]).reshape(n_data, model_total)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def psum_identity_bwd(x, axis_name: str):
    """psum whose TRANSPOSE is the identity — for reducing genuine partial
    sums (tensor-parallel activations) inside differentiated code under
    shard_map without replication checking, where plain lax.psum would
    transpose to another psum and over-scale cotangents by the axis size.

    Forward: y = psum(x). Backward: the downstream computation of y is
    replicated across `axis_name`, so its cotangent is identical on every
    shard and d y / d x_i = 1 -> each shard's cotangent is just g.
    """
    import functools

    @functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
    def _psum(x, axis):
        return jax.lax.psum(x, axis)

    def _fwd(x, axis):
        return jax.lax.psum(x, axis), None

    def _bwd(axis, _, g):
        return (g,)

    _psum.defvjp(_fwd, _bwd)
    return _psum(x, axis_name)


def identity_fwd_psum_bwd(x, axis_name: str):
    """The conjugate of psum_identity_bwd (Megatron's "f" operator): identity
    forward, psum-over-`axis_name` backward. Placed where a REPLICATED
    activation enters model-parallel compute — each shard's backward only
    carries its own heads'/rows' contribution, so the input cotangent must be
    summed across the model axis to be full (and replicated) again."""
    import functools

    @functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
    def _ident(x, axis):
        del axis
        return x

    def _fwd(x, axis):
        del axis
        return x, None

    def _bwd(axis, _, g):
        return (jax.lax.psum(g, axis),)

    _ident.defvjp(_fwd, _bwd)
    return _ident(x, axis_name)


def shard_map(fn, mesh, in_specs, out_specs, check_rep=False):
    """Thin wrapper over jax.shard_map (API moved across jax versions)."""
    try:
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
    except TypeError:
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=check_rep)
