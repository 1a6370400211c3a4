"""Fused multi-tensor AdamW as Pallas kernels (apex-style).

Per-leaf optax updates on a ~100-leaf params dict fragment into hundreds of
tiny TPU kernels. This runs AdamW for MANY leaves inside a handful of Pallas
programs: leaves are packed into groups bounded by a VMEM budget and each
group is one pallas_call whose kernel updates every leaf (param, grad, mu,
nu refs per leaf; lr and bias-correction scalars prefetched via SMEM).

Measured reality at ViT-tiny scale (v5e-1): the dict driver with this kernel
lands at the same ~5.5 ms/step as the flat-vector driver — the residual step
cost is scan-carry copies and fwd/bwd fusion granularity, not the optimizer.
Kept as a first-class component (it removes the per-leaf optimizer kernels
and matches optax to 1e-8) and as the building block for a future
block-fused training step.

Math is exactly torch/optax AdamW (decoupled weight decay on ALL params,
bias-corrected moments):
    mu    <- b1·mu + (1-b1)·g
    nu    <- b2·nu + (1-b2)·g²
    p     <- p − lr·( (mu/(1−b1^t)) / (sqrt(nu/(1−b2^t)) + eps) + wd·p )
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-group VMEM budget: 4 live arrays per leaf (p, g, mu, nu) + 3 outputs,
# double-buffered by the pipeline — keep the raw group small.
GROUP_BYTES = 1 * 1024 * 1024


def _group_keys(template: dict):
    groups, cur, cur_bytes = [], [], 0
    for key in template:
        nbytes = int(template[key].size) * 4
        if cur and cur_bytes + nbytes > GROUP_BYTES:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(key)
        cur_bytes += nbytes
    if cur:
        groups.append(cur)
    return groups


def _adamw_kernel(n_leaves, b1, b2, eps, wd, scalars_ref, *refs):
    """refs = [p_0..p_{n-1}, g_0.., mu_0.., nu_0.., out_p_0.., out_mu_0..,
    out_nu_0..]; scalars = [lr, c1, c2] (bias corrections 1−b^t computed
    outside — Mosaic has no powf with a traced exponent)."""
    lr = scalars_ref[0]
    c1 = scalars_ref[1]
    c2 = scalars_ref[2]
    ps = refs[:n_leaves]
    gs = refs[n_leaves:2 * n_leaves]
    mus = refs[2 * n_leaves:3 * n_leaves]
    nus = refs[3 * n_leaves:4 * n_leaves]
    out_p = refs[4 * n_leaves:5 * n_leaves]
    out_mu = refs[5 * n_leaves:6 * n_leaves]
    out_nu = refs[6 * n_leaves:7 * n_leaves]
    for i in range(n_leaves):
        g = gs[i][...]
        p = ps[i][...]
        mu = b1 * mus[i][...] + (1.0 - b1) * g
        nu = b2 * nus[i][...] + (1.0 - b2) * g * g
        update = (mu / c1) / (jnp.sqrt(nu / c2) + eps) + wd * p
        out_p[i][...] = p - lr * update
        out_mu[i][...] = mu
        out_nu[i][...] = nu


def make_fused_adamw(template: dict, schedule, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=0.01):
    """Returns (init, update) with an optax-like contract over a params DICT:

        state = init(params)                       # (mu, nu, count)
        params, state = update(grads, state, params)

    Off-TPU the kernels run in interpret mode (tests).
    """
    groups = _group_keys(template)

    def init(params):
        zeros = {k: jnp.zeros_like(v) for k, v in params.items()}
        return (zeros, {k: jnp.zeros_like(v) for k, v in params.items()},
                jnp.zeros((), jnp.int32))

    def update(grads, state, params):
        mu, nu, count = state
        count = count + 1
        lr = schedule(count - 1)  # optax convention: lr of the pre-inc count
        t = count.astype(jnp.float32)
        scalars = jnp.stack([
            jnp.asarray(lr, jnp.float32),
            1.0 - b1 ** t,
            1.0 - b2 ** t,
        ])
        interpret = jax.default_backend() != "tpu"
        new_p, new_mu, new_nu = dict(params), dict(mu), dict(nu)
        for keys in groups:
            n = len(keys)
            kernel = functools.partial(
                _adamw_kernel, n, b1, b2, eps, weight_decay)
            # 2-D views keep Mosaic layouts happy for 1-D leaves.
            def v2(x):
                return x.reshape(1, -1) if x.ndim < 2 else x
            inputs = ([v2(params[k]) for k in keys]
                      + [v2(grads[k]) for k in keys]
                      + [v2(mu[k]) for k in keys]
                      + [v2(nu[k]) for k in keys])
            outs = pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(1,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                              for _ in inputs],
                    out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                               for _ in range(3 * n)],
                ),
                out_shape=[jax.ShapeDtypeStruct(v2(params[k]).shape,
                                                params[k].dtype)
                           for k in keys] * 3,
                interpret=interpret,
            )(scalars, *inputs)
            for i, k in enumerate(keys):
                shape = params[k].shape
                new_p[k] = outs[i].reshape(shape)
                new_mu[k] = outs[n + i].reshape(shape)
                new_nu[k] = outs[2 * n + i].reshape(shape)
        return new_p, (new_mu, new_nu, count)

    return init, update
