"""Host-side training loop: reproduces the reference orchestrator's observable
behavior (/root/reference/train.py:157-219) — timestamped CSV with header
`epoch,train_loss,train_acc,test_loss,test_acc,best_acc`, tqdm progress bars,
per-epoch stdout summary, best-accuracy checkpoint named
{ckpt_dir}/{dataset}_{pos_encoding}_best.* — on top of the SPMD step.

Metric semantics match the reference exactly: epoch train/test loss is the
MEAN OF BATCH-MEAN losses (total_loss / len(loader), /root/reference/
train.py:125,155); accuracy is 100 · correct / total examples. Metrics stay
on device during the epoch (one host sync per epoch, not per batch —
SURVEY.md §3.1), with a throttled tqdm postfix for live feedback.
"""

from __future__ import annotations

import csv
import os
import time
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig
from vit_rpe_rope_tpu.data import datasets
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.parallel import context_parallel as cp
from vit_rpe_rope_tpu.parallel import pipeline_parallel as pp_mod
from vit_rpe_rope_tpu.parallel import tensor_parallel as tp
from vit_rpe_rope_tpu.parallel.mesh import DATA_AXIS, NamedSharding, P, make_mesh
from vit_rpe_rope_tpu.train import train_step as ts
from vit_rpe_rope_tpu.utils import checkpoint
from vit_rpe_rope_tpu.utils.flatten import Flattener

POSTFIX_EVERY = 50  # tqdm postfix refresh period (forces a small host sync)


def _run_epoch(step_fn, state, data_x, data_y, epoch_idx, desc, train: bool,
               k: int = 1, epoch: int = 0):
    """Drive one epoch; returns (state, avg_batch_loss, accuracy_pct,
    images_per_sec). Metrics accumulate as device arrays; one sync at end.
    k > 1 = multi-step dispatches (step_fn built by make_train_multi_step;
    epoch_idx already padded to a multiple of k). The epoch number rides in
    step_arr[1] so per-step PRNG keys (augmentation/dropout) differ across
    epochs."""
    steps = epoch_idx.shape[0]
    metrics = []
    # The in-process CPU collective backend deadlocks (rendezvous timeout)
    # when several sharded programs are in flight on fewer cores than virtual
    # devices: spin-waiting device threads starve the rest. Serialize steps
    # on CPU; on TPU keep the fully asynchronous dispatch pipeline.
    serialize = jax.default_backend() == "cpu"
    t0 = time.perf_counter()
    pbar = tqdm(range(0, steps, k), desc=desc, leave=False)
    for s in pbar:
        step_arr = jnp.asarray([s, epoch], jnp.int32)
        if train:
            params, opt_state, m = step_fn(
                state[0], state[1], step_arr, data_x, data_y, epoch_idx)
            state = (params, opt_state)
        else:
            m = step_fn(state[0], step_arr, data_x, data_y, epoch_idx)
        if serialize:
            m.block_until_ready()
        metrics.append(m if m.ndim == 2 else m[None])
        if (s // k) % POSTFIX_EVERY == 0 and s > 0:
            stacked = np.asarray(jnp.concatenate(metrics[:-1]))  # older values
            seen = max(stacked[:, 2].sum(), 1)
            # Reference tqdm quirk preserved: the LIVE postfix divides the
            # SUM OF BATCH-MEAN losses by the SAMPLE count
            # (/root/reference/train.py:118,123) while the returned epoch
            # loss divides it by the BATCH count (train.py:125).
            pbar.set_postfix(
                loss=float(stacked[:, 0].sum() / seen),
                acc=100.0 * stacked[:, 1].sum() / seen,
            )
    stacked = np.asarray(jnp.concatenate(metrics))
    # Drop fully-padded trailing steps (count == 0) so the reference's
    # mean-of-batch-means denominator stays exact.
    stacked = stacked[stacked[:, 2] > 0]
    dt = time.perf_counter() - t0
    total = stacked[:, 2].sum()
    avg_loss = float(stacked[:, 0].mean())  # mean of batch means (reference)
    acc = 100.0 * float(stacked[:, 1].sum()) / max(float(total), 1.0)
    return state, avg_loss, acc, float(total) / dt


def fit(cfg: ViTConfig, tcfg: TrainConfig, verbose: bool = True) -> dict:
    """Full training run. Returns a summary dict (best_acc, csv path, ...)."""
    if tcfg.debug_nans:
        jax.config.update("jax_debug_nans", True)

    os.makedirs(tcfg.log_dir, exist_ok=True)
    os.makedirs(tcfg.ckpt_dir, exist_ok=True)
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    log_file = f"{tcfg.log_dir}/{tcfg.dataset}_{cfg.pos_encoding}_{timestamp}.csv"
    with open(log_file, "w", newline="") as f:
        csv.writer(f).writerow(
            ["epoch", "train_loss", "train_acc", "test_loss", "test_acc",
             "best_acc"])

    bundle = datasets.get_dataset(
        tcfg.dataset, tcfg.data_dir, tcfg.synthetic_data, tcfg.seed)
    # TP COMPOSES with CP on a 3-axis ('data', 'seq', 'model') mesh
    # (parallel/tp_cp.py) and with PP on ('data', 'pipe', 'model')
    # (parallel/pp_tp.py); CP and PP do not compose (configs.py rejects
    # it). A lone CP or PP run keeps the 2-axis mesh with its shards on
    # 'model' (make_mesh folds them into it).
    # Bounded-program stepping (q_chunk > 0) composes with data and
    # sequence parallelism: the lone-seq convention folds the token shards
    # onto 'model', and the bounded driver runs its per-chunk KV ring over
    # the resulting ('data', 'model') mesh (train/bounded.py). kv_chunk
    # (host-level kv segmentation) stays single-device — the ring bounds
    # kv residency instead.
    use_bounded = tcfg.q_chunk > 0
    use_pptpcp = (tcfg.pipeline_parallel > 1 and tcfg.sequence_parallel > 1)
    use_pptp = (tcfg.pipeline_parallel > 1 and tcfg.model_parallel > 1
                and not use_pptpcp)
    explicit_pipe = use_pptp or use_pptpcp
    mesh = make_mesh(batch_size=tcfg.batch_size,
                     num_devices=(1 if use_bounded and tcfg.kv_chunk > 0
                                  else None),
                     model_parallel=(tcfg.model_parallel if explicit_pipe
                                     else max(tcfg.model_parallel,
                                              tcfg.pipeline_parallel)),
                     seq_parallel=tcfg.sequence_parallel,
                     pipe_parallel=(tcfg.pipeline_parallel
                                    if explicit_pipe else 1))
    use_tpcp = (tcfg.model_parallel > 1 and tcfg.sequence_parallel > 1
                and not use_pptpcp)
    use_tp = tcfg.model_parallel > 1 and not (use_tpcp or use_pptp
                                              or use_pptpcp)
    use_cp = (tcfg.sequence_parallel > 1 and not use_tpcp
              and not use_bounded and not use_pptpcp)
    use_pp = tcfg.pipeline_parallel > 1 and not (use_pptp or use_pptpcp)
    if (use_cp or use_pp or use_tpcp or use_pptp or use_pptpcp) \
            and cfg.has_dropout:
        raise ValueError("sequence_parallel/pipeline_parallel do not support "
                         "dropout rates > 0")
    n_micro = tcfg.pp_microbatches or tcfg.pipeline_parallel
    if use_pp or use_pptp or use_pptpcp:
        if cfg.depth % tcfg.pipeline_parallel != 0:
            raise ValueError(
                f"pipeline_parallel={tcfg.pipeline_parallel} must divide "
                f"depth={cfg.depth}")
        local_bs = tcfg.batch_size // mesh.shape[DATA_AXIS]
        if local_bs % n_micro != 0:
            raise ValueError(
                f"per-device batch {local_bs} not divisible by "
                f"pp_microbatches={n_micro}")
    if cfg.attn_drop_rate > 0 and cfg.seq_len > 2048:
        import warnings

        warnings.warn(
            "attn_drop_rate > 0 materializes the attention probabilities "
            f"(the dropout mask lives on them), so at seq_len={cfg.seq_len} "
            "the streaming flash path is bypassed and each block allocates "
            "O(B*H*N^2) memory", stacklevel=2)
    if ((use_tp or use_tpcp or use_pptp or use_pptpcp)
            and cfg.num_heads % tcfg.model_parallel != 0):
        raise ValueError(
            f"model_parallel={tcfg.model_parallel} must divide "
            f"num_heads={cfg.num_heads}")
    replicated = NamedSharding(mesh, P())
    idx_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    train_x = jax.device_put(bundle.train_x, replicated)
    train_y = jax.device_put(bundle.train_y, replicated)
    test_x = jax.device_put(bundle.test_x, replicated)
    test_y = jax.device_put(bundle.test_y, replicated)

    # Index ROWS per epoch (one row = one batch of batch_size examples);
    # grad_accum > 1 folds `accum` consecutive rows into one optimizer step.
    accum = tcfg.grad_accum
    if accum > 1 and (use_pp or use_pptp):
        raise ValueError("grad_accum > 1 is not supported with pipeline "
                         "parallelism (use --pp_microbatches — PP already "
                         "microbatches within the step)")
    rows_per_epoch = -(-len(bundle.train_y) // tcfg.batch_size)
    steps_per_epoch = -(-rows_per_epoch // accum)  # optimizer steps
    preprocess = ts.make_preprocess(
        cfg, bundle.mean, bundle.std, bundle.train_x.shape[1],
        augment=tcfg.augment)
    eval_preprocess = ts.make_preprocess(
        cfg, bundle.mean, bundle.std, bundle.train_x.shape[1])
    tx = ts.make_optimizer(tcfg, steps_per_epoch)

    key = jax.random.PRNGKey(tcfg.seed)
    key, init_key = jax.random.split(key)
    params = jax.device_put(vit.init_params(init_key, cfg), replicated)

    k = tcfg.steps_per_dispatch
    if k == 0:  # auto: fuse dispatches on TPU, stay per-step on CPU
        # A divisor of steps_per_epoch needs no padded no-op steps, letting
        # the fused driver drop its live-guard state selects.
        k = (ts.pick_steps_per_dispatch(steps_per_epoch)
             if jax.default_backend() == "tpu" else 1)
    if use_bounded:
        k = 1  # the bounded driver is host-scheduled; dispatches don't fuse
    k = max(1, min(k, steps_per_epoch))
    stride = k * accum  # index rows consumed per dispatch
    # The fused driver trains on a FLAT vector of DEPTH-STACKED params (one
    # contiguous optimizer update, lax.scan over blocks — ~100 per-leaf
    # kernels collapse to a handful); the reference-keyed dict stays the
    # interface for eval/checkpoints. TP keeps dict params (its shardings are
    # per-key) but still fuses k steps per dispatch via lax.scan. ZeRO-1
    # rides the flat driver (it shards the flat moment vectors).
    use_flat = ((k > 1 or tcfg.zero1 or accum > 1)
                and not use_tp and not use_cp and not use_pp
                and not use_tpcp and not use_pptp and not use_pptpcp
                and not use_bounded)
    zero1 = tcfg.zero1 and use_flat
    zero1_tp = tcfg.zero1 and use_tp  # ZeRO-1 x TP: per-model-shard vectors
    zero1_cp = tcfg.zero1 and use_cp  # ZeRO-1 x CP: data x seq moment shards
    zero1_shardings = None
    flattener = Flattener(vit.stack_block_params(params, cfg))
    flatten_j = jax.jit(
        lambda p: flattener.flatten(vit.stack_block_params(p, cfg)))
    unflatten_j = jax.jit(
        lambda v: vit.unstack_block_params(flattener.unflatten(v), cfg))
    if use_pptp or use_pptpcp:
        # PP×TP(×CP): train state is the depth-stacked dict of the TP-prepared
        # layout — "blocks.X" leaves sharded over 'pipe' (dim 0) and their
        # TP dim over 'model' (parallel/pp_tp.py); eval/checkpoints see the
        # reference layout via gather_j (all-gather + unstack + un-reshape
        # on device).
        from vit_rpe_rope_tpu.parallel import pp_tp

        pptp_specs = pp_tp.pp_tp_param_specs(
            vit.stack_block_params(tp.prepare_tp_params(params, cfg), cfg))
        pptp_shardings = {kk: NamedSharding(mesh, s)
                          for kk, s in pptp_specs.items()}
        prepare_j = jax.jit(
            lambda p: vit.stack_block_params(tp.prepare_tp_params(p, cfg),
                                             cfg),
            out_shardings=pptp_shardings)
        gather_j = jax.jit(
            lambda p: tp.restore_reference_params(
                vit.unstack_block_params(p, cfg), cfg),
            out_shardings=replicated)
        train_params = prepare_j(params)
        opt_state = jax.jit(tx.init)(train_params)  # inherits the shardings
    elif use_tp or use_tpcp:
        # Tensor parallelism: heads/MLP-hidden sharded over 'model'
        # (parallel/tensor_parallel.py). Train state lives in TP layout on
        # the mesh; eval/checkpoints see the reference layout via gather_j
        # (on-device reshape + all-gather, no host round-trip).
        param_specs = tp.tp_param_specs(tp.prepare_tp_params(params, cfg), cfg)
        tp_shardings = {kk: NamedSharding(mesh, s)
                        for kk, s in param_specs.items()}
        prepare_j = jax.jit(lambda p: tp.prepare_tp_params(p, cfg),
                            out_shardings=tp_shardings)
        gather_j = jax.jit(lambda p: tp.restore_reference_params(p, cfg),
                           out_shardings=replicated)
        train_params = prepare_j(params)
        if zero1_tp:
            opt_state, zero1_tp_specs, zero1_tp_flt = \
                ts.init_tp_zero1_opt_state(tx, cfg, mesh)
        else:
            opt_state = jax.jit(tx.init)(train_params)  # inherits TP shardings
    elif use_pp:
        # Pipeline parallelism: train state is the depth-stacked dict with
        # "blocks.X" leaves sharded over the stage axis
        # (parallel/pipeline_parallel.py); eval/checkpoints see the reference
        # layout via gather_j (all-gather + unstack on device).
        pp_specs = pp_mod.pp_param_specs(vit.stack_block_params(params, cfg))
        pp_shardings = {kk: NamedSharding(mesh, s)
                        for kk, s in pp_specs.items()}
        prepare_j = jax.jit(lambda p: vit.stack_block_params(p, cfg),
                            out_shardings=pp_shardings)
        gather_j = jax.jit(lambda p: vit.unstack_block_params(p, cfg),
                           out_shardings=replicated)
        train_params = prepare_j(params)
        opt_state = jax.jit(tx.init)(train_params)  # inherits PP shardings
    elif use_flat:
        train_params = jax.device_put(flatten_j(params), replicated)
        if zero1:
            opt_state, zero1_specs = ts.init_zero1_opt_state(
                tx, flattener, mesh)
            zero1_shardings = jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), zero1_specs,
                is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
        else:
            opt_state = jax.device_put(tx.init(train_params), replicated)
    elif zero1_cp:
        train_params = params
        opt_state, zero1_cp_specs, zero1_cp_flt = \
            ts.init_cp_zero1_opt_state(tx, cfg, mesh)
    else:
        train_params = params
        opt_state = jax.device_put(tx.init(train_params), replicated)

    # --- canonical on-disk optimizer form: ONE flat [total] vector per Adam
    # moment, whatever driver is active (dict / flat / zero1 / TP), so a run
    # can be resumed under a DIFFERENT driver (CPU<->TPU, --zero1 toggled,
    # --model_parallel changed). Moments are elementwise per-parameter state,
    # so the re-layout is exact.
    is_dict_node = lambda x: isinstance(x, dict)  # noqa: E731
    n_data = mesh.shape[DATA_AXIS]
    zero1_padded = ts.zero1_shard_size(flattener.total, n_data) * n_data
    if zero1_tp:
        # zero1 x TP moments are [T * padded_local] flat vectors laid out
        # model-major (train_step.init_tp_zero1_opt_state); the canonical
        # disk form stays the reference flat vector, so the conversions
        # reassemble / re-split the per-model-shard local flats.
        from vit_rpe_rope_tpu.parallel.mesh import MODEL_AXIS
        t_par = mesh.shape[MODEL_AXIS]
        z_padded_l = (ts.zero1_shard_size(zero1_tp_flt.total, n_data)
                      * n_data)
        z_tp_specs = tp.tp_param_specs(tp.prepare_tp_params(params, cfg),
                                       cfg)

        def _z_tp_dim(key):
            return next((i for i, ax in enumerate(z_tp_specs[key])
                         if ax == MODEL_AXIS), None)

        def _tpz_vec_to_prepared(vec):
            """[T*padded] moment vector -> prepared-layout moment dict."""
            arr = np.asarray(vec).reshape(t_par, z_padded_l)
            locs = [zero1_tp_flt.unflatten(v[:zero1_tp_flt.total])
                    for v in arr]
            out = {}
            for key in locs[0]:
                dim = _z_tp_dim(key)
                out[key] = (np.asarray(locs[0][key]) if dim is None
                            else np.concatenate(
                                [np.asarray(l[key]) for l in locs],
                                axis=dim))
            return out

        def _tpz_prepared_to_vec(prepared):
            """prepared-layout moment dict -> [T*padded] moment vector."""
            flats = []
            for m in range(t_par):
                loc = {}
                for key, a in prepared.items():
                    dim = _z_tp_dim(key)
                    loc[key] = (np.asarray(a) if dim is None else
                                np.split(np.asarray(a), t_par, axis=dim)[m])
                v = np.asarray(zero1_tp_flt.flatten(loc))
                flats.append(np.concatenate(
                    [v, np.zeros(z_padded_l - v.shape[0], v.dtype)]))
            return np.concatenate(flats)

    if zero1_cp:
        from vit_rpe_rope_tpu.parallel.mesh import MODEL_AXIS
        cp_n_sh = n_data * mesh.shape[MODEL_AXIS]
        cp_z_padded = ts.zero1_shard_size(zero1_cp_flt.total,
                                          cp_n_sh) * cp_n_sh

    def opt_to_disk(o):
        o = jax.device_get(o)
        if zero1_cp:  # [padded] vectors -> reference dicts, then generic
            o = jax.tree_util.tree_map(
                lambda l: zero1_cp_flt.unflatten(l[:zero1_cp_flt.total])
                if getattr(l, "ndim", 0) == 1 and l.shape[0] == cp_z_padded
                else l, o)
        if zero1_tp:  # [T*padded] vectors -> prepared dicts, then as use_tp
            o = jax.tree_util.tree_map(
                lambda l: _tpz_vec_to_prepared(l)
                if getattr(l, "ndim", 0) == 1
                and l.shape[0] == t_par * z_padded_l else l, o)
        if use_pp or use_pptp or use_pptpcp:  # stacked moment dicts -> reference-keyed
            o = jax.tree_util.tree_map(
                lambda n: vit.unstack_block_params(n, cfg)
                if isinstance(n, dict) else n, o, is_leaf=is_dict_node)
        if use_tp or use_tpcp or use_pptp or use_pptpcp:
            o = tp.restore_reference_opt_state(o, cfg)
        o = jax.tree_util.tree_map(
            lambda n: np.asarray(flatten_j(n)) if isinstance(n, dict) else n,
            o, is_leaf=is_dict_node)
        return jax.tree_util.tree_map(
            lambda l: l[:flattener.total]
            if getattr(l, "ndim", 0) == 1 and l.shape[0] == zero1_padded
            else l, o)

    def opt_from_disk(o):
        """Canonical (flat-moment) state -> this run's driver form, placed."""
        if use_flat:
            if zero1:
                o = jax.tree_util.tree_map(
                    lambda l: np.concatenate(
                        [l, np.zeros(zero1_padded - l.shape[0], l.dtype)])
                    if getattr(l, "ndim", 0) == 1
                    and l.shape[0] == flattener.total else l, o)
            return jax.device_put(
                o, zero1_shardings if zero1 else replicated)
        # vector moments -> reference-keyed dicts
        o = jax.tree_util.tree_map(
            lambda l: unflatten_j(l)
            if getattr(l, "ndim", 0) == 1 and l.shape[0] == flattener.total
            else l, o)
        if use_pptp or use_pptpcp:
            o = tp.prepare_tp_opt_state(o, cfg)  # qkv moments -> [3,H,Dh,E]
            o = jax.tree_util.tree_map(
                lambda n: vit.stack_block_params(n, cfg)
                if isinstance(n, dict) else n, o, is_leaf=is_dict_node)
            opt_shardings = jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s),
                ts.opt_specs_like(o, pptp_specs),
                is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
            return jax.device_put(o, opt_shardings)
        if zero1_tp:
            o = tp.prepare_tp_opt_state(jax.device_get(o), cfg)
            o = jax.tree_util.tree_map(
                lambda nn: _tpz_prepared_to_vec(nn)
                if isinstance(nn, dict) else nn, o, is_leaf=is_dict_node)
            return jax.device_put(o, jax.tree_util.tree_map(
                lambda sp: NamedSharding(mesh, sp), zero1_tp_specs,
                is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)))
        if use_tp or use_tpcp:
            opt_shardings = jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s),
                ts.opt_specs_like(o, param_specs),
                is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
            return jax.jit(lambda oo: tp.prepare_tp_opt_state(oo, cfg),
                           out_shardings=opt_shardings)(o)
        if use_pp:
            o = jax.tree_util.tree_map(
                lambda n: vit.stack_block_params(n, cfg)
                if isinstance(n, dict) else n, o, is_leaf=is_dict_node)
            opt_shardings = jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s),
                ts.opt_specs_like(o, pp_specs),
                is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
            return jax.device_put(o, opt_shardings)
        if zero1_cp:  # reference dicts -> padded flat moment vectors
            o = jax.tree_util.tree_map(
                lambda nn: np.concatenate(
                    [np.asarray(zero1_cp_flt.flatten(jax.device_get(nn))),
                     np.zeros(cp_z_padded - zero1_cp_flt.total, np.float32)])
                if isinstance(nn, dict) else nn, o, is_leaf=is_dict_node)
            return jax.device_put(o, jax.tree_util.tree_map(
                lambda sp: NamedSharding(mesh, sp), zero1_cp_specs,
                is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)))
        return jax.device_put(o, replicated)

    last_path = f"{tcfg.ckpt_dir}/{tcfg.dataset}_{cfg.pos_encoding}_last.npz"
    start_epoch, best_acc = 0, 0.0
    if tcfg.resume and os.path.exists(last_path):
        params, opt_loaded, start_epoch, best_acc = \
            checkpoint.load_train_state(last_path, opt_to_disk(opt_state))
        params = jax.device_put(params, replicated)
        opt_state = opt_from_disk(opt_loaded)
        if use_tp or use_pp or use_tpcp or use_pptp or use_pptpcp:
            train_params = prepare_j(params)
        else:
            train_params = flatten_j(params) if use_flat else params
        if verbose:
            print(f"Resumed from {last_path} at epoch {start_epoch} "
                  f"(best {best_acc:.2f}%)")

    if use_pptpcp:
        train_fn = ts.make_pp_tp_cp_train_step(
            cfg, tcfg, mesh, tx, preprocess, n_micro=n_micro, k=k,
            guard_padded_steps=(steps_per_epoch % k != 0))
    elif use_pptp:
        train_fn = ts.make_pp_tp_train_step(
            cfg, tcfg, mesh, tx, preprocess, n_micro=n_micro, k=k,
            guard_padded_steps=(steps_per_epoch % k != 0))
    elif use_tpcp:
        train_fn = ts.make_tp_cp_train_step(
            cfg, tcfg, mesh, tx, preprocess, k=k,
            guard_padded_steps=(steps_per_epoch % k != 0), accum=accum)
    elif use_tp:
        train_fn = ts.make_tp_train_step(
            cfg, tcfg, mesh, tx, preprocess, k=k,
            guard_padded_steps=(steps_per_epoch % k != 0), accum=accum,
            zero1=zero1_tp)
    elif use_cp:
        train_fn = ts.make_cp_train_step(
            cfg, tcfg, mesh, tx, preprocess, k=k,
            guard_padded_steps=(steps_per_epoch % k != 0), accum=accum,
            zero1=zero1_cp)
    elif use_pp:
        train_fn = ts.make_pp_train_step(
            cfg, tcfg, mesh, tx, preprocess, n_micro=n_micro, k=k,
            guard_padded_steps=(steps_per_epoch % k != 0))
    elif use_bounded:
        from vit_rpe_rope_tpu.train.bounded import make_bounded_step

        bounded_step = make_bounded_step(
            cfg, tcfg, tx, preprocess, q_chunk=tcfg.q_chunk,
            kv_chunk=tcfg.kv_chunk, mesh=mesh,
            seq_parallel=tcfg.sequence_parallel, grad_accum=accum)
        # The gathered batch is born batch-sharded over 'data' so the
        # bounded step's pieces never reshard it.
        dsh = NamedSharding(mesh, P(DATA_AXIS))
        gather_batch_j = jax.jit(ts._gather_batch,
                                 out_shardings=(dsh, dsh, dsh))
        if accum > 1:
            # grad_accum × bounded: one dispatch consumes `accum` index
            # rows as micro-batches behind a leading accumulation axis
            # (the 'data' sharding stays on the batch dim).
            adsh = NamedSharding(mesh, P(None, DATA_AXIS))

            def _gather_accum(data_x, data_y, epoch_idx, s):
                rows = jax.lax.dynamic_slice_in_dim(epoch_idx, s, accum,
                                                    axis=0)
                imgs, labels, mask = ts._gather_batch(data_x, data_y,
                                                      rows.reshape(-1))
                return (imgs.reshape(accum, -1, *imgs.shape[1:]),
                        labels.reshape(accum, -1),
                        mask.reshape(accum, -1))

            gather_accum_j = jax.jit(_gather_accum,
                                     out_shardings=(adsh, adsh, adsh))

        def train_fn(params, opt_state, step_arr, data_x, data_y, epoch_idx):
            if accum > 1:
                imgs, labels, mask = gather_accum_j(data_x, data_y,
                                                    epoch_idx, step_arr[0])
            else:
                imgs, labels, mask = gather_batch_j(data_x, data_y,
                                                    epoch_idx[step_arr[0]])
            return bounded_step(params, opt_state, step_arr, imgs, labels,
                                mask)
    elif use_flat:
        # Ordered feed: the per-step in-scan row gather costs 13-17% of
        # stretch device time as a per-row async DMA chain (r4/r5 traces);
        # pre-ordering each epoch's batches contiguously (one big gather
        # per EPOCH) turns every step's fetch into one dynamic slice.
        # Trajectories are bit-identical to the gather feed
        # (tests/test_ordered_feed.py).
        train_fn = ts.make_flat_train_multi_step(
            cfg, tcfg, mesh, tx, preprocess, k, flattener,
            apply_fn=vit.apply_stacked,
            guard_padded_steps=(steps_per_epoch % k != 0),
            zero1=zero1, accum=accum, feed="ordered")
        order_j = jax.jit(ts.epoch_order_data,
                          out_shardings=(replicated, replicated))
    else:
        train_fn = ts.make_train_step(cfg, tcfg, mesh, tx, preprocess,
                                      accum=accum)
    eval_steps = -(-len(bundle.test_y) // tcfg.batch_size)
    k_eval = (ts.pick_steps_per_dispatch(eval_steps)
              if jax.default_backend() == "tpu" else 1)
    if use_bounded:
        # Forward-only bounded evaluation: same per-program bounds as the
        # train step (a monolithic eval forward would hit the same
        # execution deadline the bounded driver exists to avoid).
        k_eval = 1

        def eval_fn(params, step_arr, data_x, data_y, epoch_idx):
            imgs, labels, mask = gather_batch_j(data_x, data_y,
                                                epoch_idx[step_arr[0]])
            return bounded_step.evaluate(params, step_arr, imgs, labels,
                                         mask)
    else:
        eval_fn = ts.make_eval_step(
            cfg, mesh, eval_preprocess, k=k_eval,
            apply_fn=cp.apply_cp if use_cp else None)
    eval_idx = jax.device_put(
        ts.pad_epoch_indices(
            ts.epoch_indices(key, len(bundle.test_y), tcfg.batch_size, False),
            k_eval),
        idx_sharding)

    ckpt_path = None
    history = []
    profiling = False
    if tcfg.profile_dir:
        jax.profiler.start_trace(tcfg.profile_dir)
        profiling = True
    try:
        for epoch in range(start_epoch, tcfg.epochs):
            if verbose:
                print(f"\nEpoch: {epoch + 1}/{tcfg.epochs}")
            epoch_idx = ts.epoch_indices(
                jax.random.fold_in(key, epoch), len(bundle.train_y),
                tcfg.batch_size, True)
            epoch_idx = jax.device_put(
                ts.pad_epoch_indices(epoch_idx, stride), idx_sharding)
            if use_flat:  # ordered feed: one epoch-sized gather, amortized
                ep_x, ep_y = order_j(train_x, train_y, epoch_idx)
                if jax.default_backend() == "cpu":
                    ep_y.block_until_ready()  # one sharded program in flight
            else:
                ep_x, ep_y = train_x, train_y
            (train_params, opt_state), train_loss, train_acc, train_ips = \
                _run_epoch(train_fn, (train_params, opt_state), ep_x,
                           ep_y, epoch_idx, "Training", True, k=stride,
                           epoch=epoch)
            if use_tp or use_pp or use_tpcp or use_pptp or use_pptpcp:
                params = gather_j(train_params)
            else:
                params = unflatten_j(train_params) if use_flat else train_params
            (_, _), test_loss, test_acc, _ = _run_epoch(
                eval_fn, (params, None), test_x, test_y, eval_idx,
                "Testing", False, k=k_eval)

            if test_acc > best_acc:
                best_acc = test_acc
                ckpt_path = checkpoint.save(
                    f"{tcfg.ckpt_dir}/{tcfg.dataset}_{cfg.pos_encoding}_best.npz",
                    jax.device_get(params), vit.buffers(cfg),
                    aliases=vit.reference_alias_keys(cfg))
            if tcfg.save_last:
                checkpoint.save_train_state(
                    last_path, jax.device_get(params), opt_to_disk(opt_state),
                    epoch, best_acc)

            with open(log_file, "a", newline="") as f:
                csv.writer(f).writerow(
                    [epoch + 1, train_loss, train_acc, test_loss, test_acc,
                     best_acc])
            history.append(
                dict(epoch=epoch + 1, train_loss=train_loss,
                     train_acc=train_acc, test_loss=test_loss,
                     test_acc=test_acc, images_per_sec=train_ips))
            if verbose:
                print(f"Train Loss: {train_loss:.4f}, Train Acc: {train_acc:.2f}%")
                print(f"Test Loss: {test_loss:.4f}, Test Acc: {test_acc:.2f}%")
                print(f"Best Test Acc: {best_acc:.2f}% "
                      f"({train_ips:,.0f} images/sec train)")
    finally:
        if profiling:
            jax.profiler.stop_trace()

    return dict(best_acc=best_acc, log_file=log_file, ckpt_path=ckpt_path,
                history=history, num_params=vit.num_params(params),
                num_devices=mesh.devices.size)
