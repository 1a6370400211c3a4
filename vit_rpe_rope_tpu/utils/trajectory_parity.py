"""Cross-framework training-TRAJECTORY parity harness.

Trains the REAL torch reference model (/root/reference/models/vit.py, via the
timm stub from tests/golden/generate_fixtures.py) and this JAX build side by
side: identical imported init (our .pth export, strict-loaded), identical
synthetic dataset, identical batch order, identical recipe (CrossEntropy,
AdamW(lr, wd), cosine-per-epoch LR — /root/reference/train.py:194-196).
Compares per-step loss trajectories and final test accuracy.

This is the strongest stand-in this zero-egress machine allows for the
reference's published end metrics (99.23% MNIST / 66.93% CIFAR-10,
/root/reference/README.md:92-93): it measures that the two frameworks compute
the same optimization trajectory, not just the same forward function.

Numerics expectations: both sides are fp32 CPU/TPU with the same math, so the
first steps agree to float-association level (~1e-5) and the trajectories
stay statistically indistinguishable; exact per-step agreement decays
chaotically as tiny rounding differences compound through training.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REFERENCE = os.environ.get("VIT_PE_REFERENCE", "/root/reference")


def _load_reference_model(cfg, num_classes=10):
    """Instantiate the ACTUAL reference VisionTransformer (torch)."""
    sys.path.insert(0, os.path.join(REPO, "tests", "golden"))
    from generate_fixtures import install_timm_stub

    install_timm_stub()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from models.vit import VisionTransformer

    return VisionTransformer(
        img_size=cfg.img_size, patch_size=cfg.patch_size,
        in_chans=cfg.in_chans, num_classes=num_classes,
        embed_dim=cfg.embed_dim, depth=cfg.depth, num_heads=cfg.num_heads,
        pos_encoding=cfg.pos_encoding, rope_theta=cfg.rope_theta,
        poly_degree=cfg.poly_degree, poly_shared_heads=cfg.poly_shared_heads)


def _export_init_to_torch_model(params, cfg):
    """Load OUR init into the reference model via the .pth interop path
    (strict load — exercises the full Q9 key contract)."""
    import torch

    from vit_rpe_rope_tpu.models import vit
    from vit_rpe_rope_tpu.utils import checkpoint

    model = _load_reference_model(cfg)
    with tempfile.TemporaryDirectory() as d:
        npz = checkpoint.save(os.path.join(d, "init.npz"), params,
                              vit.buffers(cfg),
                              aliases=vit.reference_alias_keys(cfg))
        pth = checkpoint.export_torch(npz)
        state = torch.load(pth, map_location="cpu", weights_only=True)
    model.load_state_dict(state, strict=True)
    return model


def run_trajectory_parity(pe="rope-axial", dataset="mnist", steps=200,
                          batch_size=64, epochs=2, embed_dim=64, depth=2,
                          num_heads=4, img_size=None, patch_size=4,
                          n_test=512, lr=1e-3, weight_decay=0.01, seed=0,
                          verbose=True):
    """Train both frameworks for `steps` steps; return a result dict.

    img_size defaults to the dataset's NATIVE size so both sides skip image
    resizing (the one preprocessing op whose bilinear kernels differ between
    torch and jax).
    """
    import jax
    import jax.numpy as jnp
    import torch

    from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig
    from vit_rpe_rope_tpu.data import datasets
    from vit_rpe_rope_tpu.models import vit
    from vit_rpe_rope_tpu.parallel.mesh import (
        DATA_AXIS, NamedSharding, P, make_mesh)
    from vit_rpe_rope_tpu.train import train_step as ts

    native = datasets.NATIVE_SIZE[dataset]
    img_size = img_size or native
    cfg = ViTConfig(
        img_size=img_size, patch_size=patch_size,
        in_chans=1 if dataset == "mnist" else 3,
        embed_dim=embed_dim, depth=depth, num_heads=num_heads,
        pos_encoding=pe, attention_impl="reference",
        # Bit-compatible rope-mixed phases: the reference's Q1 memory
        # scramble is part of the function being compared.
        rope_mixed_compat_scramble=(pe == "rope-mixed"))
    steps_per_epoch = -(-steps // epochs)
    n_train = steps_per_epoch * batch_size  # divisible: no partial batches
    tcfg = TrainConfig(dataset=dataset, batch_size=batch_size, epochs=epochs,
                       lr=lr, weight_decay=weight_decay, seed=seed)
    bundle = datasets.synthetic(dataset, n_train=n_train, n_test=n_test,
                                seed=seed)
    mean = np.asarray(bundle.mean, np.float32)
    std = np.asarray(bundle.std, np.float32)

    # --- identical init ---
    params = vit.init_params(jax.random.PRNGKey(seed), cfg)
    tmodel = _export_init_to_torch_model(params, cfg)

    # --- identical batch order (no partial batches by construction) ---
    key = jax.random.PRNGKey(seed + 100)
    epoch_plans = [
        np.asarray(ts.epoch_indices(jax.random.fold_in(key, e), n_train,
                                    batch_size, True))
        for e in range(epochs)
    ]
    assert all((p >= 0).all() for p in epoch_plans)

    # --- JAX side ---
    mesh = make_mesh(batch_size=batch_size, num_devices=1)
    rep = NamedSharding(mesh, P())
    idx_sh = NamedSharding(mesh, P(None, DATA_AXIS))
    pre = ts.make_preprocess(cfg, bundle.mean, bundle.std, native)
    tx = ts.make_optimizer(tcfg, steps_per_epoch)
    jp = jax.device_put(params, rep)
    jo = jax.device_put(tx.init(jp), rep)
    step_fn = ts.make_train_step(cfg, tcfg, mesh, tx, pre)
    dx = jax.device_put(bundle.train_x, rep)
    dy = jax.device_put(bundle.train_y, rep)
    jax_losses = []
    done = 0
    for e in range(epochs):
        ei = jax.device_put(jnp.asarray(epoch_plans[e]), idx_sh)
        for s in range(steps_per_epoch):
            if done >= steps:
                break
            jp, jo, m = step_fn(jp, jo, jnp.asarray([s], jnp.int32), dx, dy, ei)
            jax_losses.append(float(np.asarray(m)[0]))
            done += 1

    # --- torch side (the reference loop, train.py:94-125,194-205) ---
    torch.manual_seed(seed)
    criterion = torch.nn.CrossEntropyLoss()
    opt = torch.optim.AdamW(tmodel.parameters(), lr=lr,
                            weight_decay=weight_decay)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs)

    def to_torch_batch(idx):
        x = bundle.train_x[idx].astype(np.float32) / 255.0
        x = (x - mean) / std
        x = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))  # NHWC -> NCHW
        y = torch.from_numpy(bundle.train_y[idx].astype(np.int64))
        return x, y

    torch_losses = []
    tmodel.train()
    done = 0
    for e in range(epochs):
        for s in range(steps_per_epoch):
            if done >= steps:
                break
            x, y = to_torch_batch(epoch_plans[e][s])
            opt.zero_grad()
            loss = criterion(tmodel(x), y)
            loss.backward()
            opt.step()
            torch_losses.append(float(loss.detach()))
            done += 1
        sched.step()

    # --- eval both on the same test set ---
    test_x = bundle.test_x.astype(np.float32) / 255.0
    test_x = (test_x - mean) / std
    ty = bundle.test_y

    logits_j = np.asarray(vit.apply(jax.device_get(jp), jnp.asarray(test_x),
                                    cfg))
    acc_jax = 100.0 * float((logits_j.argmax(-1) == ty).mean())
    tmodel.eval()
    with torch.no_grad():
        logits_t = tmodel(
            torch.from_numpy(np.transpose(test_x, (0, 3, 1, 2)))).numpy()
    acc_torch = 100.0 * float((logits_t.argmax(-1) == ty).mean())

    jl = np.asarray(jax_losses)
    tl = np.asarray(torch_losses)
    n_early = min(10, len(jl))
    win = max(1, len(jl) // 8)
    smooth_j = np.array([jl[i:i + win].mean() for i in range(0, len(jl), win)])
    smooth_t = np.array([tl[i:i + win].mean() for i in range(0, len(tl), win)])
    result = dict(
        pe=pe, dataset=dataset, steps=len(jl), batch_size=batch_size,
        early_max_absdiff=float(np.abs(jl[:n_early] - tl[:n_early]).max()),
        smoothed_max_reldiff=float(
            np.abs(smooth_j - smooth_t).max()
            / max(np.abs(smooth_t).max(), 1e-9)),
        final_window_loss_jax=float(smooth_j[-1]),
        final_window_loss_torch=float(smooth_t[-1]),
        acc_jax=acc_jax, acc_torch=acc_torch,
        acc_absdiff=abs(acc_jax - acc_torch),
        jax_losses=jax_losses, torch_losses=torch_losses,
    )
    if verbose:
        print(f"[{dataset}/{pe}] {len(jl)} steps | "
              f"early max|Δloss| {result['early_max_absdiff']:.2e} | "
              f"smoothed max relΔ {result['smoothed_max_reldiff']:.3f} | "
              f"final loss jax {result['final_window_loss_jax']:.4f} vs "
              f"torch {result['final_window_loss_torch']:.4f} | "
              f"acc jax {acc_jax:.2f}% vs torch {acc_torch:.2f}%")
    return result
