"""CLI flag-surface contract: the reference train.py flags must be preserved
verbatim — names, defaults, choices (SURVEY.md §5.6 'CLI preserved verbatim'),
including the paired --poly_shared_heads / --no-poly_shared_heads flags."""

import pytest

from vit_rpe_rope_tpu.cli.train import get_args

REFERENCE_DEFAULTS = {
    "log_dir": "logs",
    "ckpt_dir": "checkpoints",
    "dataset": "mnist",
    "pos_encoding": "absolute",
    "rope_theta": 100.0,
    "poly_degree": 3,
    "poly_shared_heads": True,
    "batch_size": 128,
    "epochs": 25,
    "lr": 0.001,
    "weight_decay": 0.01,
    "img_size": 32,
    "patch_size": 4,
    "embed_dim": 192,
    "depth": 6,
    "num_heads": 6,
}


def test_reference_defaults_preserved():
    args = vars(get_args([]))
    for flag, default in REFERENCE_DEFAULTS.items():
        assert args[flag] == default, flag


def test_choices_enforced():
    with pytest.raises(SystemExit):
        get_args(["--dataset", "imagenet"])
    with pytest.raises(SystemExit):
        get_args(["--pos_encoding", "sinusoidal"])


def test_all_reference_pe_choices_accepted():
    for pe in ["none", "absolute", "relative", "polynomial", "rope-axial",
               "rope-mixed"]:
        assert get_args(["--pos_encoding", pe]).pos_encoding == pe


def test_negative_poly_flag():
    assert get_args(["--no-poly_shared_heads"]).poly_shared_heads is False
    assert get_args(["--poly_shared_heads"]).poly_shared_heads is True


def test_typed_flags_parse():
    a = get_args(["--rope_theta", "10.0", "--lr", "0.01", "--epochs", "3",
                  "--embed_dim", "64", "--num_heads", "4"])
    assert a.rope_theta == 10.0 and a.lr == 0.01 and a.epochs == 3
    assert a.embed_dim == 64 and a.num_heads == 4
