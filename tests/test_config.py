"""Config dataclass tree + argparse bridge tests (reference flag names)."""

import argparse

from space_time_pde_tpu.utils.config import (
    Config, add_args, config_from_args,
)


def _parse(argv):
    p = argparse.ArgumentParser()
    add_args(p)
    return config_from_args(p.parse_args(argv))


def test_defaults_roundtrip():
    cfg = _parse([])
    assert cfg.data.nt == 16
    assert cfg.train.batch_size_per_gpu == 8
    assert cfg.model.lat_dims == 32
    assert cfg.physics.pde_system == "rb2d"


def test_reference_flag_names_parse():
    cfg = _parse([
        "--epochs", "7", "--batch_size_per_gpu", "3", "--lr", "0.005",
        "--data_folder", "/d", "--train_data", "a.npz",
        "--eval_data", "b.npz", "--nt", "8", "--nx", "64", "--nz", "32",
        "--downsamp_t", "2", "--downsamp_xz", "4",
        "--n_samp_pts_per_crop", "256", "--alpha_pde", "0.25",
        "--lat_dims", "16", "--unet_nf", "8", "--imnet_nf", "16",
        "--reg_loss_type", "huber", "--clip_grad", "0.5",
        "--lres_filter", "gaussian", "--lres_interp", "nearest",
        "--log_dir", "/tmp/x", "--resume", "/tmp/ck",
        "--pseudo_epoch_size", "128", "--normalize_channels", "false",
        "--pde_system", "ns2d", "--viscosity", "0.01",
    ])
    assert cfg.train.epochs == 7
    assert cfg.train.batch_size_per_gpu == 3
    assert cfg.train.lr == 0.005
    assert cfg.data.train_data == "a.npz"
    assert cfg.data.nx == 64 and cfg.data.nz == 32
    assert cfg.data.downsamp_xz == 4
    assert cfg.train.alpha_pde == 0.25
    assert cfg.model.lat_dims == 16
    assert cfg.train.reg_loss_type == "huber"
    assert cfg.data.lres_filter == "gaussian"
    assert cfg.train.resume == "/tmp/ck"
    assert cfg.data.normalize_channels is False
    assert cfg.physics.pde_system == "ns2d"
    assert cfg.physics.viscosity == 0.01


def test_dict_roundtrip_preserves_everything():
    cfg = _parse(["--epochs", "3", "--use_bf16", "true"])
    d = cfg.to_dict()
    cfg2 = Config.from_dict(d)
    assert cfg2.to_dict() == d
    assert cfg2.train.epochs == 3
    assert cfg2.model.use_bf16 is True
