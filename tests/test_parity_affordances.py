"""Reference-parity affordances: activation registry, BatchNorm mode,
torch state_dict import, velonly, bf16 second-order robustness.

Covers the round-1 verdict's items 9/10: the pieces that make the
reference's rel-L2 parity gate executable (selectable nonlinearities —
reference ``src/nonlinearities.py``; BatchNorm UNet — reference
``src/unet3d.py``; torch checkpoint import) plus numerical-robustness
guarantees (f32 physics accumulation under the bf16 policy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from space_time_pde_tpu.models import ImNet
from space_time_pde_tpu.models.nonlinearities import (
    NONLINEARITIES, PIECEWISE_LINEAR, get_activation,
)
from space_time_pde_tpu.utils.config import Config
from space_time_pde_tpu.utils.torch_import import (
    batchnorm_from_torch, conv_from_torch, conv_transpose_from_torch,
    imnet_params_from_torch,
)
from torch_oracle import TorchImNet


# ---------------------------------------------------------------- registry

def test_activation_registry_names_and_errors():
    x = jnp.linspace(-2, 2, 11)
    for name in NONLINEARITIES:
        y = get_activation(name)(x)
        assert y.shape == x.shape and bool(jnp.all(jnp.isfinite(y)))
    with pytest.raises(ValueError, match="unknown activation"):
        get_activation("swiglu")
    assert "leaky_relu" in PIECEWISE_LINEAR and "tanh" not in \
        PIECEWISE_LINEAR


@pytest.mark.parametrize("name", ["relu", "elu", "tanh", "sin"])
def test_imnet_selectable_activation(name):
    net = ImNet(dim=3, in_features=4, out_features=2, nf=2,
                activation=name)
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 7))
    params = jax.jit(net.init)(jax.random.PRNGKey(1), x)["params"]
    y = net.apply({"params": params}, x)
    base = ImNet(dim=3, in_features=4, out_features=2, nf=2)
    yb = base.apply({"params": params}, x)
    assert bool(jnp.all(jnp.isfinite(y)))
    if name != "leaky_relu":
        assert not np.allclose(np.asarray(y), np.asarray(yb))


@pytest.mark.slow
def test_trainer_falls_back_to_towers_for_smooth_activations():
    """[slow: config-fallback variant; the jet and tower paths are each
    default-tested directly in test_jet.py]
    With a non-piecewise-linear decoder the jet is inexact; the loss
    builder must choose the tower path (and still produce finite
    grads through the 2nd-order residuals)."""
    from space_time_pde_tpu.physics.systems import get_pde_layer
    from space_time_pde_tpu.train.trainer import (
        build_models, init_state, make_loss_fn, make_optimizer,
    )

    cfg = Config()
    cfg.model.lat_dims = 4
    cfg.model.unet_nf = 4
    cfg.model.imnet_nf = 2
    cfg.model.activation = "tanh"
    cfg.train.alpha_pde = 0.1
    unet, imnet = build_models(cfg, (4, 8, 8))
    tx = make_optimizer(cfg)
    state = init_state(jax.random.PRNGKey(0), cfg, unet, imnet, tx)
    pde = get_pde_layer("rb2d", mean=np.zeros(4), std=np.ones(4),
                        t_crop=1.0, z_crop=1.0, x_crop=1.0)
    loss_fn = make_loss_fn(cfg, unet, imnet, pde)
    batch = {
        "lres": jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8, 4)),
        "point_coord": jax.random.uniform(jax.random.PRNGKey(2),
                                          (1, 16, 3)),
        "point_value": jnp.zeros((1, 16, 4)),
    }
    (loss, metrics), grads = jax.jit(jax.value_and_grad(
        loss_fn, has_aux=True))(state.params, batch)
    assert np.isfinite(float(loss)) and np.isfinite(
        float(metrics["pde_loss"]))
    gnorm = jax.tree.reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


# ------------------------------------------------------------ torch import

def test_imnet_import_matches_torch_forward():
    torch.manual_seed(0)
    tnet = TorchImNet(dim=3, in_features=8, out_features=4, nf=2)
    params = imnet_params_from_torch(tnet.state_dict())
    jnet = ImNet(dim=3, in_features=8, out_features=4, nf=2)
    x = np.random.RandomState(0).randn(17, 11).astype(np.float32)
    want = tnet(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(jnet.apply({"params": jax.tree.map(jnp.asarray,
                                                        params)},
                                jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv3d_import_matches_torch():
    torch.manual_seed(1)
    tconv = torch.nn.Conv3d(3, 5, kernel_size=3, padding=0)
    import flax.linen as nn
    fconv = nn.Conv(5, (3, 3, 3), padding="VALID")
    p = conv_from_torch(tconv.weight, tconv.bias)
    x = np.random.RandomState(1).randn(2, 3, 6, 7, 8).astype(np.float32)
    want = tconv(torch.from_numpy(x)).detach().numpy()      # NCDHW
    got = np.asarray(fconv.apply(
        {"params": jax.tree.map(jnp.asarray, p)},
        jnp.asarray(np.moveaxis(x, 1, -1))))                # NDHWC
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), want,
                               rtol=1e-4, atol=1e-4)


def test_conv_transpose3d_import_matches_torch():
    torch.manual_seed(2)
    tconv = torch.nn.ConvTranspose3d(4, 6, kernel_size=2, stride=2)
    import flax.linen as nn
    fconv = nn.ConvTranspose(6, (2, 2, 2), strides=(2, 2, 2))
    p = conv_transpose_from_torch(tconv.weight, tconv.bias)
    x = np.random.RandomState(2).randn(1, 4, 3, 4, 5).astype(np.float32)
    want = tconv(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(fconv.apply(
        {"params": jax.tree.map(jnp.asarray, p)},
        jnp.asarray(np.moveaxis(x, 1, -1))))
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), want,
                               rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------ batch norm

def test_batchnorm_mode_matches_torch_semantics():
    """flax nn.BatchNorm as configured in make_norm == torch
    BatchNorm3d: train-mode normalization, running-stat update
    (momentum 0.9 flax == 0.1 torch), eval-mode output."""
    import flax.linen as nn
    from space_time_pde_tpu.models.unet3d import make_norm

    c = 6
    tbn = torch.nn.BatchNorm3d(c, momentum=0.1, eps=1e-5)
    x = np.random.RandomState(3).randn(4, c, 4, 5, 6).astype(np.float32)

    bn_train = make_norm("batch", c, "bn", train=True)
    variables = jax.jit(bn_train.init)(jax.random.PRNGKey(0),
                              jnp.asarray(np.moveaxis(x, 1, -1)))
    # torch train step (updates running stats in-place)
    tbn.train()
    want = tbn(torch.from_numpy(x)).detach().numpy()
    got, updated = bn_train.apply(
        variables, jnp.asarray(np.moveaxis(x, 1, -1)),
        mutable=["batch_stats"])
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want,
                               rtol=1e-4, atol=1e-4)
    # Running stats (torch stores the UNBIASED batch var; flax the
    # biased — for n = 4*4*5*6 = 480 reduction elements the relative
    # difference is 1/(n-1) ~ 0.2%).
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=5e-3, atol=1e-4)
    # Eval mode consumes the running stats identically.
    tbn.eval()
    want_eval = tbn(torch.from_numpy(x)).detach().numpy()
    bn_eval = make_norm("batch", c, "bn", train=False)
    got_eval = bn_eval.apply(
        {"params": variables["params"],
         "batch_stats": updated["batch_stats"]},
        jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got_eval), -1, 1),
                               want_eval, rtol=5e-3, atol=5e-4)
    # Round-trip through the converter helpers.
    p, s = batchnorm_from_torch(tbn.weight, tbn.bias, tbn.running_mean,
                                tbn.running_var)
    got2 = bn_eval.apply({"params": p, "batch_stats": s},
                         jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got_eval),
                               rtol=5e-3, atol=5e-4)


@pytest.mark.slow
def test_unet_batchnorm_train_step_and_dp_equivalence():
    """[slow: BatchNorm train-mode variant; GroupNorm dp equivalence
    stays default, BatchNorm inference shape-invariance via
    test_shape_transfer.py]
    norm='batch' end to end: init yields batch_stats, the train step
    updates them, and the 8-way DP step with cross-replica stat sync
    (bn_axis_name) reproduces the single-device global-batch step."""
    from space_time_pde_tpu.parallel import make_dp_train_step
    from space_time_pde_tpu.parallel.dp import replicate_state, shard_batch
    from space_time_pde_tpu.train.trainer import (
        build_models, init_state, make_loss_fn, make_optimizer,
        make_train_step,
    )

    cfg = Config()
    cfg.model.lat_dims = 4
    cfg.model.unet_nf = 4
    cfg.model.imnet_nf = 2
    cfg.model.norm = "batch"
    cfg.train.alpha_pde = 0.0
    cfg.train.clip_grad = 0.0

    ndev = jax.device_count()
    rng = np.random.RandomState(0)
    B = ndev
    batch = {
        "lres": jnp.asarray(rng.randn(B, 4, 8, 8, 4).astype(np.float32)),
        "point_coord": jnp.asarray(
            rng.rand(B, 16, 3).astype(np.float32)),
        "point_value": jnp.asarray(
            rng.randn(B, 16, 4).astype(np.float32)),
    }
    # SGD, not Adam: the update is linear in the gradient, so the
    # post-step param comparison stays tight (Adam's g/(sqrt(v)+eps)
    # amplifies fp noise to O(lr) wherever the true grad is ~0).
    import optax
    tx = optax.sgd(1e-2)

    # Single-device reference on the full batch.
    unet1, imnet1 = build_models(cfg, (4, 8, 8))
    state1 = init_state(jax.random.PRNGKey(0), cfg, unet1, imnet1, tx)
    assert state1.batch_stats is not None
    stats0 = jax.tree.map(np.asarray, state1.batch_stats)
    step1 = make_train_step(make_loss_fn(cfg, unet1, imnet1, None), tx)
    out1, m1 = step1(state1, batch)
    stats1 = jax.tree.map(np.asarray, out1.batch_stats)
    # stats actually moved
    diff = sum(float(np.abs(a - b).sum()) for a, b in
               zip(jax.tree.leaves(stats0), jax.tree.leaves(stats1)))
    assert diff > 0

    # DP over all devices with cross-replica BatchNorm.
    unet8, imnet8 = build_models(cfg, (4, 8, 8), bn_axis_name="data")
    state8 = init_state(jax.random.PRNGKey(0), cfg, unet8, imnet8, tx)
    step8, mesh = make_dp_train_step(
        make_loss_fn(cfg, unet8, imnet8, None), tx, ndev)
    out8, m8 = step8(replicate_state(state8, mesh),
                     shard_batch(batch, mesh))
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(stats1),
                    jax.tree.leaves(jax.tree.map(np.asarray,
                                                 out8.batch_stats))):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(out1.params),
                    jax.tree.leaves(out8.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_batchnorm_checkpoint_roundtrip(tmp_path):
    from space_time_pde_tpu.train.trainer import (
        build_models, init_state, make_optimizer,
    )
    from space_time_pde_tpu.utils.checkpoint import CheckpointManager

    cfg = Config()
    cfg.model.lat_dims = 4
    cfg.model.unet_nf = 4
    cfg.model.imnet_nf = 2
    cfg.model.norm = "batch"
    unet, imnet = build_models(cfg, (4, 8, 8))
    tx = make_optimizer(cfg)
    state = init_state(jax.random.PRNGKey(0), cfg, unet, imnet, tx)
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(0, state)
    restored, _ = mngr.restore(state)
    mngr.close()
    assert restored.batch_stats is not None
    for a, b in zip(jax.tree.leaves(state.batch_stats),
                    jax.tree.leaves(restored.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --------------------------------------------------- bf16 physics path

@pytest.mark.slow
def test_bf16_policy_keeps_f32_physics_accumulation():
    """[slow: bf16-policy accumulation variant; the policy's jet-dtype
    behavior stays default via test_bf16_policy_runs_jet_in_f32]
    SURVEY §7 hard-parts: residuals are small differences of large
    terms. Under use_bf16 the models compute in bf16 but residuals and
    losses must come out f32 and track the f32 model within bf16
    forward error (no catastrophic second-order blowup)."""
    from space_time_pde_tpu.physics.systems import get_pde_layer
    from space_time_pde_tpu.train.trainer import (
        build_models, init_state, make_loss_fn, make_optimizer,
    )

    rng = np.random.RandomState(0)
    batch = {
        "lres": jnp.asarray(rng.randn(2, 4, 8, 8, 4).astype(np.float32)),
        "point_coord": jnp.asarray(rng.rand(2, 32, 3).astype(np.float32)),
        "point_value": jnp.asarray(
            rng.randn(2, 32, 4).astype(np.float32)),
    }
    pde = get_pde_layer("rb2d", mean=np.zeros(4), std=np.ones(4),
                        t_crop=1.0, z_crop=1.0, x_crop=1.0)
    losses = {}
    for bf16 in (False, True):
        cfg = Config()
        cfg.model.lat_dims = 4
        cfg.model.unet_nf = 4
        cfg.model.imnet_nf = 2
        cfg.model.use_bf16 = bf16
        cfg.train.alpha_pde = 0.1
        unet, imnet = build_models(cfg, (4, 8, 8))
        tx = make_optimizer(cfg)
        state = init_state(jax.random.PRNGKey(0), cfg, unet, imnet, tx)
        loss_fn = make_loss_fn(cfg, unet, imnet, pde)
        (loss, metrics), grads = jax.jit(jax.value_and_grad(
            loss_fn, has_aux=True))(state.params, batch)
        assert loss.dtype == jnp.float32
        assert metrics["pde_loss"].dtype == jnp.float32
        # params stay f32 => grads must be f32 (f32 master weights)
        for g in jax.tree.leaves(grads):
            assert g.dtype == jnp.float32
        assert np.isfinite(float(loss))
        losses[bf16] = (float(metrics["reg_loss"]),
                        float(metrics["pde_loss"]))
    # Same params (same PRNG init, f32 storage): bf16 forward error
    # only — the physics must not blow up relative to f32.
    reg32, pde32 = losses[False]
    reg16, pde16 = losses[True]
    assert abs(reg16 - reg32) / (abs(reg32) + 1e-8) < 0.1
    assert abs(pde16 - pde32) / (abs(pde32) + 1e-8) < 0.35


def test_bf16_policy_runs_jet_in_f32(monkeypatch):
    """Under use_bf16 the derivative jet itself runs f32 (default
    pde_bf16=False): a measured bf16-jet run diverges at epoch ~14
    where the f32-jet run is stable (BASELINE.md round-2). The latent
    handed to the jet must arrive as f32."""
    from space_time_pde_tpu.physics.systems import get_pde_layer
    from space_time_pde_tpu.train.trainer import (
        build_models, init_state, make_loss_fn, make_optimizer,
    )
    import space_time_pde_tpu.ops.jet as jet_mod

    seen = {}
    real = jet_mod.query_local_implicit_grid_jet

    def spy(decoder, latent, coords, *a, **k):
        seen["latent_dtype"] = latent.dtype
        return real(decoder, latent, coords, *a, **k)

    monkeypatch.setattr(jet_mod, "query_local_implicit_grid_jet", spy)

    rng = np.random.RandomState(0)
    batch = {
        "lres": jnp.asarray(rng.randn(1, 4, 8, 8, 4).astype(np.float32)),
        "point_coord": jnp.asarray(rng.rand(1, 8, 3).astype(np.float32)),
        "point_value": jnp.asarray(rng.randn(1, 8, 4).astype(np.float32)),
    }
    pde = get_pde_layer("rb2d", mean=np.zeros(4), std=np.ones(4),
                        t_crop=1.0, z_crop=1.0, x_crop=1.0)
    cfg = Config()
    cfg.model.lat_dims = 4
    cfg.model.unet_nf = 4
    cfg.model.imnet_nf = 2
    cfg.model.use_bf16 = True
    cfg.train.alpha_pde = 0.1
    unet, imnet = build_models(cfg, (4, 8, 8))
    state = init_state(jax.random.PRNGKey(0), cfg, unet, imnet,
                       make_optimizer(cfg))
    # jit keeps the trace-time dtype capture (seen[...] is recorded
    # while tracing) but compiles the execution.
    loss, _ = jax.jit(make_loss_fn(cfg, unet, imnet, pde))(
        state.params, batch)
    assert np.isfinite(float(loss))
    assert seen["latent_dtype"] == jnp.float32

    # Explicit opt-in flips the jet to bf16.
    cfg.train.pde_bf16 = True
    seen.clear()
    jax.jit(make_loss_fn(cfg, unet, imnet, pde))(state.params, batch)
    assert seen["latent_dtype"] == jnp.bfloat16


# ------------------------------------------------------------- velonly

@pytest.mark.slow
def test_velonly_flag_wiring():
    """[slow: CLI flag-wiring variant; velonly dataset semantics stay
    default-covered in test_dataset.py]"""
    import argparse

    from space_time_pde_tpu.utils.config import add_args, \
        config_from_args

    parser = argparse.ArgumentParser()
    add_args(parser)
    cfg = config_from_args(parser.parse_args(
        ["--velonly", "true", "--alpha_pde", "0"]))
    assert cfg.data.velonly is True

    # Dataset emits 2 target channels; a 2-channel model trains on it.
    from space_time_pde_tpu.train.trainer import (
        build_models, init_state, make_loss_fn, make_optimizer,
        make_train_step,
    )
    cfg.model.out_channels = 2
    cfg.model.lat_dims = 4
    cfg.model.unet_nf = 4
    cfg.model.imnet_nf = 2
    cfg.train.alpha_pde = 0.0
    unet, imnet = build_models(cfg, (4, 8, 8))
    tx = make_optimizer(cfg)
    state = init_state(jax.random.PRNGKey(0), cfg, unet, imnet, tx)
    rng = np.random.RandomState(0)
    batch = {
        "lres": jnp.asarray(rng.randn(1, 4, 8, 8, 4).astype(np.float32)),
        "point_coord": jnp.asarray(rng.rand(1, 8, 3).astype(np.float32)),
        "point_value": jnp.asarray(rng.randn(1, 8, 2).astype(np.float32)),
    }
    step = make_train_step(make_loss_fn(cfg, unet, imnet, None), tx)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
