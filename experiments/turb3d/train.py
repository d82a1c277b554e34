"""turb3d training driver (CLI): 3-D turbulence, 4-D space-time SR.

The 4-D extension of the reference pipeline (which is strictly 3-D —
SURVEY.md §1; BASELINE.json config #5 names this stack): UNet4d encoder
(factorized (3+1)-D convs) -> 4-D local-implicit-grid query (2^4 = 16
corners) -> ImNet(dim=4) decoder, with the incompressible 3-D
Navier–Stokes residuals (physics/systems.py::get_ns3d_pde_layer) as the
physics loss. Flags mirror experiments/rb2d/train.py with (z, y, x)
space axes.

Example:
    python experiments/turb3d/generate_data.py --out ./data/abc.npz
    python experiments/turb3d/train.py --data_folder ./data \
        --train_data abc.npz --epochs 20 --alpha_pde 0.05
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from space_time_pde_tpu.utils.platform import maybe_force_platform
maybe_force_platform()

import jax
import jax.numpy as jnp
import numpy as np

from space_time_pde_tpu.data.dataset4d import Field4DDataset
from space_time_pde_tpu.data.device_pipeline import DeviceSampler
from space_time_pde_tpu.data.prefetch import BatchPrefetcher
from space_time_pde_tpu.models import ImNet, UNet4d
from space_time_pde_tpu.physics.systems import get_ns3d_pde_layer
from space_time_pde_tpu.train.trainer import (
    TrainState, make_eval_fn, make_loss_fn, make_multi_step,
    make_optimizer, make_train_step,
)
from space_time_pde_tpu.utils import MetricsLogger
from space_time_pde_tpu.utils.checkpoint import CheckpointManager
from space_time_pde_tpu.utils.config import Config


def add_turb3d_args(parser: argparse.ArgumentParser) -> None:
    p = parser.add_argument
    p("--data_folder", type=str, default="./data")
    p("--train_data", type=str, default="abc_flow.npz")
    p("--eval_data", type=str, default="abc_flow.npz")
    p("--allow_split_leak", action="store_true",
      help="downgrade the held-out-seed-in-training-list error "
           "(data/splits.py::check_train_files) to a warning")
    p("--nt", type=int, default=8)
    p("--nz", type=int, default=16)
    p("--ny", type=int, default=16)
    p("--nx", type=int, default=16)
    p("--downsamp_t", type=int, default=2)
    p("--downsamp_xyz", type=int, default=4)
    p("--n_samp_pts_per_crop", type=int, default=512)
    p("--lat_dims", type=int, default=16)
    p("--unet_nf", type=int, default=8)
    p("--unet_mf", type=int, default=256)
    p("--imnet_nf", type=int, default=16)
    p("--use_bf16", type=lambda s: s.lower() in ("1", "true", "yes"),
      default=False, metavar="BOOL")
    p("--epochs", type=int, default=20)
    p("--batch_size_per_gpu", type=int, default=4)
    p("--lr", type=float, default=1e-2)
    p("--lr_schedule", type=str, default="constant")
    p("--alpha_pde", type=float, default=0.05)
    p("--reg_loss_type", type=str, default="l1")
    p("--clip_grad", type=float, default=1.0)
    p("--pseudo_epoch_size", type=int, default=512)
    p("--log_dir", type=str, default="./log/turb3d")
    p("--resume", type=str, default=None)
    p("--seed", type=int, default=42)
    p("--viscosity", type=float, default=1e-2)
    p("--inner_steps", type=int, default=1)
    p("--pde_derivs", type=str, default="jet",
      choices=("jet", "jet_jnp", "tower"))
    p("--pde_loss_type", type=str, default="l2", choices=("l2", "huber"))
    p("--pde_bf16", type=lambda s: s.lower() in ("1", "true", "yes"),
      default=False, metavar="BOOL")
    p("--device_data", type=lambda s: s.lower() in ("1", "true", "yes"),
      default=True, metavar="BOOL")
    p("--space_devices", type=int, default=1,
      help="shard the 4-D latent grid along x over this many mesh "
           "devices (replicated UNet4d encoder; the remaining devices "
           "form the data axis). BASELINE.json config #5: sharded "
           "latent grid + query binning, now for the 4-D stack.")
    p("--sharded_encoder", action="store_true",
      help="with --space_devices > 1: use the halo-conv ShardedUNet4d "
           "so neither the 4-D input grid nor the latent grid is ever "
           "materialized whole on one device (grids beyond one chip's "
           "HBM); same parameter pytree as UNet4d, so checkpoints are "
           "layout-interchangeable")
    p("--cliff_recovery", type=lambda s: s.lower() in ("1", "true", "yes"),
      default=True, metavar="BOOL",
      help="on a 2nd-order-loss explosion (BASELINE.md spike "
           "dissection), restore the last healthy checkpoint and "
           "continue at reduced lr instead of diverging (same "
           "CliffDetector as experiments/rb2d/train.py)")
    p("--recovery_lr_factor", type=float, default=0.5,
      help="lr multiplier applied on each cliff recovery")


def build_turb3d_models(args, lres_shape):
    dtype = jnp.bfloat16 if args.use_bf16 else jnp.float32
    unet = UNet4d(in_features=4, out_features=args.lat_dims,
                  igres=tuple(lres_shape), nf=args.unet_nf,
                  mf=args.unet_mf, dtype=dtype)
    imnet = ImNet(dim=4, in_features=args.lat_dims, out_features=4,
                  nf=args.imnet_nf, dtype=dtype)
    return unet, imnet


def make_config(args) -> Config:
    """Map turb3d flags onto the shared Config (for the generic
    trainer pieces and checkpoint metadata)."""
    cfg = Config()
    cfg.model.lat_dims = args.lat_dims
    cfg.model.unet_nf = args.unet_nf
    cfg.model.unet_mf = args.unet_mf
    cfg.model.imnet_nf = args.imnet_nf
    cfg.model.use_bf16 = args.use_bf16
    cfg.train.alpha_pde = args.alpha_pde
    cfg.train.reg_loss_type = args.reg_loss_type
    cfg.train.clip_grad = args.clip_grad
    cfg.train.lr = args.lr
    cfg.train.lr_schedule = args.lr_schedule
    cfg.train.epochs = args.epochs
    cfg.train.pde_derivs = args.pde_derivs
    cfg.train.pde_loss_type = args.pde_loss_type
    cfg.train.pde_bf16 = args.pde_bf16
    cfg.train.cliff_recovery = args.cliff_recovery
    cfg.train.recovery_lr_factor = args.recovery_lr_factor
    cfg.physics.pde_system = "ns3d"
    cfg.physics.viscosity = args.viscosity
    cfg.data.data_folder = args.data_folder
    cfg.data.train_data = args.train_data
    cfg.data.eval_data = args.eval_data
    cfg.data.nt = args.nt
    cfg.data.nz = args.nz
    cfg.data.downsamp_t = args.downsamp_t
    cfg.data.n_samp_pts_per_crop = args.n_samp_pts_per_crop
    return cfg


def init_state4d(key, args, unet, imnet, tx, lres_shape) -> TrainState:
    k1, k2, k3 = jax.random.split(key, 3)
    lres = jnp.zeros((1, *lres_shape, 4))
    coords = jnp.zeros((1, 4 + args.lat_dims))
    params = {
        "unet": unet.init(k1, lres)["params"],
        "imnet": imnet.init(k2, coords)["params"],
    }
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), key=k3)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    add_turb3d_args(parser)
    args = parser.parse_args()

    def make_ds(fname):
        return Field4DDataset(
            data_folder=args.data_folder, data_filename=fname,
            nt=args.nt, nz=args.nz, ny=args.ny, nx=args.nx,
            n_samp_pts_per_crop=args.n_samp_pts_per_crop,
            downsamp_t=args.downsamp_t, downsamp_xyz=args.downsamp_xyz)

    from space_time_pde_tpu.data.splits import check_train_files
    check_train_files(args.train_data, eval_data=args.eval_data,
                      allow_leak=args.allow_split_leak or None)
    ds = make_ds(args.train_data)
    eval_ds = make_ds(args.eval_data)
    eval_ds.channel_mean = ds.channel_mean
    eval_ds.channel_std = ds.channel_std

    unet, imnet = build_turb3d_models(args, ds.lres_shape)
    plain_unet = unet
    if args.sharded_encoder:
        if args.space_devices < 2:
            raise SystemExit("--sharded_encoder requires "
                             "--space_devices > 1")
        from space_time_pde_tpu.parallel.sharded_unet4d import \
            ShardedUNet4d
        # Identical parameter pytree to UNet4d (tested), so init, eval
        # and checkpoints all go through the plain module; only the
        # training step's apply uses the halo-conv layout.
        unet = ShardedUNet4d(
            in_features=4, out_features=args.lat_dims,
            igres=tuple(ds.lres_shape), nf=args.unet_nf,
            mf=args.unet_mf,
            dtype=jnp.bfloat16 if args.use_bf16 else jnp.float32)
    et, ez, ey, ex = ds.coord_extents
    pde_layer = get_ns3d_pde_layer(
        mean=ds.channel_mean, std=ds.channel_std,
        t_crop=et, z_crop=ez, y_crop=ey, x_crop=ex,
        viscosity=args.viscosity,
    ) if args.alpha_pde > 0 else None

    cfg = make_config(args)
    n_space = max(1, args.space_devices)
    ndev = jax.local_device_count() if n_space > 1 else 1
    n_data = max(1, ndev // n_space)
    batch_per_step = args.batch_size_per_gpu * n_data
    steps_per_epoch = max(1, args.pseudo_epoch_size // batch_per_step)
    tx = make_optimizer(cfg, steps_per_epoch)
    # State always initializes through the plain UNet4d — ShardedUNet4d
    # has the identical parameter pytree.
    state = init_state4d(jax.random.PRNGKey(args.seed), args, plain_unet,
                         imnet, tx, ds.lres_shape)
    loss_fn = (None if args.sharded_encoder  # dp_sp builds its own loss
               else make_loss_fn(cfg, plain_unet, imnet, pde_layer))

    inner = max(1, args.inner_steps)
    sampler = None
    sp_batch = None
    if n_space > 1:
        if n_data * n_space != ndev:
            raise SystemExit(f"--space_devices {n_space} must divide "
                             f"device count {ndev}")
        from space_time_pde_tpu.parallel.dp_sp import make_dp_sp_batch
        x_nodes = ds.lres_shape[-1]
        sp_batch = lambda b: make_dp_sp_batch(b, n_space, x_nodes)
        print(f"dp x space mesh: data={n_data}, space={n_space} (4-D "
              "sharded latent + binned queries)")
    elif args.device_data and DeviceSampler.supported(ds):
        sampler = DeviceSampler(ds)
        loss_fn = sampler.wrap_loss(loss_fn)
        print("device-data pipeline active (4-D)")

    def build_step(tx):
        """(Re)build the jitted step for the active layout; called
        again by cliff auto-recovery with a reduced-lr optimizer."""
        if n_space > 1:
            # dp x space 2-D mesh: latent grid sharded along x with a
            # ppermute halo, points binned per shard (dimension-
            # agnostic make_dp_sp_batch — BASELINE config #5 in 4-D).
            from space_time_pde_tpu.parallel.dp_sp import \
                make_dp_sp_train_step
            step_fn, _, place_fn = make_dp_sp_train_step(
                cfg, unet, imnet, pde_layer, tx, n_data, n_space,
                sharded_encoder=args.sharded_encoder, n_inner=inner)
            return step_fn, place_fn
        if inner > 1:
            return make_multi_step(loss_fn, tx, inner), None
        return make_train_step(loss_fn, tx), None

    step_fn, place_fn = build_step(tx)
    # The jnp 16-corner query SEGFAULTS this environment's XLA:TPU
    # compiler (bisected: UNet4d and the fused 4-D kernels compile
    # fine; the gather/blend program does not). On TPU, eval goes
    # through the fused Pallas query instead — parity-tested against
    # the jnp path in tests/test_4d.py.
    imnet_query_fn = None
    if jax.devices()[0].platform != "cpu":
        from space_time_pde_tpu.ops.fused_query import (
            fused_query_local_implicit_grid,
        )
        imnet_query_fn = (
            lambda p, latent, c: fused_query_local_implicit_grid(
                imnet, p, latent, c, block_pts=64))
    eval_fn = make_eval_fn(cfg, plain_unet, imnet,
                           imnet_query_fn=imnet_query_fn)

    ckpt_dir = os.path.join(args.log_dir, "checkpoints")
    mngr = CheckpointManager(ckpt_dir, keep=3)
    start_epoch = 0
    if args.resume:
        rmngr = (mngr if os.path.abspath(args.resume) ==
                 os.path.abspath(ckpt_dir)
                 else CheckpointManager(args.resume))
        state, extra = rmngr.restore(state)
        start_epoch = int(extra.get("epoch", 0)) + 1
        print(f"resumed from step {int(state.step)} (epoch {start_epoch})")

    logger = MetricsLogger(args.log_dir)
    rng = np.random.RandomState(args.seed)
    eval_rng = np.random.RandomState(args.seed + 1)
    eval_batch = {k: jnp.asarray(v) for k, v in
                  eval_ds.sample_batch(eval_rng, batch_per_step).items()}

    if sp_batch is not None and inner > 1:
        from space_time_pde_tpu.parallel.dp_sp import stack_dp_sp_batches

        def _make():
            return stack_dp_sp_batches(
                [sp_batch(ds.sample_batch(rng, batch_per_step))
                 for _ in range(inner)])
    elif sp_batch is not None:
        _make = lambda: sp_batch(ds.sample_batch(rng, batch_per_step))
    elif sampler is not None:
        if inner > 1:
            def _make():
                os_, ps_ = zip(*[sampler.draw(rng, batch_per_step)
                                 for _ in range(inner)])
                return {"origins": np.stack(os_),
                        "point_coord": np.stack(ps_)}
        else:
            def _make():
                o, p = sampler.draw(rng, batch_per_step)
                return {"origins": o, "point_coord": p}
    elif inner > 1:
        def _make():
            bs = [ds.sample_batch(rng, batch_per_step)
                  for _ in range(inner)]
            return {k: np.stack([b[k] for b in bs]) for k in bs[0]}
    else:
        _make = lambda: ds.sample_batch(rng, batch_per_step)
    prefetcher = BatchPrefetcher(_make, depth=4)

    best_eval = float("inf")
    lr_scale = 1.0
    from space_time_pde_tpu.train.recovery import CliffDetector
    cliff = CliffDetector() if args.cliff_recovery else None
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        for _ in range(max(1, steps_per_epoch // inner)):
            batch = {k: jnp.asarray(v) for k, v in prefetcher.get().items()}
            if sampler is not None:
                # Explicit (scan-invariant) field input: heals via
                # sampler.refresh() without recompiling (see rb2d).
                batch["_const_field" if inner > 1 else "field"] = \
                    sampler.data
            if place_fn is not None:
                state, batch = place_fn(state, batch)
            state, metrics = step_fn(state, batch)
        jax.block_until_ready(state.params)
        metrics = {k: float(v) for k, v in metrics.items()}
        recover_reason = None
        if not all(np.isfinite(v) for v in metrics.values()):
            bad = sorted(k for k, v in metrics.items()
                         if not np.isfinite(v))
            params_ok = all(
                bool(jnp.all(jnp.isfinite(p)))
                for p in jax.tree.leaves(jax.device_get(state.params)))
            if params_ok:
                if sampler is not None:
                    sampler.refresh()
                print(f"epoch {epoch}: non-finite {bad} — update(s) "
                      "skipped, params healthy, continuing")
            else:
                recover_reason = f"non-finite params ({bad})"
        if recover_reason is None and cliff is not None:
            recover_reason = cliff.update(metrics)
        if recover_reason is not None:
            # Cliff auto-recovery (same contract as rb2d train.py /
            # BASELINE.md spike dissection): restore the last healthy
            # checkpoint, continue at reduced lr.
            if cliff is None or mngr.latest_step() is None:
                raise SystemExit(
                    f"{recover_reason} at epoch {epoch} and no healthy "
                    "checkpoint to restore — lower --lr / --alpha_pde")
            lr_scale *= cfg.train.recovery_lr_factor
            tx = make_optimizer(cfg, steps_per_epoch, lr_scale=lr_scale)
            step_fn, new_place_fn = build_step(tx)
            if new_place_fn is not None:
                place_fn = new_place_fn
            state, _ = mngr.restore(state)
            cliff.reset()
            print(f"epoch {epoch}: CLIFF RECOVERY — {recover_reason}; "
                  f"restored step {int(state.step)}, continuing with "
                  f"lr x{lr_scale:g}", flush=True)
            continue
        sec_per_step = (time.time() - t0) / steps_per_epoch
        metrics["sec_per_step"] = sec_per_step
        logger.log(int(state.step), metrics, prefix="train/")

        em = {k: float(np.asarray(v))
              for k, v in eval_fn(state.params, eval_batch).items()
              if np.ndim(v) == 0}
        logger.log(int(state.step), em, prefix="eval/")
        print(f"epoch {epoch}: loss={metrics.get('loss', 0):.5f} "
              f"reg={metrics.get('reg_loss', 0):.5f} "
              f"pde={metrics.get('pde_loss', 0):.5f} "
              f"eval_rel_l2={em.get('rel_l2', 0):.5f} "
              f"({sec_per_step:.3f}s/step)", flush=True)

        if em.get("rel_l2", 1e9) < best_eval or epoch == args.epochs - 1:
            best_eval = min(best_eval, em.get("rel_l2", 1e9))
            mngr.save(int(state.step), state, extra={
                "config": cfg.to_dict(),
                "turb3d_args": {k: getattr(args, k) for k in (
                    "nt", "nz", "ny", "nx", "downsamp_t", "downsamp_xyz",
                    "lat_dims", "unet_nf", "unet_mf", "imnet_nf",
                    "viscosity")},
                "epoch": epoch,
                "channel_mean": np.asarray(ds.channel_mean),
                "channel_std": np.asarray(ds.channel_std),
                "coord_extents": np.asarray(ds.coord_extents),
            })
    prefetcher.close()
    logger.close()
    mngr.close()


if __name__ == "__main__":
    main()
