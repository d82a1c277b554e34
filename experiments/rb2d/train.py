"""RB2D training driver (CLI).

TPU-native equivalent of the reference's ``experiments/rb2d/train.py``:
same flag surface (see utils/config.py — ``--epochs
--batch_size_per_gpu --lr --data_folder --train_data --eval_data --nt
--nx --nz --downsamp_t --downsamp_xz --n_samp_pts_per_crop --alpha_pde
--lat_dims --unet_nf --imnet_nf --reg_loss_type --clip_grad
--lres_filter --lres_interp --log_dir --resume --pseudo_epoch_size
--normalize_channels``), but the step is one jitted XLA graph and
multi-device scaling is shard_map data-parallelism over a JAX mesh
(psum gradient sync over ICI) instead of ``nn.DataParallel``.

Example:
    python experiments/rb2d/train.py --data_folder ./data \
        --train_data rb2d_ra1e6_s42.npz --epochs 100 --alpha_pde 0.1
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

from space_time_pde_tpu.data import RB2DataLoader
from space_time_pde_tpu.physics.systems import get_pde_layer
from space_time_pde_tpu.train import (
    build_models, init_state, make_eval_fn, make_loss_fn, make_train_step,
)
from space_time_pde_tpu.train.trainer import make_optimizer
from space_time_pde_tpu.parallel import (
    make_dp_multi_step, make_dp_train_step, replicate_state,
)
from space_time_pde_tpu.utils import MetricsLogger, add_args, config_from_args
from space_time_pde_tpu.utils.checkpoint import CheckpointManager


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    add_args(parser)
    parser.add_argument(
        "--profile_epoch", type=int, default=-1,
        help="epoch to capture a jax.profiler (xprof) trace for; "
             "written to <log_dir>/profile")
    parser.add_argument(
        "--inner_steps", type=int, default=1,
        help="optimizer steps chained on-device per dispatch "
             "(lax.scan); amortizes host/dispatch latency")
    parser.add_argument(
        "--debug_nans", action="store_true",
        help="enable jax_debug_nans (error at the op producing the "
             "first NaN; disables async dispatch — debug only)")
    parser.add_argument(
        "--space_devices", type=int, default=1,
        help="mesh devices for the 'space' axis (sharded latent grid + "
             "binned query points with ppermute halo); the remaining "
             "devices form the 'data' axis")
    parser.add_argument(
        "--sharded_encoder", action="store_true",
        help="with --space_devices > 1: use the halo-conv ShardedUNet3d "
             "so the input/latent grids are never whole on one device")
    parser.add_argument(
        "--multihost", action="store_true",
        help="join a multi-host run: jax.distributed.initialize() "
             "(coordinator/process id from the TPU-pod environment), "
             "mesh built over GLOBAL devices, per-process host batches "
             "assembled into global arrays. Data-parallel paths only.")
    parser.add_argument(
        "--val_data", type=str, default="",
        help="validation-split npz (overrides --eval_data). Protocol "
             "(data/splits.py): train/val/test are INDEPENDENT "
             "simulations; the per-epoch eval and best-checkpoint "
             "selection use val; report test numbers via "
             "evaluation.py --split test")
    parser.add_argument(
        "--allow_split_leak", action="store_true",
        help="downgrade the held-out-seed-in-training-list error "
             "(data/splits.py::check_train_files) to a warning, for "
             "intentional train-on-everything runs")
    parser.add_argument(
        "--device_data", type=lambda s: s.lower() in ("1", "true", "yes"),
        default=True, metavar="BOOL",
        help="assemble batches ON-DEVICE inside the jitted step (whole "
             "field uploaded to HBM once; host only draws origins + "
             "points). Auto-disabled for filtered low-res or "
             "--space_devices > 1")
    args = parser.parse_args()
    cfg = config_from_args(args)
    if args.val_data:
        cfg.data.eval_data = args.val_data
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    # Validate cheap config errors before touching data/devices.
    from space_time_pde_tpu.physics.systems import available_systems
    if cfg.train.alpha_pde > 0 and \
            cfg.physics.pde_system not in available_systems():
        raise SystemExit(
            f"unknown --pde_system {cfg.physics.pde_system!r}; "
            f"available: {available_systems()}")

    n_proc, proc_id = 1, 0
    if args.multihost:
        from space_time_pde_tpu.parallel import init_multihost
        proc_id, n_proc = init_multihost()
        if args.space_devices > 1:
            # Design decision: the space axis stays INTRA-slice. The
            # halo ppermute + per-shard query binning assume the
            # latent's sharded axis rides ICI-adjacent devices; a
            # space axis spanning DCN would put the per-step halo and
            # the ragged point re-binning on the slow cross-host
            # fabric for a model whose latent grid comfortably fits
            # one slice. Multihost therefore scales the DATA axis
            # only (grads psum over DCN once per step); lay out any
            # space sharding within each slice's local devices.
            raise SystemExit(
                "--multihost scales the data axis only (by design: "
                "halo exchange + query binning stay on intra-slice "
                "ICI; DCN carries just the once-per-step grad psum). "
                "Use --space_devices on single-host/slice runs.")
        print(f"multihost: process {proc_id}/{n_proc}, "
              f"{jax.local_device_count()} local of "
              f"{jax.device_count()} global devices")

    ndev = cfg.train.num_devices or (
        jax.device_count() if args.multihost else jax.local_device_count())
    print(f"devices: {jax.devices()}; using {ndev} for data parallelism")

    if cfg.data.velonly:
        # Predict (u, w) only (reference dataset flag). The PDE systems
        # need all four fields, so physics loss is regression-only here.
        cfg.model.out_channels = 2
        if cfg.train.alpha_pde > 0:
            raise SystemExit(
                "--velonly predicts (u, w) only; the PDE residuals need "
                "all 4 fields — set --alpha_pde 0")

    from space_time_pde_tpu.data.splits import check_train_files
    check_train_files(cfg.data.train_data, eval_data=cfg.data.eval_data,
                      allow_leak=args.allow_split_leak or None)
    ds = RB2DataLoader(
        data_folder=cfg.data.data_folder,
        data_filename=cfg.data.train_data,
        nt=cfg.data.nt, nz=cfg.data.nz, nx=cfg.data.nx,
        n_samp_pts_per_crop=cfg.data.n_samp_pts_per_crop,
        downsamp_t=cfg.data.downsamp_t, downsamp_xz=cfg.data.downsamp_xz,
        normalize_output=cfg.data.normalize_channels,
        lres_filter=cfg.data.lres_filter,
        lres_interp=cfg.data.lres_interp,
        velonly=cfg.data.velonly)
    eval_ds = RB2DataLoader(
        data_folder=cfg.data.data_folder,
        data_filename=cfg.data.eval_data,
        nt=cfg.data.nt, nz=cfg.data.nz, nx=cfg.data.nx,
        n_samp_pts_per_crop=cfg.data.n_samp_pts_per_crop,
        downsamp_t=cfg.data.downsamp_t, downsamp_xz=cfg.data.downsamp_xz,
        normalize_output=cfg.data.normalize_channels,
        lres_filter=cfg.data.lres_filter,
        lres_interp=cfg.data.lres_interp,
        velonly=cfg.data.velonly)
    # Share train-set statistics with the eval set (reference behavior).
    eval_ds.channel_mean = ds.channel_mean
    eval_ds.channel_std = ds.channel_std

    unet, imnet = build_models(
        cfg, ds.lres_shape,
        bn_axis_name="data" if (cfg.model.norm == "batch" and ndev > 1)
        else None)
    plain_unet = unet
    if args.sharded_encoder:
        if args.space_devices < 2:
            raise SystemExit("--sharded_encoder requires --space_devices>1")
        from space_time_pde_tpu.parallel.sharded_unet import ShardedUNet3d
        # Identical parameter pytree to UNet3d (tested), so init, eval
        # and checkpoints all go through the plain module; only the
        # training step's apply uses the halo-conv layout. BatchNorm
        # stats on the sharded encoder sync over BOTH mesh axes (each
        # x-shard sees only part of the spatial positions).
        unet = ShardedUNet3d(
            in_features=cfg.model.in_channels,
            out_features=cfg.model.lat_dims, igres=tuple(ds.lres_shape),
            nf=cfg.model.unet_nf, mf=cfg.model.unet_mf,
            negative_slope=cfg.model.negative_slope,
            activation=cfg.model.activation, norm=cfg.model.norm,
            bn_axis_name=(("data", "space")
                          if cfg.model.norm == "batch" else None))
    et, ez, ex = ds.coord_extents
    pde_layer = get_pde_layer(
        cfg.physics.pde_system,
        mean=ds.channel_mean, std=ds.channel_std,
        t_crop=et, z_crop=ez, x_crop=ex,
        rayleigh=cfg.physics.rayleigh, prandtl=cfg.physics.prandtl,
        viscosity=cfg.physics.viscosity,
    ) if cfg.train.alpha_pde > 0 else None

    # With space sharding, only ndev/space devices carry batch shards.
    n_data_ranks = ndev // max(1, args.space_devices)
    batch_per_step = cfg.train.batch_size_per_gpu * n_data_ranks
    steps_per_epoch = max(1, cfg.train.pseudo_epoch_size // batch_per_step)
    tx = make_optimizer(cfg, steps_per_epoch)
    # State always initializes through the plain UNet3d — ShardedUNet3d
    # has the identical parameter pytree.
    state = init_state(jax.random.PRNGKey(cfg.train.seed), cfg,
                       plain_unet, imnet, tx)
    loss_fn = (None if args.sharded_encoder  # dp_sp builds its own loss
               else make_loss_fn(cfg, unet, imnet, pde_layer))
    inner = max(1, args.inner_steps)
    n_space = max(1, args.space_devices)
    place_fn = None
    from space_time_pde_tpu.data.device_pipeline import DeviceSampler
    sampler = None
    if (args.device_data and n_space == 1 and loss_fn is not None
            and DeviceSampler.supported(ds)):
        sampler = DeviceSampler(ds)
        loss_fn = sampler.wrap_loss(loss_fn)
        print("device-data pipeline: batch assembly fused into the "
              "jitted step (host sends origins+points only)")
    def build_step(tx, state):
        """(Re)build the jitted train step for the active parallel
        layout. Cliff auto-recovery calls this again with a reduced-lr
        optimizer; the mesh/data plumbing is layout-static so only the
        tx-closing step (and dp_sp place) functions are remade."""
        mesh = place_fn = None
        if n_space > 1:
            from space_time_pde_tpu.parallel.dp_sp import \
                make_dp_sp_train_step
            n_data = n_data_ranks
            assert n_data * n_space == ndev, (
                f"--space_devices {n_space} must divide device count {ndev}")
            step_fn, mesh, place_fn = make_dp_sp_train_step(
                cfg, unet, imnet, pde_layer, tx, n_data, n_space,
                sharded_encoder=args.sharded_encoder, n_inner=inner)
        elif ndev > 1 and inner > 1:
            step_fn, mesh = make_dp_multi_step(loss_fn, tx, inner, ndev)
            state = replicate_state(state, mesh)
        elif ndev > 1:
            step_fn, mesh = make_dp_train_step(loss_fn, tx, ndev)
            state = replicate_state(state, mesh)
        elif inner > 1:
            from space_time_pde_tpu.train.trainer import make_multi_step
            step_fn = make_multi_step(loss_fn, tx, inner)
        else:
            step_fn = make_train_step(loss_fn, tx)
        return step_fn, mesh, place_fn, state

    step_fn, mesh, place_fn, state = build_step(tx, state)
    if n_space > 1:
        from space_time_pde_tpu.parallel.dp_sp import make_dp_sp_batch
        x_nodes = ds.lres_shape[2]
        sp_batch = lambda b: make_dp_sp_batch(b, n_space, x_nodes)
    # Eval always runs the plain module (same params either way).
    eval_fn = make_eval_fn(cfg, plain_unet, imnet)

    ckpt_dir = os.path.join(cfg.train.log_dir, "checkpoints")
    mngr = CheckpointManager(ckpt_dir, keep=cfg.train.keep_checkpoints)
    start_epoch = 0
    if cfg.train.resume:
        rmngr = (mngr if os.path.abspath(cfg.train.resume) ==
                 os.path.abspath(ckpt_dir)
                 else CheckpointManager(cfg.train.resume))
        state, extra = rmngr.restore(state)
        start_epoch = int(extra.get("epoch", 0)) + 1
        print(f"resumed from step {int(state.step)} (epoch {start_epoch})")

    # Multihost: every process participates in checkpoint saves (orbax
    # coordinates shard writes into ONE shared directory), but only
    # process 0 writes metrics/tfevents.
    logger = (MetricsLogger(cfg.train.log_dir) if proc_id == 0
              else None)
    # Multihost: each process draws a DIFFERENT stream of training
    # crops (its slice of the global batch) but the SAME eval batch.
    rng = np.random.RandomState(cfg.train.seed + 1000 * proc_id)
    eval_rng = np.random.RandomState(cfg.train.seed + 1)
    local_rows = batch_per_step // n_proc
    assert local_rows * n_proc == batch_per_step, (
        f"global batch {batch_per_step} not divisible by "
        f"{n_proc} processes")
    eval_batch_host = eval_ds.sample_batch(eval_rng, batch_per_step)
    eval_batch = {k: jnp.asarray(v) for k, v in eval_batch_host.items()}
    if n_proc > 1:
        # Same seed on every process => identical full batch; declare it
        # replicated over the mesh so eval composes with global params.
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        eval_batch = {
            k: jax.make_array_from_process_local_data(repl, np.asarray(v))
            for k, v in eval_batch.items()}

    # Background host thread keeps batches ready while the TPU steps
    # (replaces the reference's DataLoader worker subprocesses).
    from space_time_pde_tpu.data.prefetch import BatchPrefetcher
    if sampler is not None:
        if inner > 1:
            def _make_raw():
                os_, ps_ = zip(*[sampler.draw(rng, local_rows)
                                 for _ in range(inner)])
                return {"origins": np.stack(os_),
                        "point_coord": np.stack(ps_)}
        else:
            def _make_raw():
                o, p = sampler.draw(rng, local_rows)
                return {"origins": o, "point_coord": p}
        prefetcher = BatchPrefetcher(_make_raw, depth=4)
    elif n_space > 1 and inner > 1:
        from space_time_pde_tpu.parallel.dp_sp import stack_dp_sp_batches

        def _make():
            return stack_dp_sp_batches(
                [sp_batch(ds.sample_batch(rng, batch_per_step))
                 for _ in range(inner)])
        prefetcher = BatchPrefetcher(_make, depth=4)
    elif n_space > 1:
        prefetcher = BatchPrefetcher(
            lambda: sp_batch(ds.sample_batch(rng, batch_per_step)),
            depth=4)
    elif inner > 1:
        import numpy as _np

        def _make():
            bs = [ds.sample_batch(rng, local_rows)
                  for _ in range(inner)]
            return {k: _np.stack([b[k] for b in bs]) for k in bs[0]}
        prefetcher = BatchPrefetcher(_make, depth=4)
    else:
        prefetcher = BatchPrefetcher(
            lambda: ds.sample_batch(rng, local_rows), depth=4)

    import contextlib

    best_eval = float("inf")
    lr_scale = 1.0
    from space_time_pde_tpu.train.recovery import CliffDetector
    cliff = CliffDetector() if cfg.train.cliff_recovery else None
    for epoch in range(start_epoch, cfg.train.epochs):
        profile_ctx = (
            jax.profiler.trace(os.path.join(cfg.train.log_dir, "profile"))
            if epoch == args.profile_epoch else contextlib.nullcontext())
        t0 = time.time()
        with profile_ctx:
            for _ in range(max(1, steps_per_epoch // inner)):
                raw = prefetcher.get()
                if n_proc > 1:
                    from space_time_pde_tpu.parallel import global_batch
                    batch = global_batch(
                        raw, mesh, batch_axis=1 if inner > 1 else 0)
                else:
                    batch = {k: jnp.asarray(v) for k, v in raw.items()}
                if sampler is not None and ndev == 1:
                    # The HBM field rides as an explicit (scan-
                    # invariant) input, not a baked executable
                    # constant, so a refresh()ed buffer heals the step
                    # without recompiling.
                    batch["_const_field" if inner > 1 else "field"] = \
                        sampler.data
                if place_fn is not None:
                    state, batch = place_fn(state, batch)
                state, metrics = step_fn(state, batch)
            jax.block_until_ready(state.params)
        metrics = {k: float(v) for k, v in metrics.items()}
        recover_reason = None
        epoch_healthy = all(np.isfinite(v) for v in metrics.values())
        if not epoch_healthy:
            bad = {k: v for k, v in metrics.items()
                   if not np.isfinite(v)}
            # The invariant that matters is PARAM health: spiked batches
            # produce non-finite losses/grads but optax.apply_if_finite
            # skips those updates, so params stay finite and training
            # self-recovers. Abort only on actual corruption.
            params_ok = all(
                bool(jnp.all(jnp.isfinite(p)))
                for p in jax.tree.leaves(jax.device_get(state.params)))
            if params_ok:
                # Params are healthy, so the non-finite step came from a
                # transient spike (update skipped by apply_if_finite) OR
                # from corrupted device-side input buffers (observed on
                # the experimental remote-TPU runtime: a run whose
                # checkpointed params stay healthy while every step
                # returns inf). Heal both: re-upload the HBM field and
                # the eval batch to FRESH buffers — with the field as an
                # explicit step input this needs no recompile.
                if sampler is not None and n_proc == 1:
                    sampler.refresh()
                    eval_batch = {k: jnp.asarray(np.asarray(v))
                                  for k, v in eval_batch_host.items()}
                print(f"epoch {epoch}: non-finite {sorted(bad)} — "
                      "update(s) skipped (apply_if_finite), params "
                      "healthy; device buffers re-uploaded, continuing")
            else:
                recover_reason = f"non-finite params ({sorted(bad)})"
        if recover_reason is None and cliff is not None:
            recover_reason = cliff.update(metrics)
        if recover_reason is not None:
            # Cliff auto-recovery (BASELINE.md spike dissection): the
            # 2nd-order loss walked onto a kink cliff. Restore the last
            # healthy checkpoint and continue at reduced lr instead of
            # aborting (non-finite params) or spinning on skipped
            # updates. Deterministic across multihost processes: the
            # psum'd metrics are identical everywhere.
            if cliff is None or mngr.latest_step() is None:
                raise SystemExit(
                    f"{recover_reason} at epoch {epoch} and no healthy "
                    "checkpoint to restore — lower --lr / --alpha_pde "
                    "or rerun with --debug_nans to locate the "
                    "producing op")
            lr_scale *= cfg.train.recovery_lr_factor
            tx = make_optimizer(cfg, steps_per_epoch, lr_scale=lr_scale)
            step_fn, _, new_place_fn, state = build_step(tx, state)
            if new_place_fn is not None:
                place_fn = new_place_fn
            state, _ = mngr.restore(state)
            cliff.reset()
            print(f"epoch {epoch}: CLIFF RECOVERY — {recover_reason}; "
                  f"restored step {int(jax.device_get(state.step).max()) if hasattr(state.step, 'max') else int(state.step)}, "
                  f"continuing with lr x{lr_scale:g}", flush=True)
            continue
        step_now = int(jax.device_get(state.step).max()) if hasattr(
            state.step, "max") else int(state.step)
        sec_per_step = (time.time() - t0) / steps_per_epoch
        metrics["sec_per_step"] = sec_per_step
        metrics["pts_per_sec"] = (batch_per_step *
                                  cfg.data.n_samp_pts_per_crop /
                                  sec_per_step)
        if logger is not None:
            logger.log(step_now, metrics, prefix="train/")

        # device_get: eval may run on a different (sub-)mesh than the
        # training step placed the params on.
        eval_params = (jax.device_get(state.params) if args.sharded_encoder
                       else jax.tree.map(lambda x: x, state.params))
        eval_stats = (jax.device_get(state.batch_stats)
                      if args.sharded_encoder and
                      state.batch_stats is not None else state.batch_stats)
        em = {k: float(np.asarray(v).mean()) if np.ndim(v) == 0 else 0.0
              for k, v in eval_fn(eval_params, eval_batch,
                                  eval_stats).items()
              if np.ndim(v) == 0}
        if logger is not None:
            logger.log(step_now, em, prefix="eval/")
        print(f"epoch {epoch}: loss={metrics.get('loss', 0):.5f} "
              f"reg={metrics.get('reg_loss', 0):.5f} "
              f"pde={metrics.get('pde_loss', 0):.5f} "
              f"eval_rel_l2={em.get('rel_l2', 0):.5f} "
              f"({sec_per_step:.3f}s/step)", flush=True)

        # Never checkpoint an unhealthy epoch: its params may sit ON
        # the cliff (finite but corrupted), and cliff recovery restores
        # the LATEST checkpoint — saving here would make recovery
        # restore the very state it is escaping.
        if epoch_healthy and (
                (epoch + 1) % cfg.train.ckpt_every_epochs == 0 or
                em.get("rel_l2", 1e9) < best_eval):
            best_eval = min(best_eval, em.get("rel_l2", 1e9))
            mngr.save(step_now, state, extra={
                "config": cfg.to_dict(),
                "epoch": epoch,
                "channel_mean": np.asarray(ds.channel_mean),
                "channel_std": np.asarray(ds.channel_std),
                "coord_extents": np.asarray(ds.coord_extents),
                "best_eval": float(best_eval),
            })
    prefetcher.close()
    if logger is not None:
        logger.close()
    mngr.close()


if __name__ == "__main__":
    main()
