"""Training engine: jitted loss/step functions and state handling.

TPU-native equivalent of the reference's ``experiments/rb2d/train.py``
hot loop: encode the low-res crop with UNet3d, query the local implicit
grid at the sampled continuous points, regression loss (L1/L2/Huber
selectable via ``reg_loss_type``) against the hi-res point ground truth,
PDE residual loss at the same points (second-order derivatives via the
compiled sympy layer), total = reg + alpha_pde * pde, Adam with global
gradient clipping.

Differences from the reference's structure (TPU-first):
- ONE jitted, purely-functional train step containing everything —
  encoder, query, all second-order physics derivatives, loss, grads,
  optimizer update — so XLA fuses and schedules the whole step (the
  reference builds second-order autograd graphs per step in Python);
- ``nn.DataParallel`` is replaced by `parallel.dp` (shard_map + psum);
  this module is mesh-agnostic — the same step function runs single-
  device or wrapped in a mesh;
- optional bf16 compute policy on the models with f32 parameters,
  f32 physics/loss accumulation.
"""

from __future__ import annotations


from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from space_time_pde_tpu.models import (
    ImNet,
    UNet3d,
    query_local_implicit_grid,
)
from space_time_pde_tpu.physics.pde import PDELayer
from space_time_pde_tpu.utils.config import Config

__all__ = [
    "TrainState", "build_models", "init_state", "make_loss_fn",
    "make_train_step", "make_eval_fn", "make_optimizer",
]


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    key: jnp.ndarray
    # Running statistics of the optional BatchNorm mode (norm="batch");
    # None (the default) for the functional GroupNorm models.
    batch_stats: Any = None


def build_models(cfg: Config, lres_shape: Tuple[int, int, int],
                 bn_axis_name: Optional[str] = None
                 ) -> Tuple[UNet3d, ImNet]:
    dtype = jnp.bfloat16 if cfg.model.use_bf16 else jnp.float32
    unet = UNet3d(
        in_features=cfg.model.in_channels,
        out_features=cfg.model.lat_dims,
        igres=tuple(lres_shape),
        nf=cfg.model.unet_nf,
        mf=cfg.model.unet_mf,
        negative_slope=cfg.model.negative_slope,
        dtype=dtype,
        activation=cfg.model.activation,
        norm=cfg.model.norm,
        bn_axis_name=bn_axis_name,
    )
    imnet = ImNet(
        dim=3,
        in_features=cfg.model.lat_dims,
        out_features=cfg.model.out_channels,
        nf=cfg.model.imnet_nf,
        activation=cfg.model.activation,
        negative_slope=cfg.model.negative_slope,
        dtype=dtype,
    )
    return unet, imnet


def make_optimizer(cfg: Config, steps_per_epoch: int = 1000,
                   lr_scale: float = 1.0) -> optax.GradientTransformation:
    """``lr_scale`` uniformly rescales the schedule — used by cliff
    auto-recovery to continue a restored run at reduced lr without
    changing the opt_state pytree (so checkpoints stay compatible)."""
    if cfg.train.lr_schedule == "cosine":
        sched = optax.cosine_decay_schedule(
            cfg.train.lr * lr_scale, cfg.train.epochs * steps_per_epoch)
    else:
        sched = cfg.train.lr * lr_scale
    tx = optax.adam(sched)
    if cfg.train.clip_grad and cfg.train.clip_grad > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.train.clip_grad), tx)
    # Skip (don't apply) any update whose grads contain non-finite
    # values instead of corrupting params: clip_by_global_norm maps an
    # inf norm to all-NaN grads, and one spiked step (measured: inf
    # grad_norm at epoch 71 of an otherwise-healthy f32 run,
    # BASELINE.md round-2) would otherwise kill the run. Gives up after
    # 100 consecutive bad steps so a genuinely diverged run still stops
    # (the driver aborts on non-finite loss).
    return optax.apply_if_finite(tx, max_consecutive_errors=100)


def init_state(key, cfg: Config, unet: UNet3d, imnet: ImNet,
               tx: optax.GradientTransformation) -> TrainState:
    k1, k2, k3 = jax.random.split(key, 3)
    t, z, x = unet.igres
    lres = jnp.zeros((1, t, z, x, cfg.model.in_channels))
    coords = jnp.zeros((1, 3 + cfg.model.lat_dims))
    # jit the inits: eager init dispatches hundreds of op-by-op
    # compiles (measured 10-40 s on CPU, and ~0.4 s PER OP through the
    # remote-TPU tunnel); one compiled init program is ~5x faster.
    uvars = jax.jit(unet.init)(k1, lres)
    params = {
        "unet": uvars["params"],
        "imnet": jax.jit(imnet.init)(k2, coords)["params"],
    }
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        key=k3,
        batch_stats=uvars.get("batch_stats"),
    )


def _reg_loss(kind: str, pred, target):
    err = pred - target
    if kind == "l1":
        return jnp.mean(jnp.abs(err))
    if kind == "l2":
        return jnp.mean(jnp.square(err))
    if kind == "huber":
        return jnp.mean(optax.losses.huber_loss(pred, target, delta=1.0))
    raise ValueError(f"unknown reg_loss_type {kind!r}")


def make_forward_fn(unet: UNet3d, imnet: ImNet,
                    query_fn: Optional[Callable] = None,
                    imnet_query_fn: Optional[Callable] = None):
    """Returns fwd(params, lres, coords[, batch_stats]) -> fields at coords.

    query_fn overrides the LIG query implementation (signature
    ``(decoder, latent, coords)``); imnet_query_fn is the params-aware
    variant ``(imnet_params, latent, coords)`` needed by the fused
    Pallas kernel (it repacks raw params instead of calling a decoder
    closure). Default is the pure-jnp path. ``batch_stats`` is only
    needed for the BatchNorm encoder mode (inference uses the running
    averages).
    """
    query = query_fn or query_local_implicit_grid

    def forward(params, lres, coords, batch_stats=None):
        uvars = {"params": params["unet"]}
        if batch_stats is not None:
            uvars["batch_stats"] = batch_stats
        latent = unet.apply(uvars, lres)
        if imnet_query_fn is not None:
            return imnet_query_fn(params["imnet"], latent, coords)
        decoder = lambda v: imnet.apply({"params": params["imnet"]}, v)
        return query(decoder, latent, coords)

    return forward


def make_loss_fn(cfg: Config, unet: UNet3d, imnet: ImNet,
                 pde_layer: Optional[PDELayer],
                 query_fn: Optional[Callable] = None):
    """loss_fn(params, batch) -> (loss, metrics dict).

    batch: lres [B,t,z,x,C], point_coord [B,N,3], point_value [B,N,V].
    The PDE residuals are evaluated at the same sampled points
    (reference behavior), re-using one encoder pass.
    """
    from space_time_pde_tpu.models.nonlinearities import PIECEWISE_LINEAR

    alpha = cfg.train.alpha_pde
    kind = cfg.train.reg_loss_type
    # The analytic jet (ops/jet.py) replaces nested-jvp towers with one
    # forward + D tangent passes; it is exact for piecewise-linear
    # decoders and systems of derivative order <= 2, and supplies the
    # reg prediction for free. Fall back to towers otherwise.
    # pde_derivs: "jet" auto-selects the fused Pallas jet kernel on TPU
    # (ops/fused_jet.py — custom-VJP, so the TRAINING step runs the
    # Pallas path) and the jnp jet elsewhere; "jet_jnp" forces the jnp
    # jet; "tower" forces nested-jvp towers.
    derivs = getattr(cfg.train, "pde_derivs", "jet")
    use_jet = (pde_layer is not None and alpha > 0
               and query_fn is None
               and derivs in ("jet", "jet_jnp")
               and getattr(imnet, "activation", "leaky_relu")
               in PIECEWISE_LINEAR
               and pde_layer.max_derivative_order() <= 2)
    use_fused_jet = (use_jet and derivs == "jet"
                     and cfg.model.fused_query
                     and jax.devices()[0].platform != "cpu")
    # The jet runs f32 even under use_bf16 unless --pde_bf16 opts in:
    # 2nd-order residuals are small differences of large terms, and a
    # measured bf16 run (BASELINE.md round-2) trains normally for ~14
    # epochs then blows up through the PDE loss (grad_norm 1.6e5 ->
    # NaN) where the identical f32-jet run is stable. The encoder and
    # regression query keep the bf16 policy — that's where the FLOPs
    # are; the jet is ~1/3 of the step.
    pde_bf16 = getattr(cfg.train, "pde_bf16", False)
    jet_dtype = (jnp.bfloat16 if (cfg.model.use_bf16 and pde_bf16)
                 else jnp.float32)

    def loss_fn(params, batch, batch_stats=None):
        lres = batch["lres"]
        coords = batch["point_coord"]
        target = batch["point_value"]

        if batch_stats is not None:
            latent, uvars = unet.apply(
                {"params": params["unet"], "batch_stats": batch_stats},
                lres, train=True, mutable=["batch_stats"])
        else:
            latent = unet.apply({"params": params["unet"]}, lres)
        decoder = lambda v: imnet.apply({"params": params["imnet"]}, v)
        query = query_fn or query_local_implicit_grid
        fwd = lambda pts: query(decoder, latent, pts)

        if use_fused_jet:
            from space_time_pde_tpu.ops.fused_jet import fused_query_jet
            # dim=4 has 2x the corner rows and 4/3 the tangent chains
            # per point, and widths scale with nf — smaller point
            # blocks keep the chain activations inside VMEM.
            bp = 256 if imnet.dim == 3 else 64
            if imnet.nf > 64:
                bp = min(bp, 128)
            pred, jac, hess = fused_query_jet(
                imnet, params["imnet"], latent, coords,
                block_pts=bp, compute_dtype=jet_dtype)
        elif use_jet:
            from space_time_pde_tpu.ops.jet import (
                query_local_implicit_grid_jet,
            )
            # clone(dtype=...) overrides the module's compute policy for
            # the jet only (ImNet casts its input to self.dtype).
            jet_imnet = imnet.clone(dtype=jet_dtype)
            jet_dec = lambda v: jet_imnet.apply(
                {"params": params["imnet"]}, v)
            pred, jac, hess = query_local_implicit_grid_jet(
                jet_dec, latent.astype(jet_dtype), coords)
        else:
            pred = fwd(coords)
        reg = _reg_loss(kind, pred, target)
        metrics = {"reg_loss": reg}

        if pde_layer is not None and alpha > 0:
            pde_total, per_eq = pde_layer.residual_loss(
                coords, fwd=fwd,
                jet=(pred, jac, hess) if use_jet else None,
                kind=getattr(cfg.train, "pde_loss_type", "l2"))
            metrics["pde_loss"] = pde_total
            for n, v in per_eq.items():
                metrics[f"pde/{n}"] = v
            loss = reg + alpha * pde_total
        else:
            loss = reg
        metrics["loss"] = loss
        if batch_stats is not None:
            # Updated running stats ride the aux dict under a reserved
            # key; the step functions pop it into TrainState (and must
            # never pmean it — BatchNorm's bn_axis_name already syncs).
            metrics["_batch_stats"] = uvars["batch_stats"]
        return loss, metrics

    return loss_fn


def _apply_grads(state: TrainState, tx, grads, metrics
                 ) -> Tuple[TrainState, Dict]:
    """Shared state-update tail: optimizer update + batch_stats pop."""
    new_stats = metrics.pop("_batch_stats", state.batch_stats)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics["grad_norm"] = optax.global_norm(grads)
    return TrainState(step=state.step + 1, params=params,
                      opt_state=opt_state, key=state.key,
                      batch_stats=new_stats), metrics


def _loss_args(state: TrainState):
    """Extra loss_fn args: BatchNorm stats when that mode is active."""
    return (state.batch_stats,) if state.batch_stats is not None else ()


def make_train_step(loss_fn, tx: optax.GradientTransformation,
                    jit: bool = True):
    """One optimizer step. Mesh-agnostic; see parallel.dp for shard_map."""

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch,
                                   *_loss_args(state))
        return _apply_grads(state, tx, grads, metrics)

    if jit:
        step = jax.jit(step, donate_argnums=(0,))
    return step


def make_multi_step(loss_fn, tx: optax.GradientTransformation,
                    n_inner: int, jit: bool = True):
    """G optimizer steps per dispatch via lax.scan over stacked batches.

    step(state, stacked_batch) where every batch array has a leading
    [n_inner, ...] axis. Returns (state after G steps, metrics of the
    last step). Amortizes per-dispatch host/tunnel latency — on this
    environment's remote TPU a single dispatch round-trip (~30 ms)
    otherwise dwarfs the ~10 ms device step.
    """

    def step(state: TrainState, stacked_batch):
        # Keys prefixed "_const_" are per-dispatch constants (e.g. the
        # HBM-resident training field): scan-invariant, passed whole to
        # every inner step instead of being sliced along the leading
        # axis.
        const = {k[len("_const_"):]: v for k, v in stacked_batch.items()
                 if k.startswith("_const_")}
        scanned = {k: v for k, v in stacked_batch.items()
                   if not k.startswith("_const_")}

        def one(state: TrainState, batch):
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, {**batch, **const},
                                       *_loss_args(state))
            return _apply_grads(state, tx, grads, metrics)

        return jax.lax.scan(one, state, scanned)

    if jit:
        step = jax.jit(step, donate_argnums=(0,))

    def step_last_metrics(state, stacked_batch):
        state, metrics = step(state, stacked_batch)
        return state, jax.tree.map(lambda m: m[-1], metrics)

    return step_last_metrics


def make_eval_fn(cfg: Config, unet: UNet3d, imnet: ImNet,
                 query_fn: Optional[Callable] = None, jit: bool = True,
                 imnet_query_fn: Optional[Callable] = None):
    """Relative-L2 of predictions vs point ground truth (the paper's
    SR quality metric, computed on held-out crops)."""
    forward = make_forward_fn(unet, imnet, query_fn,
                              imnet_query_fn=imnet_query_fn)

    def eval_fn(params, batch, batch_stats=None):
        pred = forward(params, batch["lres"], batch["point_coord"],
                       batch_stats)
        target = batch["point_value"]
        num = jnp.sqrt(jnp.sum(jnp.square(pred - target)))
        den = jnp.sqrt(jnp.sum(jnp.square(target))) + 1e-12
        per_ch_num = jnp.sqrt(jnp.sum(jnp.square(pred - target), (0, 1)))
        per_ch_den = jnp.sqrt(jnp.sum(jnp.square(target), (0, 1))) + 1e-12
        return {"rel_l2": num / den,
                "rel_l2_per_channel": per_ch_num / per_ch_den}

    return jax.jit(eval_fn) if jit else eval_fn
