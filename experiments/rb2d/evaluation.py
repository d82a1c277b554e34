"""RB2D evaluation / inference driver (CLI).

TPU-native equivalent of the reference's
``experiments/rb2d/evaluation.py``: load a checkpoint, encode a low-res
input sequence once, query the implicit field on a dense high-res
space-time lattice in memory-bounded chunks (the jitted chunk query is
the north-star throughput path), save an ``.npz`` of the predicted
fields, optionally render comparison frames (matplotlib), and report
rel-L2 errors vs the ground truth.

Example:
    python experiments/rb2d/evaluation.py \
        --ckpt ./log/checkpoints --data_folder ./data \
        --eval_data rb2d_ra1e6_s42.npz --eval_t0 0 \
        --save_path ./log/eval_pred.npz --render_frames 4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from space_time_pde_tpu.utils.platform import maybe_force_platform
maybe_force_platform()

import jax
import jax.numpy as jnp
import numpy as np

from space_time_pde_tpu.data import RB2DataLoader
from space_time_pde_tpu.inference import (
    fit_dense_decoder, make_dense_decoder, stitched_decode)
from space_time_pde_tpu.train import build_models, init_state
from space_time_pde_tpu.train.trainer import make_optimizer
from space_time_pde_tpu.utils.checkpoint import CheckpointManager
from space_time_pde_tpu.utils.config import Config, add_args


def dense_query(unet, imnet, params, lres, out_shape, chunk=65536,
                fused=None, batch_stats=None, interpret=False):
    """Encode once, decode a [T,Z,X] lattice in chunks -> [T,Z,X,4].

    One-shot convenience over :func:`make_dense_decoder`; for repeated
    windows build the decoder once (avoids per-call recompiles).
    """
    decoder = make_dense_decoder(
        unet, imnet, out_shape, chunk=chunk, fused=fused,
        batch_stats=batch_stats, interpret=interpret)
    return np.asarray(decoder(params, lres))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    add_args(parser)
    parser.add_argument("--ckpt", type=str, required=True,
                        help="checkpoint directory (orbax)")
    parser.add_argument("--eval_t0", type=int, default=0,
                        help="start frame of the eval window")
    parser.add_argument("--eval_nt", type=int, default=0,
                        help="frames in the eval window (0 = --nt)")
    parser.add_argument("--save_path", type=str, default="eval_pred.npz")
    parser.add_argument("--render_frames", type=int, default=0,
                        help="render N comparison frames as PNG")
    parser.add_argument("--save_animation", type=str, default="",
                        help="write a GT-vs-prediction GIF to this path")
    parser.add_argument("--query_chunk", type=int, default=65536)
    parser.add_argument(
        "--block_pts", type=int, default=512,
        help="fused-kernel point-block size (see the 4-D driver's "
             "--block_pts help; the auto-fit probe halves it on "
             "scoped-VMEM overflow)")
    parser.add_argument(
        "--eval_windows", type=int, default=1,
        help="evaluate N windows evenly spaced through the data "
             "(starting at --eval_t0) and report mean/std rel-L2; "
             "npz/frames/animation come from the first window")
    parser.add_argument(
        "--full_sequence", action="store_true",
        help="decode the ENTIRE simulation: overlapping nt-frame "
             "windows stitched with a triangular temporal cross-fade "
             "(inference.stitch_plan/stitch_weights); reports one "
             "global rel-L2 and saves the full [T,Z,X,4] prediction. "
             "Beyond-reference: the reference evaluates one window.")
    parser.add_argument(
        "--stitch_stride", type=int, default=0,
        help="window stride (frames) for --full_sequence; 0 = nt/2")
    parser.add_argument(
        "--decode_dtype", choices=["auto", "bf16", "f32"], default="auto",
        help="fused-kernel matmul dtype for the dense decode. 'auto' "
             "follows the checkpoint's use_bf16 policy (f32-trained "
             "models decode f32); 'bf16'/'f32' force it. The decode "
             "path + dtype are printed with every reported number.")
    parser.add_argument(
        "--matmul_precision",
        choices=["default", "tensorfloat32", "highest"], default="default",
        help="jax_default_matmul_precision for the ENCODER convs. On "
             "TPU, 'default' multiplies f32 operands in bf16 (one MXU "
             "pass) — the same numerics training used; 'highest' uses "
             "the 6-pass near-exact-f32 scheme. The backend+precision "
             "pair is the provenance of every reported number "
             "(BASELINE.md: CPU f32 evals of a TPU-default-precision-"
             "trained model differ measurably).")
    parser.add_argument(
        "--fetch_dtype", choices=["f32", "f16"], default="f32",
        help="dtype the dense prediction is FETCHED to host in. The "
             "eval CLI's steady-state wall time is the device-to-host "
             "fetch of each 16 MB window through the remote-TPU tunnel "
             "(decomposition printed below; BASELINE.md); 'f16' halves "
             "the bytes. f16 rounding is ~2.4e-4 RMS per element — "
             "negligible against rel-L2 ~5e-3 (adds in quadrature: "
             "<0.2%) but not bit-identical, so f32 stays the default.")
    parser.add_argument(
        "--split", choices=["custom", "val", "test"], default="custom",
        help="named split protocol (data/splits.py): 'val'/'test' pick "
             "the canonical independent-simulation file (unless "
             "--eval_data is given) and that split's deterministic "
             "windows; 'custom' keeps --eval_t0/--eval_windows behavior")
    args = parser.parse_args()
    # Flags the user actually typed (vs argparse defaults) — needed so a
    # CLI value can also override a checkpointed value BACK to a
    # flag's default. Re-parse with every default suppressed: only
    # explicitly-passed dests survive, so prefix abbreviations
    # (e.g. ``--eval_wind 8``) resolve correctly too.
    for action in parser._actions:
        action.default = argparse.SUPPRESS
    explicit = set(vars(parser.parse_known_args()[0]))

    if args.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)

    mngr = CheckpointManager(args.ckpt)
    raw_state, extra = mngr.restore()
    cfg = Config.from_dict(extra["config"]) if "config" in extra else None
    if cfg is None:
        raise RuntimeError("checkpoint has no config metadata")
    # Training-time latent grid, from the CHECKPOINT's data config
    # (captured before CLI overrides rewrite cfg.data for eval).
    train_igres = (cfg.data.nt // cfg.data.downsamp_t,
                   cfg.data.nz // cfg.data.downsamp_xz,
                   cfg.data.nx // cfg.data.downsamp_xz)
    # CLI data flags override the checkpointed data config.
    for flag in ("data_folder", "eval_data", "nt", "nz", "nx",
                 "downsamp_t", "downsamp_xz", "lres_filter", "lres_interp"):
        if flag in explicit:
            setattr(cfg.data, flag, getattr(args, flag))
    if args.split != "custom" and "eval_data" not in explicit:
        from space_time_pde_tpu.data.splits import SplitSpec
        cfg.data.eval_data = getattr(SplitSpec.canonical(),
                                     f"{args.split}_data")
        print(f"split={args.split}: evaluating {cfg.data.eval_data}")

    ds = RB2DataLoader(
        data_folder=cfg.data.data_folder, data_filename=cfg.data.eval_data,
        nt=cfg.data.nt, nz=cfg.data.nz, nx=cfg.data.nx,
        downsamp_t=cfg.data.downsamp_t, downsamp_xz=cfg.data.downsamp_xz,
        normalize_output=cfg.data.normalize_channels,
        lres_filter=cfg.data.lres_filter, lres_interp=cfg.data.lres_interp)
    if "channel_mean" in extra:
        ds.channel_mean = np.asarray(extra["channel_mean"], np.float32)
        ds.channel_std = np.asarray(extra["channel_std"], np.float32)

    eval_nt = args.eval_nt or cfg.data.nt
    lres0 = jnp.asarray(ds.full_lres_sequence(args.eval_t0, eval_nt))
    # Shape-transfer guard (tests/test_shape_transfer.py): the flagship
    # geometry extends only x, RB2D's periodic/stationary axis — the
    # tested-safe case. z extension (boundary layers) or shrinking any
    # axis gets the loud warning.
    from space_time_pde_tpu.inference import igres_mismatch_note
    note = igres_mismatch_note(lres0.shape[:3], train_igres,
                               homogeneous_axes=(2,))
    if note:
        print(note, flush=True)
    unet, imnet = build_models(cfg, lres0.shape[:3])
    tx = make_optimizer(cfg)
    template = init_state(jax.random.PRNGKey(0), cfg, unet, imnet, tx)
    state, _ = mngr.restore(template)
    print(f"restored step {int(state.step)}; lres {lres0.shape}")

    T_hi = eval_nt
    Z_hi, X_hi = ds.data.shape[1], ds.data.shape[2]
    if args.split != "custom":
        from space_time_pde_tpu.data.splits import test_windows, \
            val_windows
        n_windows = (args.eval_windows if "eval_windows" in explicit
                     else 4)
        pick = val_windows if args.split == "val" else test_windows
        t0s = pick(ds.data.shape[0], eval_nt, n_windows)
    else:
        n_windows = max(1, args.eval_windows)
        max_t0 = ds.data.shape[0] - eval_nt
        t0s = np.unique(np.linspace(args.eval_t0, max_t0, n_windows)
                        .astype(int))

    import time

    if args.decode_dtype == "auto":
        decode_dtype = jnp.bfloat16 if cfg.model.use_bf16 else jnp.float32
    else:
        decode_dtype = (jnp.bfloat16 if args.decode_dtype == "bf16"
                        else jnp.float32)
    probe_t0 = 0 if args.full_sequence else int(t0s[0])
    probe_lres = jnp.asarray(ds.full_lres_sequence(probe_t0, eval_nt))
    decoder = fit_dense_decoder(
        lambda c, b: make_dense_decoder(unet, imnet, (T_hi, Z_hi, X_hi),
                                        chunk=c, block_pts=b,
                                        batch_stats=state.batch_stats,
                                        compute_dtype=decode_dtype),
        state.params, probe_lres, chunk=args.query_chunk,
        block_pts=args.block_pts)
    prov = decoder.provenance
    print(f"decode provenance: backend={prov['backend']} "
          f"kernel={prov['kernel']} dtype={prov['compute_dtype']} "
          f"matmul_precision={args.matmul_precision} "
          f"fetch_dtype={args.fetch_dtype} "
          f"chunk={prov['chunk']} block_pts={prov['block_pts']} "
          f"eval_data={cfg.data.eval_data} step={int(state.step)} "
          f"windows={'full_sequence' if args.full_sequence else list(map(int, t0s))}",
          flush=True)
    if args.full_sequence and ({"eval_t0", "eval_windows"} & explicit):
        print("NOTE: --full_sequence decodes the whole simulation; "
              "--eval_t0/--eval_windows are ignored.", flush=True)
    if args.full_sequence:
        # Stitched decode of the whole simulation: accumulate each
        # window's prediction under a triangular temporal weight, then
        # normalize. Frames covered by one window divide out exactly.
        T_total = ds.data.shape[0]
        stride = args.stitch_stride or max(1, eval_nt // 2)
        tq0 = time.perf_counter()
        pred, starts = stitched_decode(
            decoder, state.params,
            lambda t0: ds.full_lres_sequence(t0, eval_nt),
            T_total, eval_nt, stride, (Z_hi, X_hi),
            channel_mean=ds.channel_mean, channel_std=ds.channel_std)
        tq = time.perf_counter() - tq0
        gt = ds.data
        n_q = len(starts) * eval_nt * Z_hi * X_hi
        print(f"stitched {len(starts)} windows (stride {stride}) over "
              f"{T_total} frames: {n_q} pts in {tq:.2f}s = "
              f"{n_q / tq / 1e6:.2f}M pts/s (includes compile)",
              flush=True)
        rel_l2 = float(np.linalg.norm(pred - gt) /
                       (np.linalg.norm(gt) + 1e-12))
        per_ch = np.asarray([
            float(np.linalg.norm(pred[..., c] - gt[..., c]) /
                  (np.linalg.norm(gt[..., c]) + 1e-12))
            for c in range(4)])
        per_frame = np.linalg.norm(
            (pred - gt).reshape(T_total, -1), axis=1) / (
            np.linalg.norm(gt.reshape(T_total, -1), axis=1) + 1e-12)
        print(f"full-sequence rel_l2 = {rel_l2:.5f}  per-channel "
              f"(p,b,u,w) = " + " ".join(f"{v:.5f}" for v in per_ch))
        print(f"per-frame rel_l2: min {per_frame.min():.5f} "
              f"median {np.median(per_frame):.5f} "
              f"max {per_frame.max():.5f}")
        t0s = []

    all_rel, all_per_ch = [], []
    if not args.full_sequence:
        pred = gt = None
    # Dispatch every window's decode before fetching any result: the
    # decodes queue on the device, so window i's dense-field D2H fetch
    # overlaps window i+1's encode+decode (through this environment's
    # remote-TPU tunnel the 16 MB fetch is a large share of the
    # per-window wall time — decomposition printed below and recorded
    # in BASELINE.md).
    th0 = time.perf_counter()
    lres_list = [
        lres0 if int(t0) == args.eval_t0
        else jnp.asarray(ds.full_lres_sequence(int(t0), eval_nt))
        for t0 in t0s]
    t_host = time.perf_counter() - th0
    td0 = time.perf_counter()
    outs = [decoder(state.params, lres) for lres in lres_list]
    if args.fetch_dtype == "f16":
        # Cast on device so the D2H fetch below moves half the bytes.
        outs = [o.astype(jnp.float16) for o in outs]
    if outs:
        # Scalar fetch as the sync point (the tunnel's
        # block_until_ready under-synchronizes, BASELINE.md): after
        # this, window 0's compute (incl. compile) is done and windows
        # 1..N-1 are executing behind the fetches below.
        _ = float(outs[0].ravel()[0])
    t_first = time.perf_counter() - td0
    n_q = T_hi * Z_hi * X_hi
    t_fetch = []
    for wi, t0 in enumerate(t0s):
        tf0 = time.perf_counter()
        pred_n = np.asarray(outs[wi])
        tq = time.perf_counter() - tf0
        t_fetch.append(tq)
        print(f"  window t0={int(t0)}: fetch(+overlapped compute) "
              f"{tq:.2f}s", flush=True)
        pred_w = pred_n * ds.channel_std + ds.channel_mean    # denormalize
        gt_w = ds.data[t0:t0 + eval_nt]
        rel = np.linalg.norm(pred_w - gt_w) / (np.linalg.norm(gt_w)
                                               + 1e-12)
        per_ch_w = [
            float(np.linalg.norm(pred_w[..., c] - gt_w[..., c]) /
                  (np.linalg.norm(gt_w[..., c]) + 1e-12))
            for c in range(4)]
        all_rel.append(float(rel))
        all_per_ch.append(per_ch_w)
        if wi == 0:
            pred, gt = pred_w, gt_w
        print(f"window t0={t0}: rel_l2 = {rel:.5f}", flush=True)

    if not args.full_sequence and t0s is not None and len(t0s):
        total = t_host + t_first + sum(t_fetch)
        n_all = len(t0s) * n_q
        line = (f"  pipeline: lres host assembly {t_host:.2f}s + "
                f"window-0 compute {t_first:.2f}s (incl. compile) + "
                f"fetch/overlapped-compute {sum(t_fetch):.2f}s = "
                f"{total:.2f}s -> {n_all / total / 1e6:.2f}M pts/s "
                f"end to end")
        if len(t0s) > 1:
            steady = sum(t_fetch[1:])
            line += (f"; steady-state (post-compile windows) "
                     f"{(len(t0s) - 1) * n_q / steady / 1e6:.2f}M pts/s")
        print(line, flush=True)
    if not args.full_sequence:
        rel_l2 = float(np.mean(all_rel))
        per_ch = np.mean(np.asarray(all_per_ch), axis=0)
        print(f"rel_l2 = {rel_l2:.5f} (std {np.std(all_rel):.5f} over "
              f"{len(t0s)} windows)  per-channel (p,b,u,w) = "
              + " ".join(f"{v:.5f}" for v in per_ch))

    os.makedirs(os.path.dirname(os.path.abspath(args.save_path)),
                exist_ok=True)
    np.savez_compressed(
        args.save_path,
        p=pred[..., 0], b=pred[..., 1], u=pred[..., 2], w=pred[..., 3],
        rel_l2=rel_l2, rel_l2_per_channel=np.asarray(per_ch))
    print(f"saved predictions to {args.save_path}")

    if args.save_animation:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.animation as manim
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 4, figsize=(16, 5))
        names = ["p", "b", "u", "w"]
        ims = []
        for c in range(4):
            vmin = float(min(gt[..., c].min(), pred[..., c].min()))
            vmax = float(max(gt[..., c].max(), pred[..., c].max()))
            for j, field in enumerate((gt, pred)):
                ax = axes[j, c]
                im = ax.imshow(field[0, :, :, c], origin="lower",
                               aspect="auto", cmap="RdBu_r",
                               vmin=vmin, vmax=vmax)
                ax.set_title(f"{names[c]} "
                             f"{'GT' if j == 0 else 'pred'}")
                ax.set_xticks([]); ax.set_yticks([])
                ims.append((im, j, c))
        fig.tight_layout()

        def update(fi):
            for im, j, c in ims:
                im.set_data((gt if j == 0 else pred)[fi, :, :, c])
            return [im for im, _, _ in ims]

        anim = manim.FuncAnimation(fig, update, frames=pred.shape[0],
                                   blit=True)
        os.makedirs(os.path.dirname(os.path.abspath(args.save_animation))
                    or ".", exist_ok=True)
        anim.save(args.save_animation, writer=manim.PillowWriter(fps=8))
        plt.close(fig)
        print(f"saved animation to {args.save_animation}")

    if args.render_frames > 0:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        out_dir = os.path.splitext(args.save_path)[0] + "_frames"
        os.makedirs(out_dir, exist_ok=True)
        idxs = np.linspace(0, pred.shape[0] - 1,
                           args.render_frames).astype(int)
        names = ["p", "b", "u", "w"]
        for fi in idxs:
            fig, axes = plt.subplots(4, 2, figsize=(10, 12))
            for c in range(4):
                for j, (field, title) in enumerate(
                        ((gt, "ground truth"), (pred, "prediction"))):
                    ax = axes[c, j]
                    im = ax.imshow(field[fi, :, :, c], origin="lower",
                                   aspect="auto", cmap="RdBu_r")
                    ax.set_title(f"{names[c]} {title} (t={fi})")
                    fig.colorbar(im, ax=ax)
            fig.tight_layout()
            fig.savefig(os.path.join(out_dir, f"frame_{fi:04d}.png"),
                        dpi=80)
            plt.close(fig)
        print(f"rendered {len(idxs)} frames to {out_dir}")
    mngr.close()


if __name__ == "__main__":
    main()
