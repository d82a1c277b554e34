"""turb3d evaluation driver (CLI): dense 4-D super-resolution.

Loads a turb3d checkpoint, encodes a low-res 4-D window once, decodes
the implicit field on the dense high-res (t, z, y, x) lattice in
chunks (fused Pallas kernel on TPU — n_corners=16), reports rel-L2 vs
ground truth, and saves the predicted fields as npz. The 4-D analog of
experiments/rb2d/evaluation.py.

Example:
    python experiments/turb3d/evaluation.py \
        --ckpt ./log/turb3d/checkpoints --data_folder ./data \
        --eval_data abc_flow.npz --save_path ./log/turb3d/pred.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from space_time_pde_tpu.utils.platform import maybe_force_platform
maybe_force_platform()

import jax
import jax.numpy as jnp
import numpy as np

from space_time_pde_tpu.data.dataset4d import Field4DDataset
from space_time_pde_tpu.inference import (
    fit_dense_decoder, make_dense_decoder,
)
from space_time_pde_tpu.models import UNet4d
from space_time_pde_tpu.train.trainer import make_optimizer
from space_time_pde_tpu.utils.checkpoint import CheckpointManager
from space_time_pde_tpu.utils.config import Config

from train import build_turb3d_models, init_state4d  # noqa: E402


def dense_query4d(unet, imnet, params, lres, out_shape, chunk=32768,
                  fused=None, interpret=False):
    """Encode once, decode a [T,Z,Y,X] lattice in chunks -> [...,4].

    One-shot convenience over
    :func:`space_time_pde_tpu.inference.make_dense_decoder` (4-D
    instance: 16-corner fused kernel, block_pts=128); for repeated
    windows build the decoder once (avoids per-call recompiles).
    """
    decoder = make_dense_decoder(
        unet, imnet, out_shape, chunk=chunk, fused=fused,
        interpret=interpret, block_pts=128)
    return np.asarray(decoder(params, lres))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--data_folder", type=str, default=None)
    parser.add_argument("--eval_data", type=str, default=None)
    parser.add_argument("--eval_t0", type=int, default=0)
    parser.add_argument(
        "--eval_windows", type=int, default=1,
        help="evaluate N windows evenly spaced through the data "
             "(reported rel-L2 is their mean; npz comes from the first)")
    parser.add_argument(
        "--split", choices=["custom", "val", "test"], default="custom",
        help="named split protocol (data/splits.py): 'val'/'test' pick "
             "the canonical Beltrami-realization file beltrami_s{7,123}"
             ".npz (unless --eval_data is given) and that split's "
             "deterministic windows; 'custom' keeps --eval_t0 behavior")
    parser.add_argument("--save_path", type=str, default="turb3d_pred.npz")
    parser.add_argument("--query_chunk", type=int, default=32768)
    parser.add_argument(
        "--block_pts", type=int, default=128,
        help="fused-kernel point-block size. The flagship-size model "
             "decoding in f32 needs 64 on v5e (the auto-fit probe finds "
             "this, at one wasted remote compile per halving — pass it "
             "explicitly to skip the probe retries; BASELINE.md)")
    parser.add_argument(
        "--decode_dtype", choices=["auto", "bf16", "f32"], default="auto",
        help="fused-kernel matmul dtype for the dense decode. 'auto' "
             "follows the checkpoint's use_bf16 policy; the decode "
             "path + dtype are printed with every reported number.")
    parser.add_argument(
        "--matmul_precision",
        choices=["default", "tensorfloat32", "highest"], default="default",
        help="jax_default_matmul_precision for the encoder convs "
             "(see experiments/rb2d/evaluation.py --help)")
    parser.add_argument(
        "--fetch_dtype", choices=["f32", "f16"], default="f32",
        help="dtype dense predictions are FETCHED to host in; 'f16' "
             "halves the tunnel-bound D2H bytes (see "
             "experiments/rb2d/evaluation.py --help and BASELINE.md)")
    parser.add_argument(
        "--full_sequence", action="store_true",
        help="decode the ENTIRE simulation: overlapping nt-frame "
             "windows stitched with a triangular temporal cross-fade "
             "(inference.stitch_plan/stitch_weights, same scheme as "
             "rb2d); reports one global rel-L2 and saves the full "
             "[T,Z,Y,X,4] prediction")
    parser.add_argument(
        "--stitch_stride", type=int, default=0,
        help="window stride (frames) for --full_sequence; 0 = nt/2")
    args = parser.parse_args()

    if args.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)

    mngr = CheckpointManager(args.ckpt)
    _, extra = mngr.restore()
    cfg = Config.from_dict(extra["config"])
    targs = extra["turb3d_args"]

    class A:
        pass

    a = A()
    for k, v in targs.items():
        setattr(a, k, float(v) if k == "viscosity" else int(v))
    a.use_bf16 = cfg.model.use_bf16

    eval_data = args.eval_data or cfg.data.eval_data
    if args.split != "custom" and args.eval_data is None:
        from space_time_pde_tpu.data.splits import CANONICAL_SEEDS
        eval_data = f"beltrami_s{CANONICAL_SEEDS[args.split]}.npz"
        print(f"split={args.split}: evaluating {eval_data}")
    ds = Field4DDataset(
        data_folder=args.data_folder or cfg.data.data_folder,
        data_filename=eval_data,
        nt=a.nt, nz=a.nz, ny=a.ny, nx=a.nx,
        downsamp_t=a.downsamp_t, downsamp_xyz=a.downsamp_xyz)
    ds.channel_mean = np.asarray(extra["channel_mean"], np.float32)
    ds.channel_std = np.asarray(extra["channel_std"], np.float32)

    unet, imnet = build_turb3d_models(a, ds.lres_shape)
    tx = make_optimizer(cfg)
    template = init_state4d(jax.random.PRNGKey(0), a, unet, imnet, tx,
                            ds.lres_shape)
    state, _ = mngr.restore(template)
    print(f"restored step {int(state.step)}")

    # Window start frames: deterministic split grid or --eval_t0.
    n_frames = ds.data.shape[0]
    if args.split != "custom":
        from space_time_pde_tpu.data.splits import test_windows, \
            val_windows
        pick = val_windows if args.split == "val" else test_windows
        t0s = pick(n_frames, a.nt, max(1, args.eval_windows))
    elif args.eval_windows > 1:
        t0s = np.unique(np.linspace(
            args.eval_t0, n_frames - a.nt,
            args.eval_windows).astype(int))
    else:
        t0s = np.asarray([args.eval_t0])

    hi_shape = ds.data[:a.nt].shape[:4]
    lres_sizes = (max(2, a.nt // a.downsamp_t),
                  max(2, hi_shape[1] // a.downsamp_xyz),
                  max(2, hi_shape[2] // a.downsamp_xyz),
                  max(2, hi_shape[3] // a.downsamp_xyz))
    # Rebuild the encoder for this window's lres shape if it differs
    # from the training crop (igres is a static UNet4d attribute).
    if tuple(lres_sizes) != tuple(ds.lres_shape):
        from space_time_pde_tpu.inference import igres_mismatch_note
        # No axis is tested-safe in 4-D (the r4 v1 failure was exactly
        # this rebuild): always the loud warning.
        print(igres_mismatch_note(lres_sizes, ds.lres_shape), flush=True)
        unet = UNet4d(in_features=4, out_features=a.lat_dims,
                      igres=tuple(lres_sizes), nf=a.unet_nf,
                      mf=a.unet_mf)
    from scipy.interpolate import RegularGridInterpolator
    axes = [np.linspace(0, s - 1, l)
            for s, l in zip(hi_shape, lres_sizes)]
    lat_pts = np.stack(np.meshgrid(*axes, indexing="ij"),
                       -1).reshape(-1, 4)

    import time

    if args.decode_dtype == "auto":
        decode_dtype = jnp.bfloat16 if cfg.model.use_bf16 else jnp.float32
    else:
        decode_dtype = (jnp.bfloat16 if args.decode_dtype == "bf16"
                        else jnp.float32)
    def window_lres(t0):
        window = ds.data[t0:t0 + a.nt]            # [nt, Z, Y, X, 4]
        interp = RegularGridInterpolator(
            [np.arange(s) for s in hi_shape], window)
        lres = interp(lat_pts).reshape(*lres_sizes, -1).astype(np.float32)
        return window, (lres - ds.channel_mean) / ds.channel_std

    probe_t0 = 0 if args.full_sequence else int(t0s[0])
    probe_lres = jnp.asarray(window_lres(probe_t0)[1])
    decoder = fit_dense_decoder(
        lambda c, b: make_dense_decoder(unet, imnet, hi_shape, chunk=c,
                                        block_pts=b,
                                        compute_dtype=decode_dtype),
        state.params, probe_lres, chunk=args.query_chunk,
        block_pts=args.block_pts)
    prov = decoder.provenance
    print(f"decode provenance: backend={prov['backend']} "
          f"kernel={prov['kernel']} dtype={prov['compute_dtype']} "
          f"matmul_precision={args.matmul_precision} "
          f"fetch_dtype={args.fetch_dtype} "
          f"chunk={prov['chunk']} block_pts={prov['block_pts']} "
          f"eval_data={eval_data} "
          f"windows={'full_sequence' if args.full_sequence else list(map(int, t0s))}",
          flush=True)
    if args.full_sequence and (args.eval_t0 != 0 or args.eval_windows != 1):
        print("NOTE: --full_sequence decodes the whole simulation; "
              "--eval_t0/--eval_windows are ignored.", flush=True)

    if args.full_sequence:
        from space_time_pde_tpu.inference import stitched_decode
        # Stitched decode of the whole simulation (same triangular
        # temporal cross-fade as rb2d's --full_sequence; frames covered
        # by a single window divide out exactly).
        T_total = n_frames
        stride = args.stitch_stride or max(1, a.nt // 2)
        tq0 = time.perf_counter()
        pred, starts = stitched_decode(
            decoder, state.params, lambda t0: window_lres(t0)[1],
            T_total, a.nt, stride, hi_shape[1:],
            channel_mean=ds.channel_mean, channel_std=ds.channel_std)
        tq = time.perf_counter() - tq0
        gt = ds.data
        n_q = len(starts) * int(np.prod(hi_shape))
        print(f"stitched {len(starts)} windows (stride {stride}) over "
              f"{T_total} frames: {n_q} pts in {tq:.2f}s = "
              f"{n_q / tq / 1e6:.2f}M pts/s (includes compile)",
              flush=True)
        rel = float(np.linalg.norm(pred - gt) /
                    (np.linalg.norm(gt) + 1e-12))
        per_ch = np.asarray([
            float(np.linalg.norm(pred[..., c] - gt[..., c]) /
                  (np.linalg.norm(gt[..., c]) + 1e-12))
            for c in range(4)])
        per_frame = np.linalg.norm(
            (pred - gt).reshape(T_total, -1), axis=1) / (
            np.linalg.norm(gt.reshape(T_total, -1), axis=1) + 1e-12)
        print(f"full-sequence rel_l2 = {rel:.5f}  per-channel "
              f"(p,u,v,w) = " + " ".join(f"{v:.5f}" for v in per_ch))
        print(f"per-frame rel_l2: min {per_frame.min():.5f} "
              f"median {np.median(per_frame):.5f} "
              f"max {per_frame.max():.5f}")
        t0s, first_pred = [], pred

    rels, per_chs = [], []
    if not args.full_sequence:
        first_pred = None
    # Dispatch each window's decode as soon as its host-side lres is
    # assembled: window i+1's scipy interpolation and window i's D2H
    # fetch both overlap window i's device compute (same pipelining as
    # the rb2d driver; decomposition recorded in BASELINE.md).
    windows, outs = [], []
    th0 = time.perf_counter()
    for t0 in t0s:
        window, lres = window_lres(int(t0))
        windows.append(window)
        out = decoder(state.params, jnp.asarray(lres))
        if args.fetch_dtype == "f16":
            # Cast on device so the D2H fetch moves half the bytes.
            out = out.astype(jnp.float16)
        outs.append(out)
    if outs:
        _ = float(outs[0].ravel()[0])   # tunnel-safe sync point
    t_first = time.perf_counter() - th0
    n_q = int(np.prod(hi_shape))
    t_fetch = []
    for wi, t0 in enumerate(t0s):
        tf0 = time.perf_counter()
        pred_n = np.asarray(outs[wi])
        tq = time.perf_counter() - tf0
        t_fetch.append(tq)
        print(f"  window t0={int(t0)}: fetch(+overlapped compute) "
              f"{tq:.2f}s", flush=True)
        pred = pred_n * ds.channel_std + ds.channel_mean
        gt = windows[wi]
        rel = float(np.linalg.norm(pred - gt) /
                    (np.linalg.norm(gt) + 1e-12))
        per_chs.append([float(np.linalg.norm(pred[..., c] - gt[..., c]) /
                              (np.linalg.norm(gt[..., c]) + 1e-12))
                        for c in range(4)])
        rels.append(rel)
        if first_pred is None:
            first_pred = pred
        print(f"window t0={t0}: rel_l2 = {rel:.5f}", flush=True)
    if not args.full_sequence and len(t0s):
        total = t_first + sum(t_fetch)
        line = (f"  pipeline: host assembly + window-0 compute "
                f"{t_first:.2f}s (incl. compile) + fetch/overlapped-"
                f"compute {sum(t_fetch):.2f}s = {total:.2f}s -> "
                f"{len(t0s) * n_q / total / 1e6:.2f}M pts/s end to end")
        if len(t0s) > 1:
            steady = sum(t_fetch[1:])
            line += (f"; steady-state (post-compile windows) "
                     f"{(len(t0s) - 1) * n_q / steady / 1e6:.2f}M pts/s")
        print(line, flush=True)
    if not args.full_sequence:
        rel = float(np.mean(rels))
        per_ch = np.mean(per_chs, axis=0)
        print(f"rel_l2 = {rel:.5f} (std {np.std(rels):.5f} over "
              f"{len(t0s)} windows)  per-channel (p,u,v,w) = "
              + " ".join(f"{v:.5f}" for v in per_ch))

    os.makedirs(os.path.dirname(os.path.abspath(args.save_path)),
                exist_ok=True)
    np.savez_compressed(
        args.save_path, p=first_pred[..., 0], u=first_pred[..., 1],
        v=first_pred[..., 2], w=first_pred[..., 3], rel_l2=rel,
        rel_l2_per_channel=np.asarray(per_ch),
        window_starts=np.asarray(t0s))
    print(f"saved predictions to {args.save_path}")
    mngr.close()


if __name__ == "__main__":
    main()
