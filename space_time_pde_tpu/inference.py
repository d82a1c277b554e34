"""Dense-lattice inference: the eval CLIs' decode path.

TPU-native equivalent of the reference's dense super-resolution decode
(reference ``experiments/rb2d/evaluation.py``: a Python loop of
memory-bounded ``query_local_implicit_grid`` chunk calls). Here the
encode and the chunked decode run in ONE jitted program: a ``lax.map``
over uniform point chunks replaces the host-side chunk loop, so a
window costs one dispatch and one device->host fetch instead of one
per chunk. Through this environment's remote-TPU tunnel each dispatch
is a ~0.4 s round trip, which dominated the decode (measured
0.01-0.03M pts/s end to end before this change); per-window jit
closures also recompiled the kernel every window. Build the decoder
ONCE per eval shape and call it per window.
"""

import jax
import jax.numpy as jnp
import numpy as np

from space_time_pde_tpu.models import query_local_implicit_grid

__all__ = ["make_dense_decoder", "stitch_plan", "stitch_weights",
           "stitched_decode", "igres_mismatch_note"]


def igres_mismatch_note(eval_igres, train_igres, homogeneous_axes=()):
    """Shape-transfer guard shared by the eval CLIs: a warning string
    when the eval-time latent grid differs from the training igres,
    else None.

    GroupNorm conv encoders do not unconditionally shape-generalize —
    normalization statistics are spatial averages, so they shift with
    grid size (round-4 measured 50x-inflated latents and rel-L2 ~13
    when a 16^3-crop-trained UNet4d decoded 32^3 windows). Extension
    along a statistically HOMOGENEOUS axis is the tested-safe case
    (tests/test_shape_transfer.py): the spatial averages converge to
    the same values over a wider extent of a stationary field.

    Args:
      eval_igres, train_igres: latent grid tuples (same length).
      homogeneous_axes: axis indices whose extension is regression-
        tested safe (rb2d passes (2,): x is periodic/stationary).
    """
    eval_igres, train_igres = tuple(eval_igres), tuple(train_igres)
    if eval_igres == train_igres:
        return None
    safe = all(
        e == t or (i in homogeneous_axes and e > t)
        for i, (e, t) in enumerate(zip(eval_igres, train_igres)))
    if safe:
        return (
            f"NOTE: eval latent grid {eval_igres} != training igres "
            f"{train_igres}; rebuilding the encoder at the eval grid. "
            "This extension is along a statistically homogeneous axis "
            "only — regression-tested safe for GroupNorm (latent stats "
            "bounded), but check latent statistics if the data family "
            "changes.")
    return (
        f"WARNING: eval latent grid {eval_igres} != training igres "
        f"{train_igres}. Conv encoders do NOT reliably shape-"
        "generalize: GroupNorm statistics shift with grid size (a "
        "16^3-crop-trained UNet4d produced 50x-inflated latents on "
        "the 2x grid — rel-L2 18 vs 0.007 in-shape). For reported "
        "numbers train with crops spanning the full spatial domain so "
        "the eval igres matches training, or use --norm batch (running "
        "stats are grid-size invariant).")


def stitch_plan(t_total, nt, stride, t0=0):
    """Window start frames covering ``[t0, t_total)`` at ``stride``.

    The final window is clamped so the sequence end is always covered
    (it may overlap its predecessor by more than ``nt - stride``).
    Beyond-reference capability: the reference evaluates one window at
    a time (reference ``experiments/rb2d/evaluation.py``); this plans a
    seamless decode of an ENTIRE simulation.
    """
    if nt > t_total - t0:
        raise ValueError(f"window nt={nt} exceeds frames {t_total - t0}")
    stride = max(1, int(stride))
    t0s = list(range(t0, t_total - nt + 1, stride))
    if t0s[-1] != t_total - nt:
        t0s.append(t_total - nt)
    return t0s


def stitch_weights(nt):
    """Triangular cross-fade weights for overlapping window stitching.

    Peak in the window middle, weight 1 at the edges; overlapping
    windows blend proportionally (a frame seen late in window i and
    early in window i+1 trusts whichever sees it nearer its middle —
    the latent grid's interior, where the implicit field is best
    conditioned). Frames covered by a single window divide out exactly.
    """
    idx = np.arange(nt, dtype=np.float32)
    return np.minimum(idx + 1.0, nt - idx)


def stitched_decode(decoder, params, window_lres, t_total, nt, stride,
                    spatial_shape, out_features=4,
                    channel_mean=0.0, channel_std=1.0):
    """Decode an entire ``t_total``-frame sequence by stitching
    overlapping ``nt``-frame windows under the triangular cross-fade
    (the eval CLIs' ``--full_sequence`` path, shared by the 3-D rb2d
    and 4-D turb3d drivers).

    Args:
      decoder: a :func:`make_dense_decoder` result for ONE window's
        dense lattice ``(nt, *spatial_shape)``.
      params: the model param pytree passed through to ``decoder``.
      window_lres: callable ``t0 -> lres`` producing the NORMALIZED
        low-res encoder input for the window ``[t0, t0 + nt)``.
      t_total: frames in the full sequence.
      stride: window start stride (frames).
      spatial_shape: the dense spatial lattice, e.g. ``(Z, X)`` or
        ``(Z, Y, X)``.
      channel_mean, channel_std: denormalization applied to each
        window's prediction BEFORE blending (so the stitched output is
        in physical units).

    Returns:
      ``(pred, starts)`` — ``pred`` of shape
      ``[t_total, *spatial_shape, out_features]`` in physical units,
      and the window start list. Frames covered by a single window
      divide out exactly; overlapping frames cross-fade.
    """
    bshape = (1,) * (len(spatial_shape) + 1)
    w = stitch_weights(nt).reshape(nt, *bshape)
    acc = np.zeros((t_total, *spatial_shape, out_features), np.float32)
    wacc = np.zeros((t_total, *bshape), np.float32)
    starts = stitch_plan(t_total, nt, stride)

    # Keep up to `depth` windows' decodes in flight: window i's D2H
    # fetch + host accumulate overlap the device compute of windows
    # i+1..i+depth (each in-flight window holds one dense output,
    # ~16 MB at the flagship geometries, in HBM).
    depth = 8
    pending = []

    def drain(keep):
        while len(pending) > keep:
            t0, out = pending.pop(0)
            pred_n = np.asarray(out)
            acc[t0:t0 + nt] += w * (pred_n * channel_std + channel_mean)
            wacc[t0:t0 + nt] += w

    for t0 in starts:
        pending.append(
            (t0, decoder(params, jnp.asarray(window_lres(int(t0))))))
        drain(depth - 1)
    drain(0)
    return acc / wacc, starts


def fit_dense_decoder(build, params, probe_lres, chunk, block_pts=512,
                      min_chunk=2048, min_block=32):
    """Build a dense decoder, shrinking geometry until the compiled
    program fits the device's memory limits.

    ``build(chunk, block_pts)`` must return a :func:`make_dense_decoder`
    result. The probe dispatches ONE real decode (its compile populates
    the jit cache, so the subsequent per-window calls at the same shapes
    pay nothing extra) with a scalar host fetch as the sync point (the
    remote-TPU tunnel's ``block_until_ready`` under-synchronizes —
    BASELINE.md). Two failure classes map to two knobs:

    - a **scoped-vmem** failure is the Pallas KERNEL's footprint
      (parameter tiles + per-block activations; chunk-independent —
      measured: halving chunk left the scoped allocation at exactly
      17.27M) → halve ``block_pts``;
    - any other out-of-memory (HBM / resource exhausted) is the
      ``lax.map`` chunk buffer → halve ``chunk``.

    Why: the flagship-size 4-D model (lat=64, imnet_nf=64) decoding in
    f32 (the round-5 dtype plumbing — r4 silently decoded bf16, whose
    kernel footprint is half) exceeds v5e's ~16.8 MB scoped-vmem limit
    by ~3% at block_pts=128 (``log/r5_turb3d_200x_big/evals.log``),
    failing only at decode time. This makes every checkpoint decodable
    out of the box, with the fitted geometry in the provenance line.
    """
    while True:
        dec = build(chunk, block_pts)
        try:
            out = dec(params, probe_lres)
            float(jnp.ravel(out)[0])   # sync: surfaces compile errors
            return dec
        except Exception as e:   # jax runtime errors share no base
            msg = str(e).lower()
            if "vmem" in msg and block_pts > min_block:
                print(f"NOTE: dense-decode kernel at block_pts="
                      f"{block_pts} exceeds scoped VMEM; retrying at "
                      f"block_pts={block_pts // 2}", flush=True)
                block_pts //= 2
                continue
            oom = ("out of memory" in msg or "resource exhausted" in msg)
            if oom and chunk > min_chunk:
                print(f"NOTE: dense decode at chunk={chunk} exceeds "
                      f"device memory; retrying at chunk={chunk // 2}",
                      flush=True)
                chunk //= 2
                continue
            raise


def make_dense_decoder(unet, imnet, out_shape, chunk=65536, fused=None,
                       batch_stats=None, interpret=False, block_pts=512,
                       compute_dtype=None):
    """Build a one-dispatch dense decoder ``decode(params, lres)``.

    Args:
      unet, imnet: flax modules (UNet3d/UNet4d encoder, ImNet decoder).
      out_shape: the dense output lattice, e.g. ``(T, Z, X)`` (3-D) or
        ``(T, Z, Y, X)`` (4-D); points are the uniform unit lattice in
        row-major order, which satisfies the fused kernel's
        ``points_sorted`` contract by construction.
      chunk: points per ``lax.map`` step — bounds the live intermediate
        memory exactly like the old host-side chunk loop did.
      fused: None auto-selects the Pallas fused kernel on TPU (the
        north-star throughput path) and the jnp path elsewhere.
      batch_stats: running stats for norm="batch" checkpoints.
      interpret: run the fused kernel in Pallas interpret mode (CI on
        CPU exercises the exact eval decode path).
      block_pts: fused-kernel point-block size (512 for 3-D, 128 for
        the 16-corner 4-D kernel).
      compute_dtype: fused-kernel matmul dtype. None keeps the kernel
        default (bf16). Eval CLIs pass this from the checkpoint's
        ``use_bf16`` policy so an f32-trained model also DECODES in f32
        — previously the fused path silently decoded bf16 regardless
        (measured 0.16% relative vs f32 at the flagship config, but the
        reported numbers' provenance should not depend on an
        undocumented dtype).

    Returns:
      ``decode(params, lres) -> [*out_shape, out_features]`` device
      array; ``params`` is the ``{"unet":..., "imnet":...}`` pytree.
    """
    if fused is None:
        fused = jax.devices()[0].platform != "cpu"
    if fused:
        from space_time_pde_tpu.ops.fused_query import (
            fused_query_local_implicit_grid,
        )
    fused_kwargs = {}
    if compute_dtype is not None:
        fused_kwargs["compute_dtype"] = jnp.dtype(compute_dtype)

    dim = len(out_shape)
    axes = [np.linspace(0, 1, n, dtype=np.float32) for n in out_shape]
    mesh = np.meshgrid(*axes, indexing="ij")
    pts = np.stack(mesh, -1).reshape(-1, dim)
    n = pts.shape[0]
    pad = (-n) % chunk
    # Edge-repeat (not zero) padding keeps the tail chunk sorted in
    # flat cell id, preserving the points_sorted fast-path contract.
    pts = np.pad(pts, ((0, pad), (0, 0)), mode="edge")
    pts_chunks = jnp.asarray(pts.reshape(-1, chunk, dim))

    @jax.jit
    def decode(params, lres):
        uvars = {"params": params["unet"]}
        if batch_stats is not None:
            uvars["batch_stats"] = batch_stats
        latent = unet.apply(uvars, lres[None])

        if fused:
            def body(pts_c):
                # Dense row-major lattice chunks are globally
                # non-decreasing in flat cell id, satisfying the
                # points_sorted contract (ops/fused_query.py) — skips
                # the in-kernel sort + unsort (measured 26.4M vs 25.1M
                # pts/s at the bench config); the runtime fits-guard
                # still protects correctness.
                return fused_query_local_implicit_grid(
                    imnet, params["imnet"], latent, pts_c[None],
                    block_pts=block_pts, pad_to=0,
                    points_sorted=True, interpret=interpret,
                    **fused_kwargs)[0]
        else:
            def body(pts_c):
                return query_local_implicit_grid(
                    lambda v: imnet.apply({"params": params["imnet"]}, v),
                    latent, pts_c[None])[0]

        out = jax.lax.map(body, pts_chunks)
        return out.reshape(-1, out.shape[-1])[:n].reshape(*out_shape, -1)

    # Provenance record: the eval CLIs print this so every reported
    # number carries its decode path + dtype + geometry.
    decode.provenance = {
        "backend": jax.devices()[0].platform,
        "kernel": ("pallas-fused" + (" (interpret)" if interpret else "")
                   if fused else "jnp"),
        "compute_dtype": (str(jnp.dtype(compute_dtype)) if fused and
                          compute_dtype is not None
                          else ("bfloat16" if fused else "float32")),
        "out_shape": tuple(out_shape), "chunk": int(chunk),
        "block_pts": int(block_pts),
    }
    return decode
