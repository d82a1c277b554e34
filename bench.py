"""North-star benchmark: query points/sec/chip on the flagship model.

Measures the continuous-decoding hot path (the reference's
``evaluation.py`` dense-query loop and the training query/blend stack):
latent-grid gather + 8x ImNet MLP + multilinear blend per point, at
BASELINE.json config #3 scale (wide ImNet nf=32, lat_dims=32, 32k query
points per step, bf16 on TPU).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is relative to the reference-on-V100 estimate of 1.0e6
query points/sec (see BASELINE.md: the reference publishes no numbers;
estimate = V100 f32 effective FLOPs / ImNet FLOPs-per-point for the
unfused 8x-materializing torch path). North star: >= 5x.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_V100_PTS_PER_SEC = 1.0e6


def _devices_with_watchdog(timeout_s: float = 180.0):
    """Initialize the backend with a watchdog.

    The remote-TPU (axon) tunnel can wedge so hard that the first
    ``jax.devices()`` blocks forever (observed in round 3: >3 h).
    Without a watchdog the benchmark would then produce NO output at
    all; with one it emits a diagnostic JSON record and exits non-zero,
    so the capture distinguishes "framework regression" from
    "environment down"."""
    import concurrent.futures
    import jax

    with concurrent.futures.ThreadPoolExecutor(1) as pool:
        fut = pool.submit(jax.devices)
        try:
            return fut.result(timeout=timeout_s)
        except concurrent.futures.TimeoutError:
            print(json.dumps({
                "metric": "query_points_per_sec_per_chip",
                "value": 0.0,
                "unit": "points/s",
                "vs_baseline": 0.0,
                "error": "device backend initialization timed out "
                         f"after {timeout_s:.0f}s (TPU tunnel down?) — "
                         "not a framework failure; rerun when the "
                         "device is reachable",
            }), flush=True)
            os._exit(3)


def main():
    from space_time_pde_tpu.utils.platform import maybe_force_platform
    maybe_force_platform()          # STPDE_PLATFORM=cpu for host runs

    import jax
    import jax.numpy as jnp

    from space_time_pde_tpu.train import build_models
    from space_time_pde_tpu.utils.config import Config

    on_tpu = _devices_with_watchdog()[0].platform != "cpu"

    cfg = Config()
    cfg.model.lat_dims = 32
    cfg.model.imnet_nf = 32
    cfg.model.unet_nf = 16
    cfg.model.use_bf16 = bool(on_tpu)

    # Eval-scale latent grid (full-width low-res sequence) + 32k points.
    lres_shape = (8, 16, 64)
    n_pts = 32768
    unet, imnet = build_models(cfg, lres_shape)

    key = jax.random.PRNGKey(0)
    latent = jax.random.normal(
        key, (1, *lres_shape, cfg.model.lat_dims), jnp.float32)
    # Headline points = a dense row-major (t, z, x) lattice chunk with
    # one 512-wide x-row per kernel block — EXACTLY what the eval CLI's
    # dense_query decodes (experiments/rb2d/evaluation.py), satisfying
    # the kernel's points_sorted contract so the in-kernel sort+unsort
    # is skipped. Random (unsorted) points are reported as a detail.
    import numpy as np
    axes = [np.linspace(0, 1, n, dtype=np.float32) for n in (4, 16, 512)]
    tt, zz, xx = np.meshgrid(*axes, indexing="ij")
    coords = jnp.asarray(
        np.stack([tt, zz, xx], -1).reshape(1, n_pts, 3))
    coords_rand = jax.random.uniform(key, (1, n_pts, 3), jnp.float32)
    params = imnet.init(
        key, jnp.zeros((1, 3 + cfg.model.lat_dims)))["params"]

    from space_time_pde_tpu.models import query_local_implicit_grid
    if on_tpu and cfg.model.fused_query:
        from space_time_pde_tpu.ops.fused_query import (
            fused_query_local_implicit_grid,
        )
        query_fn = (lambda p, latent, pts:
                    fused_query_local_implicit_grid(
                        imnet, p, latent, pts, block_pts=512, pad_to=0,
                        points_sorted=True))
        query_fn_rand = (lambda p, latent, pts:
                         fused_query_local_implicit_grid(
                             imnet, p, latent, pts, block_pts=512,
                             pad_to=0))
        kernel = "pallas-fused (points_sorted eval path)"
    else:
        query_fn = (lambda p, latent, pts: query_local_implicit_grid(
            lambda v: imnet.apply({"params": p}, v), latent, pts))
        query_fn_rand = query_fn
        kernel = "jnp"

    # Chain K query steps on-device inside one jit (lax.scan) and fetch
    # a scalar once: per-call host round-trips through the remote TPU
    # tunnel would otherwise dominate, and the experimental plugin's
    # block_until_ready alone under-synchronizes (measured both ways).
    # K=500: the ~30 ms tunnel round trip amortizes to ~0.06 ms/step
    # (at the former K=50 it was ~0.6 ms/step — a 36% measurement
    # artifact on a ~1.5 ms step; calibrated with an empty-body scan).
    K = 500

    def make_run_k(qfn):
        @jax.jit
        def run_k(params, latent, coords):
            def body(carry, i):
                # Uniform epsilon shift: defeats loop-invariant hoisting
                # while preserving the lattice's sorted flat-cell order.
                c = jnp.clip(coords + carry * 1e-6, 0.0, 1.0)
                out = qfn(params, latent, c)
                return out.mean(), None
            carry, _ = jax.lax.scan(body, jnp.float32(0.0),
                                    jnp.arange(K))
            return carry
        return run_k

    run_k = make_run_k(query_fn)
    run_k_rand = make_run_k(query_fn_rand)

    # float() host-fetches the scalar — the only reliable sync point on
    # the experimental remote plugin (block_until_ready returns early).
    import time

    out = float(run_k(params, latent, coords))  # compile + warm
    assert jnp.isfinite(out), "non-finite benchmark output"
    # Best-of-N: each sample is already K chained device steps, so
    # min over samples removes remote-tunnel jitter (measured +-20%
    # run-to-run through the axon proxy), not real device variance.
    iters = 5
    secs = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run_k(params, latent, coords))
        secs.append((time.perf_counter() - t0) / K)
    sec = min(secs)
    pts_per_sec = n_pts / sec

    # Random (unsorted) points through the same kernel: pays the
    # in-kernel bitonic sort + unsort — the general-case number.
    rand_pts_per_sec = None
    if query_fn_rand is not query_fn:
        out = float(run_k_rand(params, latent, coords_rand))
        assert jnp.isfinite(out), "non-finite random-points output"
        rsecs = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_k_rand(params, latent, coords_rand))
            rsecs.append((time.perf_counter() - t0) / K)
        rand_pts_per_sec = round(n_pts / min(rsecs), 1)

    train = _bench_train_step(on_tpu) if on_tpu else None

    print(json.dumps({
        "metric": "query_points_per_sec_per_chip",
        "value": round(pts_per_sec, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_sec / REFERENCE_V100_PTS_PER_SEC, 3),
        "detail": {
            # Headline regime (since r04): sorted dense-lattice chunks
            # (points_sorted=True), the eval CLI's actual decode
            # pattern. Pre-r04 headlines measured random unsorted
            # points — compare those against random_points_per_sec.
            "headline_regime": "sorted_lattice_points",
            "sorted_points_per_sec": round(pts_per_sec, 1),
            "device": str(jax.devices()[0]),
            "kernel": kernel,
            "bf16": cfg.model.use_bf16,
            "n_pts_per_step": n_pts,
            "latent_grid": list(lres_shape) + [cfg.model.lat_dims],
            "imnet_nf": cfg.model.imnet_nf,
            "sec_per_step": sec,
            "timing": "best of %d x %d chained steps" % (iters, K),
            "random_points_per_sec": rand_pts_per_sec,
            "train": train,
        },
    }))


def _bench_train_step(on_tpu):
    """Training-step benchmark at the standard config (BASELINE.md
    round-2 protocol): B=8 crops, 512 MC points, full 2nd-order rb2d
    PDE loss through the fused Pallas jet, bf16 encoder policy with the
    f32 jet default. Scan-chained (make_multi_step) with a scalar host
    fetch as the sync point; reports ms/step and training points/s.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from space_time_pde_tpu.physics.systems import get_pde_layer
    from space_time_pde_tpu.train import build_models
    from space_time_pde_tpu.train.trainer import (
        init_state, make_loss_fn, make_multi_step, make_optimizer,
    )
    from space_time_pde_tpu.utils.config import Config

    cfg = Config()
    cfg.model.lat_dims = 32
    cfg.model.imnet_nf = 32
    cfg.model.unet_nf = 16
    cfg.model.use_bf16 = bool(on_tpu)
    lres_shape = (4, 16, 16)        # 16x128x128 crop at 4x/8x downsamp
    b, n_pts = 8, 512
    g = 100                         # chained optimizer steps/dispatch
    # (the ~30 ms dispatch round trip amortizes to ~0.3 ms/step)

    unet, imnet = build_models(cfg, lres_shape)
    pde = get_pde_layer("rb2d", mean=np.zeros(4), std=np.ones(4),
                        t_crop=1.0, z_crop=1.0, x_crop=1.0)
    tx = make_optimizer(cfg)
    state = init_state(jax.random.PRNGKey(0), cfg, unet, imnet, tx)
    loss_fn = make_loss_fn(cfg, unet, imnet, pde_layer=pde)
    step = make_multi_step(loss_fn, tx, g)

    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    stacked = {
        "lres": jax.random.normal(
            ks[0], (g, b, *lres_shape, 4), jnp.float32),
        "point_coord": jax.random.uniform(
            ks[1], (g, b, n_pts, 3), jnp.float32),
        "point_value": jax.random.normal(
            ks[2], (g, b, n_pts, 4), jnp.float32),
    }

    state, m = step(state, stacked)             # compile + warm
    assert jnp.isfinite(float(m["loss"])), "non-finite train bench loss"
    secs = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, m = step(state, stacked)
        float(m["loss"])                        # host-fetch sync
        secs.append((time.perf_counter() - t0) / g)
    sec = min(secs)
    return {
        "ms_per_step": round(sec * 1e3, 3),
        "train_points_per_sec": round(b * n_pts / sec, 1),
        "batch": b, "n_samp_pts_per_crop": n_pts,
        "pde": "rb2d jet (fused Pallas, f32 under bf16 policy)",
        "timing": "best of 3 x %d chained optimizer steps" % g,
    }


if __name__ == "__main__":
    main()
