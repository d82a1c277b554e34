"""Evaluation-driver internals: dense_query correctness on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import load_driver  # noqa: E402

from space_time_pde_tpu.models import ImNet, UNet3d  # noqa: E402


def test_dense_query_matches_direct_query():
    dense_query = load_driver("rb2d", "evaluation").dense_query
    from space_time_pde_tpu.models import query_local_implicit_grid

    igres = (4, 8, 8)
    unet = UNet3d(in_features=4, out_features=8, igres=igres, nf=8)
    imnet = ImNet(dim=3, in_features=8, out_features=4, nf=2)
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    lres = jnp.asarray(rng.randn(*igres, 4).astype(np.float32))
    params = {
        "unet": jax.jit(unet.init)(key, lres[None])["params"],
        "imnet": jax.jit(imnet.init)(key, jnp.zeros((1, 11)))["params"],
    }

    out_shape = (6, 10, 12)
    # Chunk smaller than the lattice to exercise chunking + padding.
    pred = dense_query(unet, imnet, params, lres, out_shape, chunk=128,
                       fused=False)
    assert pred.shape == (*out_shape, 4)

    latent = unet.apply({"params": params["unet"]}, lres[None])
    axes = [np.linspace(0, 1, n, dtype=np.float32) for n in out_shape]
    TT, ZZ, XX = np.meshgrid(*axes, indexing="ij")
    pts = jnp.asarray(np.stack([TT, ZZ, XX], -1).reshape(1, -1, 3))
    want = query_local_implicit_grid(
        lambda v: imnet.apply({"params": params["imnet"]}, v), latent, pts)
    np.testing.assert_allclose(
        pred.reshape(-1, 4), np.asarray(want[0]), rtol=1e-5, atol=1e-5)


def test_dense_query_fused_windowed_matches_jnp():
    """The ACTUAL eval-CLI decode path (fused kernel, points_sorted
    lattice chunks, edge-repeat chunk padding) on a latent grid large
    enough (6615 cells > 2048) to take the windowed in-kernel-gather
    dispatch — interpret mode on CPU, vs the jnp oracle."""
    dense_query = load_driver("rb2d", "evaluation").dense_query
    from space_time_pde_tpu.models import query_local_implicit_grid

    igres = (8, 16, 64)                     # 7*15*63 = 6615 cells
    unet = UNet3d(in_features=4, out_features=8, igres=igres, nf=8)
    imnet = ImNet(dim=3, in_features=8, out_features=4, nf=2)
    key = jax.random.PRNGKey(1)
    rng = np.random.RandomState(1)
    lres = jnp.asarray(rng.randn(*igres, 4).astype(np.float32))
    params = {
        "unet": jax.jit(unet.init)(key, lres[None])["params"],
        "imnet": jax.jit(imnet.init)(key, jnp.zeros((1, 11)))["params"],
    }

    # Hi-res lattice with X == the eval block size (512): one x-row per
    # kernel block, the production chunk geometry; odd T*Z so the last
    # chunk is partial (edge-repeat padding in play).
    out_shape = (3, 5, 512)
    pred = dense_query(unet, imnet, params, lres, out_shape,
                       chunk=2048, fused=True, interpret=True)
    assert pred.shape == (*out_shape, 4)

    latent = unet.apply({"params": params["unet"]}, lres[None])
    axes = [np.linspace(0, 1, n, dtype=np.float32) for n in out_shape]
    TT, ZZ, XX = np.meshgrid(*axes, indexing="ij")
    pts = jnp.asarray(np.stack([TT, ZZ, XX], -1).reshape(1, -1, 3))
    want = query_local_implicit_grid(
        lambda v: imnet.apply({"params": params["imnet"]}, v), latent, pts)
    # bf16 compute in the fused eval path: tolerance matches the
    # kernel's bf16 operand rounding.
    np.testing.assert_allclose(
        pred.reshape(-1, 4), np.asarray(want[0]), rtol=0.05, atol=0.02)


def test_dense_decoder_compute_dtype_plumbed():
    """make_dense_decoder(compute_dtype=f32) reaches the fused kernel:
    the f32 decode matches the jnp oracle to f32 tolerance (the bf16
    default only matches to ~5e-2), and the provenance record says so
    — the eval CLIs print it with every reported number (round-5:
    decode dtype now follows the checkpoint's use_bf16 policy)."""
    from space_time_pde_tpu.inference import make_dense_decoder
    from space_time_pde_tpu.models import query_local_implicit_grid

    igres = (4, 8, 8)
    unet = UNet3d(in_features=4, out_features=8, igres=igres, nf=8)
    imnet = ImNet(dim=3, in_features=8, out_features=4, nf=2)
    key = jax.random.PRNGKey(2)
    rng = np.random.RandomState(2)
    lres = jnp.asarray(rng.randn(*igres, 4).astype(np.float32))
    params = {
        "unet": jax.jit(unet.init)(key, lres[None])["params"],
        "imnet": jax.jit(imnet.init)(key, jnp.zeros((1, 11)))["params"],
    }
    out_shape = (3, 4, 32)
    dec = make_dense_decoder(unet, imnet, out_shape, chunk=256,
                             fused=True, interpret=True,
                             compute_dtype=jnp.float32)
    assert dec.provenance["compute_dtype"] == "float32"
    assert dec.provenance["kernel"].startswith("pallas-fused")
    pred = np.asarray(dec(params, lres))

    latent = unet.apply({"params": params["unet"]}, lres[None])
    axes = [np.linspace(0, 1, n, dtype=np.float32) for n in out_shape]
    TT, ZZ, XX = np.meshgrid(*axes, indexing="ij")
    pts = jnp.asarray(np.stack([TT, ZZ, XX], -1).reshape(1, -1, 3))
    want = np.asarray(query_local_implicit_grid(
        lambda v: imnet.apply({"params": params["imnet"]}, v),
        latent, pts)[0]).reshape(*out_shape, 4)
    np.testing.assert_allclose(pred, want, rtol=2e-4, atol=2e-5)


def test_stitch_plan_covers_every_frame():
    from space_time_pde_tpu.inference import stitch_plan

    for t_total, nt, stride in [(200, 16, 8), (50, 16, 16), (37, 8, 5),
                                (16, 16, 8), (21, 16, 100)]:
        t0s = stitch_plan(t_total, nt, stride)
        covered = np.zeros(t_total, bool)
        for t0 in t0s:
            assert 0 <= t0 <= t_total - nt
            covered[t0:t0 + nt] = True
        assert covered.all(), (t_total, nt, stride, t0s)
        assert t0s[-1] == t_total - nt          # end always clamped
        assert t0s == sorted(set(t0s))          # strictly increasing

    import pytest
    with pytest.raises(ValueError):
        stitch_plan(10, 16, 8)


def test_stitch_weights_shape_and_symmetry():
    from space_time_pde_tpu.inference import stitch_weights

    for nt in (4, 5, 16):
        w = stitch_weights(nt)
        assert w.shape == (nt,)
        assert (w >= 1.0).all()                 # never zero at edges
        np.testing.assert_allclose(w, w[::-1])  # symmetric cross-fade
        assert w.argmax() in (nt // 2 - 1, nt // 2, (nt - 1) // 2)


def test_stitched_accumulation_reconstructs_global_field():
    """The drivers' --full_sequence path (inference.stitched_decode,
    shared by rb2d and turb3d) is exact when each window prediction is
    a slice of one global field: overlapping triangular weights blend
    identical values, so the stitched output equals the field up to
    float summation error. Covers both the 3-D (T,Z,X) and 4-D
    (T,Z,Y,X) field ranks, including denormalization."""
    from space_time_pde_tpu.inference import stitched_decode

    rng = np.random.RandomState(3)
    for spatial in ((4, 5), (3, 4, 5)):
        T_total, C = 23, 4
        field = rng.randn(T_total, *spatial, C).astype(np.float32)
        nt, stride = 8, 3
        mean = rng.randn(C).astype(np.float32)
        std = (0.5 + rng.rand(C)).astype(np.float32)

        # stub decoder: "lres" IS the window start frame; prediction is
        # the NORMALIZED global-field slice for that window
        def decoder(params, t0):
            t0 = int(t0)
            return (field[t0:t0 + nt] - mean) / std

        pred, starts = stitched_decode(
            decoder, None, lambda t0: t0, T_total, nt, stride, spatial,
            channel_mean=mean, channel_std=std)
        assert starts[0] == 0 and starts[-1] == T_total - nt
        np.testing.assert_allclose(pred, field, rtol=1e-4, atol=1e-5)


def test_fit_dense_decoder_shrinks_right_knob_on_oom():
    """fit_dense_decoder maps the two OOM classes to the right knobs:
    scoped-VMEM (the Pallas kernel's chunk-independent footprint —
    the flagship-size 4-D f32 decode exceeded v5e's limit at
    block_pts=128, BASELINE.md round 5) halves block_pts; HBM/chunk
    OOM halves chunk; everything else propagates."""
    import pytest
    from space_time_pde_tpu.inference import fit_dense_decoder

    calls = []

    def build(chunk, block_pts):
        calls.append((chunk, block_pts))

        def dec(params, lres):
            if block_pts > 64:
                raise RuntimeError(
                    "Scoped allocation ... exceeded scoped vmem limit")
            if chunk > 8192:
                raise RuntimeError("Ran out of memory allocating ...")
            return jnp.zeros((4,))
        return dec

    dec = fit_dense_decoder(build, None, None, chunk=16384, block_pts=128)
    assert calls == [(16384, 128), (16384, 64), (8192, 64)]
    assert dec(None, None).shape == (4,)

    def build_bad(chunk, block_pts):
        def dec(params, lres):
            raise ValueError("unrelated failure")
        return dec

    with pytest.raises(ValueError, match="unrelated"):
        fit_dense_decoder(build_bad, None, None, chunk=16384)

    # The floors stop the shrinking loops: the final OOM propagates.
    with pytest.raises(RuntimeError, match="vmem"):
        fit_dense_decoder(build, None, None, chunk=16384, block_pts=128,
                          min_chunk=16384, min_block=128)
