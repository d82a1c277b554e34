"""On-device batch assembly: the data pipeline inside the XLA graph.

The reference's training data path (``experiments/rb2d/
dataloader_spacetime.py::__getitem__``, SURVEY.md §3.5) runs scipy
interpolators in CPU worker processes; round 1 replicated that with
vectorized host numpy and it still floored the training loop (~10 ms of
host work per batch vs a ~3 ms device step).

TPU-native answer: the whole simulation field is uploaded to HBM ONCE
(RB2D at 200x512x128x4 f32 is ~52 MB — trivial against 16 GB), and the
per-step work — low-res lattice reads, continuous-point ground-truth
reads, normalization — becomes a few batched multilinear gathers JITTED
INTO THE TRAIN STEP itself. The host contribution per step shrinks to
drawing crop origins and uniform sample points (microseconds, ~50 KB
H2D), and with ``--inner_steps`` the G batches of a dispatch are
assembled on-device inside the same ``lax.scan``.

Supported for the default degradation (``lres_filter='none'``); the
anti-alias-filter variants keep the host pipeline (they need the full
crop field on the host, and are off the reference's default path).
Both ``linear`` and ``nearest`` lattice interpolation are supported.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from space_time_pde_tpu.ops.grid_interp import _locate, corner_offsets

__all__ = ["DeviceSampler"]


def _crop_geometry(ds):
    """(crop_sizes, lres_sizes) for either the 3-D RB2DataLoader or the
    4-D Field4DDataset (dimension-agnostic adapter)."""
    if hasattr(ds, "crop"):            # Field4DDataset
        return tuple(ds.crop), tuple(ds.lres)
    return (ds.nt, ds.nz, ds.nx), (ds.nt_l, ds.nz_l, ds.nx_l)


class DeviceSampler:
    """Device-side equivalent of the host ``sample_batch`` (N-d).

    Built from a host dataset (shares its normalization stats and crop
    geometry); ``batch_fn`` maps (origins [B, D] int32, pts [B, N, D])
    to the same batch dict the host pipeline produces — but as traced
    jnp ops, so it fuses into the jitted train step. Works for the 3-D
    RB2D dataset and the 4-D turbulence dataset alike.
    """

    def __init__(self, ds):
        if getattr(ds, "lres_filter", "none") != "none":
            raise ValueError(
                "DeviceSampler supports lres_filter='none' only "
                f"(got {ds.lres_filter!r}); use the host pipeline")
        self._host_data = np.asarray(ds.data)          # for refresh()
        # The HBM-resident field is kept FLAT 1-D. A [*spatial, C] array
        # gets a (8,128)-tiled device layout whose minor dims (e.g. a
        # 32-node axis, or C=4) pad up to the 128-lane tile — at 200
        # stacked simulations that turned a 2.34 GB field into a 9.4 GB
        # re-layout copy inside the step (observed OOM: 17.65/15.75 GB).
        # A 1-D array takes the padding-free T(1024) layout and every
        # read below is a flat gather with precomputed element strides.
        self.field_spatial = tuple(int(s) for s in ds.data.shape[:-1])
        self.n_ch = int(ds.data.shape[-1])
        # Flatten ON THE HOST: reshaping after upload compiles a device
        # program whose 5-D input takes the padded tiled layout (the
        # very thing we're avoiding — observed as an 80 GB copy).
        self.data = jnp.asarray(self._host_data.reshape(-1))
        strides = np.ones(len(self.field_spatial), np.int64)
        for a in range(len(self.field_spatial) - 2, -1, -1):
            strides[a] = strides[a + 1] * self.field_spatial[a + 1]
        # Node stride in ELEMENTS of the flat array (channel-minor).
        self._strides = (strides * self.n_ch).astype(np.int32)
        if int(np.prod(self.field_spatial)) * self.n_ch >= 2**31:
            raise ValueError("device field exceeds int32 flat indexing")
        self.mean = jnp.asarray(ds.channel_mean, jnp.float32)
        self.std = jnp.asarray(ds.channel_std, jnp.float32)
        self.crop_sizes, self.lres_sizes = _crop_geometry(ds)
        self.dim = len(self.crop_sizes)
        self.lres_interp = getattr(ds, "lres_interp", "linear")
        self.velonly = getattr(ds, "velonly", False)
        self._origins = ds._origins
        # Multi-file datasets expose valid_t0: the set of global frame
        # origins whose crop window stays within one source simulation.
        self._valid_t0 = np.asarray(getattr(
            ds, "valid_t0", np.arange(ds._origins[0])), np.int32)
        self.n_samp_pts = ds.n_samp_pts_per_crop
        # Static [L, D] endpoint-aligned lattice in crop coordinates.
        axes = [np.linspace(0.0, 1.0, n) for n in self.lres_sizes]
        mesh = np.meshgrid(*axes, indexing="ij")
        self.lattice = jnp.asarray(
            np.stack(mesh, -1).reshape(-1, self.dim).astype(np.float32))

    @staticmethod
    def supported(ds) -> bool:
        return getattr(ds, "lres_filter", "none") == "none"

    def refresh(self):
        """Re-upload the field to a FRESH device buffer (failure
        recovery: heals a corrupted HBM-resident field without
        recompiling — the field rides the batch as `_const_field`, so
        the compiled step picks up the new buffer on the next call)."""
        self.data = jnp.asarray(self._host_data.reshape(-1))
        return self.data

    # -------------------------------------------------------- host side

    def draw(self, rng: np.random.RandomState, batch_size: int
             ) -> Tuple[np.ndarray, np.ndarray]:
        """Host RNG: (origins [B, D] int32, pts [B, N, D] f32)."""
        o = self._origins
        origins = np.stack([rng.randint(o[i], size=batch_size)
                            for i in range(self.dim)], -1).astype(np.int32)
        origins[:, 0] = self._valid_t0[origins[:, 0]]
        pts = rng.rand(batch_size, self.n_samp_pts,
                       self.dim).astype(np.float32)
        return origins, pts

    # ------------------------------------------------------ device side

    def _read(self, pts_crop: jnp.ndarray, origin: jnp.ndarray,
              method: str, field: jnp.ndarray) -> jnp.ndarray:
        """Read crop-normalized points [N, D] of one crop -> [N, C].

        ``field`` is the FLAT 1-D device field (see ``__init__``); the
        multilinear / nearest reads are flat gathers so the big operand
        never leaves its padding-free 1-D layout.
        """
        spatial = self.field_spatial
        sizes = jnp.asarray(self.crop_sizes, jnp.float32)
        gsizes = jnp.asarray(spatial, jnp.float32)
        s_idx = origin.astype(jnp.float32) + pts_crop * (sizes - 1.0)
        p_glob = s_idx / (gsizes - 1.0)
        cell, frac = _locate(p_glob, spatial, 0.0, 1.0)
        strides = jnp.asarray(self._strides)
        ch = jnp.arange(self.n_ch, dtype=jnp.int32)
        if method == "nearest":
            # Ties -> lower node (strict frac > 0.5), matching scipy
            # RegularGridInterpolator's 'nearest' as the host path does.
            node = cell + (frac > 0.5)
            base = jnp.sum(node * strides, axis=-1)             # [N]
            return jnp.take(field, base[:, None] + ch[None, :], axis=0)
        offs = jnp.asarray(corner_offsets(self.dim))            # [K, D]
        cidx = cell[:, None, :] + offs[None]                    # [N, K, D]
        base = jnp.sum(cidx * strides, axis=-1)                 # [N, K]
        feats = jnp.take(field, base[..., None] + ch, axis=0)   # [N, K, C]
        offs_f = offs.astype(frac.dtype)
        per_axis = jnp.where(offs_f[None], frac[:, None, :],
                             1.0 - frac[:, None, :])
        weights = jnp.prod(per_axis, axis=-1)                   # [N, K]
        return jnp.einsum("nkc,nk->nc", feats, weights)

    def batch_fn(self, origins: jnp.ndarray, pts: jnp.ndarray,
                 field: jnp.ndarray = None) -> Dict[str, jnp.ndarray]:
        """(origins [B, 3], pts [B, N, 3]) -> normalized batch dict.

        ``field`` overrides the captured device field — passing it as a
        real argument (driver: ``_const_field`` batch key) keeps it out
        of the compiled executable's baked constants, so a re-uploaded
        buffer (``refresh()``) takes effect without recompiling.
        """
        if field is None:
            field = self.data
        b = pts.shape[0]
        lres = jax.vmap(lambda o: self._read(
            self.lattice, o, self.lres_interp, field))(origins)
        lres = lres.reshape(b, *self.lres_sizes, -1)
        vals = jax.vmap(lambda p, o: self._read(p, o, "linear", field))(
            pts, origins)
        lres = (lres - self.mean) / self.std
        vals = (vals - self.mean) / self.std
        if self.velonly:
            vals = vals[..., 2:4]
        return {"lres": lres, "point_coord": pts, "point_value": vals}

    def wrap_loss(self, loss_fn):
        """loss_fn over host batches -> loss_fn over (origins, pts[,
        field]) raw batches; batch assembly traces into the same XLA
        graph."""

        def loss2(params, raw, *extra):
            return loss_fn(params, self.batch_fn(raw["origins"],
                                                 raw["point_coord"],
                                                 raw.get("field")),
                           *extra)

        return loss2
