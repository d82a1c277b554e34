"""RB2D space-time dataset — crops, degradation, continuous-point GT.

TPU-native equivalent of the reference's
``experiments/rb2d/dataloader_spacetime.py::RB2DataLoader``: loads an
``.npz`` of a Rayleigh–Bénard simulation (arrays ``p, b, u, w`` of shape
[T, Z, X]); each item is a random space-time crop from which it builds

- the low-res input: optional anti-alias filter (``lres_filter`` in
  {none, gaussian, uniform, median, maximum}) + downsampling by
  ``downsamp_t`` / ``downsamp_xz`` (``lres_interp`` linear or nearest),
- ``n_samp_pts_per_crop`` uniform continuous points in the crop with
  ground-truth values read via linear grid interpolation,
- per-channel mean/std normalization.

Design differences from the reference (documented, deliberate):
- channels-LAST layout ``[T, Z, X, 4]`` (TPU NDHWC convs);
- the low-res lattice is endpoint-aligned (``linspace(0, n-1,
  n//downsamp)`` nodes, sampled linearly/nearest from the filtered
  hres crop) instead of strided decimation, so the latent grid always
  spans the full [0, 1]^3 crop domain — no clamped query tail;
- no worker subprocesses: batches are assembled by vectorized numpy in
  the host thread (the TPU step is async — host/device overlap comes
  free from jax dispatch), with explicit PRNG threading instead of
  global torch seeds.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage
from scipy.interpolate import RegularGridInterpolator

__all__ = ["RB2DataLoader"]

CHANNELS = ("p", "b", "u", "w")
FILTERS = ("none", "gaussian", "uniform", "median", "maximum")


def _resample_axis(a: np.ndarray, axis: int, n_dst: int,
                   method: str) -> np.ndarray:
    """Endpoint-aligned 1-D resample of one axis (linear or nearest).

    Sample positions are ``linspace(0, n_src - 1, n_dst)`` — identical
    semantics (and nearest tie-breaking: the lower neighbor wins on an
    exact half) to ``scipy.interpolate.RegularGridInterpolator``, but
    with STATIC per-axis indices/weights so a whole batch resamples in
    a few vectorized takes instead of a scattered-point scipy call.
    """
    n_src = a.shape[axis]
    x = np.linspace(0, n_src - 1, n_dst)
    i0 = np.minimum(np.floor(x).astype(np.int64), n_src - 2)
    frac = x - i0
    if method == "nearest":
        return np.take(a, i0 + (frac > 0.5), axis=axis)
    w = frac.reshape([n_dst if d == axis else 1 for d in range(a.ndim)])
    w = w.astype(a.dtype)  # keep the blend in the array's dtype
    lo = np.take(a, i0, axis=axis)
    hi = np.take(a, i0 + 1, axis=axis)
    return lo * (1.0 - w) + hi * w


def _global_multilinear(data: np.ndarray, origins: np.ndarray,
                        crop_sizes, pts: np.ndarray,
                        method: str = "linear") -> np.ndarray:
    """Vectorized trilinear read of crop-normalized points, directly
    from the GLOBAL field array (no per-crop copies).

    data: [T, Z, X, C]; origins: [B, 3] crop origins; crop_sizes:
    (nt, nz, nx); pts: [B, N, 3] in [0,1]^3 crop coordinates ->
    values [B, N, C]. Replaces the reference's per-item
    ``scipy.interpolate.RegularGridInterpolator`` reads (SURVEY.md
    §3.5) — the round-1 host-pipeline bottleneck — with 2^3 batched
    corner gathers + blend (same multilinear math, so results match
    the scipy oracle to float tolerance). Nearest ties (frac == 0.5)
    resolve to the lower neighbor, matching scipy.
    """
    sizes = np.asarray(crop_sizes, np.float64)
    s = np.clip(pts.astype(np.float64) * (sizes - 1), 0, sizes - 1)
    cell = np.minimum(s.astype(np.int64), (sizes - 2).astype(np.int64))
    cell = np.maximum(cell, 0)
    frac = s - cell                                        # [B, N, 3]
    g = cell + origins[:, None, :]                         # [B, N, 3] global
    if method == "nearest":
        idx = g + (frac > 0.5)
        return data[idx[..., 0], idx[..., 1], idx[..., 2]]
    out = 0.0
    for ot in (0, 1):
        for oz in (0, 1):
            for ox in (0, 1):
                w = ((frac[..., 0] if ot else 1 - frac[..., 0])
                     * (frac[..., 1] if oz else 1 - frac[..., 1])
                     * (frac[..., 2] if ox else 1 - frac[..., 2]))
                vals = data[g[..., 0] + ot, g[..., 1] + oz,
                            g[..., 2] + ox]                # [B, N, C]
                out = out + w[..., None].astype(data.dtype) * vals
    return out.astype(data.dtype)


class RB2DataLoader:
    """Space-time crop dataset over an RB2D npz file.

    Reference parity: ``experiments/rb2d/dataloader_spacetime.py::
    RB2DataLoader`` (same flags: nt/nz/nx crop sizes, downsamp_t /
    downsamp_xz, n_samp_pts_per_crop, lres_filter, lres_interp,
    normalize_channels, return_hres).
    """

    def __init__(
        self,
        data_folder: str = ".",
        data_filename: str = "rb2d_ra1e6_s42.npz",
        nt: int = 16,
        nz: int = 128,
        nx: int = 128,
        n_samp_pts_per_crop: int = 512,
        downsamp_t: int = 4,
        downsamp_xz: int = 8,
        normalize_output: bool = True,
        return_hres: bool = False,
        lres_filter: str = "none",
        lres_interp: str = "linear",
        velonly: bool = False,
    ):
        if lres_filter not in FILTERS:
            raise ValueError(f"lres_filter must be one of {FILTERS}")
        if lres_interp not in ("linear", "nearest"):
            raise ValueError("lres_interp must be 'linear' or 'nearest'")
        # Comma-separated filenames concatenate multiple simulations
        # along the time axis; ``valid_t0`` below keeps crops from
        # straddling a file boundary (reference: single-file
        # ``RB2DataLoader``; multi-simulation training is our data-axis
        # extension).
        names = [s.strip() for s in data_filename.split(",") if s.strip()]
        parts, t_lens = [], []
        for name in names:
            path = os.path.join(data_folder, name)
            with np.load(path) as npz:
                parts.append(np.stack(
                    [np.asarray(npz[c], np.float32) for c in CHANNELS],
                    axis=-1))  # [T, Z, X, 4]
                self.dt_phys = float(npz["dt"]) if "dt" in npz else 1.0
                self.dz_phys = float(npz["dz"]) if "dz" in npz else 1.0
                self.dx_phys = float(npz["dx"]) if "dx" in npz else 1.0
        self.data = (parts[0] if len(parts) == 1
                     else np.concatenate(parts, axis=0))
        t_lens = [p.shape[0] for p in parts]
        del parts

        T, Z, X, _ = self.data.shape
        if nt > min(t_lens) or nz > Z or nx > X:
            raise ValueError(
                f"crop ({nt},{nz},{nx}) larger than data ({T},{Z},{X})")
        # Global-frame t0 values whose [t0, t0+nt) window stays inside
        # one source file.
        starts, off = [], 0
        for tl in t_lens:
            starts.append(np.arange(off, off + tl - nt + 1))
            off += tl
        self.valid_t0 = np.concatenate(starts).astype(np.int64)
        self.nt, self.nz, self.nx = nt, nz, nx
        self.n_samp_pts_per_crop = n_samp_pts_per_crop
        self.downsamp_t, self.downsamp_xz = downsamp_t, downsamp_xz
        self.normalize_output = normalize_output
        self.return_hres = return_hres
        self.lres_filter = lres_filter
        self.lres_interp = lres_interp
        self.velonly = velonly

        self.nt_l = max(2, nt // downsamp_t)
        self.nz_l = max(2, nz // downsamp_xz)
        self.nx_l = max(2, nx // downsamp_xz)

        # Per-channel stats over the whole dataset (reference computes
        # these in the dataloader and shares them with the PDE layer).
        self.channel_mean = self.data.mean(axis=(0, 1, 2))
        self.channel_std = self.data.std(axis=(0, 1, 2)) + 1e-8
        if not normalize_output:
            self.channel_mean = np.zeros_like(self.channel_mean)
            self.channel_std = np.ones_like(self.channel_std)

        # _origins[0] counts VALID t0 values (an index into valid_t0,
        # not a raw frame number — identical for single-file data).
        self._origins = (len(self.valid_t0), Z - nz + 1, X - nx + 1)

    # ------------------------------------------------------------------

    def __len__(self) -> int:
        o = self._origins
        return o[0] * o[1] * o[2]

    @property
    def lres_shape(self) -> Tuple[int, int, int]:
        return (self.nt_l, self.nz_l, self.nx_l)

    @property
    def coord_extents(self) -> Tuple[float, float, float]:
        """Physical spans of the [0,1]-normalized crop coordinates
        (for PDELayer.set_scaling)."""
        return ((self.nt - 1) * self.dt_phys,
                (self.nz - 1) * self.dz_phys,
                (self.nx - 1) * self.dx_phys)

    # ------------------------------------------------------------------

    def _filter(self, crop: np.ndarray) -> np.ndarray:
        """Anti-alias filter on the (z, x) axes, per channel & frame."""
        if self.lres_filter == "none":
            return crop
        size = max(self.downsamp_xz // 2 * 2 + 1, 3)
        sigma = self.downsamp_xz / 2.0
        out = np.empty_like(crop)
        for c in range(crop.shape[-1]):
            f = crop[..., c]
            if self.lres_filter == "gaussian":
                out[..., c] = ndimage.gaussian_filter(
                    f, sigma=(0, sigma, sigma))
            elif self.lres_filter == "uniform":
                out[..., c] = ndimage.uniform_filter(
                    f, size=(1, size, size))
            elif self.lres_filter == "median":
                out[..., c] = ndimage.median_filter(
                    f, size=(1, size, size))
            else:  # maximum
                out[..., c] = ndimage.maximum_filter(
                    f, size=(1, size, size))
        return out

    def _degrade(self, crop: np.ndarray) -> np.ndarray:
        """Filtered crop -> endpoint-aligned low-res lattice sample."""
        crop = self._filter(crop)
        nt, nz, nx, _ = crop.shape
        axes = (np.arange(nt), np.arange(nz), np.arange(nx))
        interp = RegularGridInterpolator(
            axes, crop, method=self.lres_interp)
        tl = np.linspace(0, nt - 1, self.nt_l)
        zl = np.linspace(0, nz - 1, self.nz_l)
        xl = np.linspace(0, nx - 1, self.nx_l)
        TT, ZZ, XX = np.meshgrid(tl, zl, xl, indexing="ij")
        pts = np.stack([TT, ZZ, XX], axis=-1).reshape(-1, 3)
        lres = interp(pts).reshape(self.nt_l, self.nz_l, self.nx_l, -1)
        return lres.astype(np.float32)

    def _crop_at(self, t0: int, z0: int, x0: int) -> np.ndarray:
        return self.data[t0:t0 + self.nt, z0:z0 + self.nz,
                         x0:x0 + self.nx]

    def get_item(self, idx: int, rng: Optional[np.random.RandomState] = None
                 ) -> Dict[str, np.ndarray]:
        """Deterministic crop origin from idx; rng drives point sampling."""
        o = self._origins
        t0, rem = divmod(idx, o[1] * o[2])
        z0, x0 = divmod(rem, o[2])
        return self.sample_crop(int(self.valid_t0[t0]), z0, x0,
                                rng or np.random.RandomState(idx))

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return self.get_item(idx)

    def sample_crop(self, t0: int, z0: int, x0: int,
                    rng: np.random.RandomState,
                    pts: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
        """One training item: lres input, query points, point values.

        Per-item reference path (scipy interpolators), kept as the
        numerical oracle for the vectorized :meth:`sample_batch`.
        """
        hres = self._crop_at(t0, z0, x0)                  # [nt, nz, nx, 4]
        lres = self._degrade(hres)

        n = self.n_samp_pts_per_crop
        if pts is None:
            pts = rng.rand(n, 3).astype(np.float32)       # [0,1]^3
        axes = (np.linspace(0, 1, self.nt),
                np.linspace(0, 1, self.nz),
                np.linspace(0, 1, self.nx))
        vals = RegularGridInterpolator(axes, hres)(pts).astype(np.float32)

        mean, std = self.channel_mean, self.channel_std
        item = {
            "lres": (lres - mean) / std,
            "point_coord": pts,
            "point_value": (vals - mean) / std,
        }
        if self.velonly:
            item["point_value"] = item["point_value"][:, 2:4]
        if self.return_hres:
            item["hres"] = (hres - mean) / std
        return item

    def sample_batch(self, rng: np.random.RandomState, batch_size: int
                     ) -> Dict[str, np.ndarray]:
        """batch_size random items, assembled fully vectorized.

        Numerically equivalent to stacking :meth:`sample_crop` items
        (tested), but every stage — crop gather, anti-alias filter,
        low-res resample, continuous-point reads — runs batched numpy,
        so the host pipeline no longer bounds the TPU step rate (the
        round-1 per-item scipy loop was the training-loop floor).
        """
        o = self._origins
        t0 = self.valid_t0[rng.randint(o[0], size=batch_size)]
        z0 = rng.randint(o[1], size=batch_size)
        x0 = rng.randint(o[2], size=batch_size)
        pts = rng.rand(batch_size, self.n_samp_pts_per_crop, 3
                       ).astype(np.float32)
        return self.batch_from_origins(t0, z0, x0, pts)

    def batch_from_origins(self, t0, z0, x0, pts: np.ndarray
                           ) -> Dict[str, np.ndarray]:
        """Vectorized batch from explicit crop origins + query points.

        t0/z0/x0: [B] crop origins; pts: [B, N, 3] in [0,1]^3.
        """
        b = len(t0)
        origins = np.stack([np.asarray(t0), np.asarray(z0),
                            np.asarray(x0)], axis=-1)     # [B, 3]
        crop_sizes = (self.nt, self.nz, self.nx)

        hres = None
        if self.return_hres or self.lres_filter != "none":
            # Only materialize full-res crops when something needs the
            # whole field (anti-alias filtering / hres output).
            hres = np.empty((b, *crop_sizes, self.data.shape[-1]),
                            self.data.dtype)
            for i in range(b):
                hres[i] = self.data[t0[i]:t0[i] + self.nt,
                                    z0[i]:z0[i] + self.nz,
                                    x0[i]:x0[i] + self.nx]

        if self.lres_filter != "none":
            lres = self._filter_batch(hres)
            for axis, n_dst in ((1, self.nt_l), (2, self.nz_l),
                                (3, self.nx_l)):
                lres = _resample_axis(lres, axis, n_dst, self.lres_interp)
            lres = lres.astype(np.float32)
        else:
            # Unfiltered default path: read the endpoint-aligned lattice
            # straight out of the global array — no crop copies at all.
            lat = self._lattice_pts()                    # [L, 3] static
            lat_b = np.broadcast_to(lat[None], (b, lat.shape[0], 3))
            lres = _global_multilinear(
                self.data, origins, crop_sizes, lat_b,
                method=self.lres_interp)
            lres = lres.reshape(b, self.nt_l, self.nz_l, self.nx_l,
                                -1).astype(np.float32)

        vals = _global_multilinear(self.data, origins, crop_sizes,
                                   pts)                  # [B, N, 4]

        mean, std = self.channel_mean, self.channel_std
        batch = {
            "lres": (lres - mean) / std,
            "point_coord": pts,
            "point_value": (vals - mean) / std,
        }
        if self.velonly:
            batch["point_value"] = batch["point_value"][..., 2:4]
        if self.return_hres:
            batch["hres"] = (hres - mean) / std
        return batch

    def _lattice_pts(self) -> np.ndarray:
        """Endpoint-aligned low-res lattice as [0,1]^3 points [L, 3]."""
        tl = np.linspace(0.0, 1.0, self.nt_l)
        zl = np.linspace(0.0, 1.0, self.nz_l)
        xl = np.linspace(0.0, 1.0, self.nx_l)
        TT, ZZ, XX = np.meshgrid(tl, zl, xl, indexing="ij")
        return np.stack([TT, ZZ, XX], axis=-1).reshape(-1, 3)

    def _filter_batch(self, crops: np.ndarray) -> np.ndarray:
        """Anti-alias filter on (z, x), vectorized over batch/t/channel
        (per-axis zero sigma/unit size keeps frames independent —
        identical to the per-crop filter)."""
        if self.lres_filter == "none":
            return crops
        size = max(self.downsamp_xz // 2 * 2 + 1, 3)
        sigma = self.downsamp_xz / 2.0
        if self.lres_filter == "gaussian":
            return ndimage.gaussian_filter(
                crops, sigma=(0, 0, sigma, sigma, 0))
        if self.lres_filter == "uniform":
            return ndimage.uniform_filter(
                crops, size=(1, 1, size, size, 1))
        if self.lres_filter == "median":
            return ndimage.median_filter(
                crops, size=(1, 1, size, size, 1))
        return ndimage.maximum_filter(
            crops, size=(1, 1, size, size, 1))

    # ------------------------------------------------------------------

    def full_lres_sequence(self, t0: int = 0, nt: Optional[int] = None
                           ) -> np.ndarray:
        """Degraded low-res of a full-spatial-extent window, normalized —
        the evaluation.py input (one encode, dense decoding)."""
        nt = nt or self.nt
        window = self.data[t0:t0 + nt]                    # [nt, Z, X, 4]
        saved = (self.nt_l, self.nz_l, self.nx_l)
        self.nt_l = max(2, nt // self.downsamp_t)
        self.nz_l = max(2, window.shape[1] // self.downsamp_xz)
        self.nx_l = max(2, window.shape[2] // self.downsamp_xz)
        try:
            lres = self._degrade(window)
        finally:
            self.nt_l, self.nz_l, self.nx_l = saved
        return (lres - self.channel_mean) / self.channel_std
