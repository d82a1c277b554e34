"""Independent torch-CPU oracle implementations, written from SURVEY.md.

These mirror the reference's semantics (src/implicit_net.py::ImNet,
src/regular_nd_grid_interpolation.py, src/local_implicit_grid.py) as an
independent numerical check on the JAX implementations. They are NOT
copies of the reference (which was unavailable — empty mount); they are
a second, independently-coded realization of the same spec.
"""

import itertools

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchImNet(nn.Module):
    """IM-NET decoder: widths nf*(16,8,4,2,1), input skip-concat."""

    def __init__(self, dim=3, in_features=32, out_features=4, nf=32,
                 negative_slope=0.01):
        super().__init__()
        self.dimz = dim + in_features
        self.negative_slope = negative_slope
        widths = [nf * m for m in (16, 8, 4, 2, 1)]
        layers = []
        prev = self.dimz
        for i, w in enumerate(widths):
            inp = prev if i == 0 else prev + self.dimz
            layers.append(nn.Linear(inp, w))
            prev = w
        layers.append(nn.Linear(prev, out_features))
        self.fcs = nn.ModuleList(layers)

    def forward(self, x):
        h = x
        for i, fc in enumerate(self.fcs[:-1]):
            inp = h if i == 0 else torch.cat([h, x], dim=-1)
            h = F.leaky_relu(fc(inp), self.negative_slope)
        return self.fcs[-1](h)

    def load_from_flax(self, params):
        """Copy flax ImNet params {'fc0': {'kernel','bias'}, ...}."""
        with torch.no_grad():
            for i, fc in enumerate(self.fcs):
                p = params[f"fc{i}"]
                fc.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).T))
                fc.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))


def torch_grid_interp_coefficients(grid, pts, xmin=0.0, xmax=1.0):
    """grid: [*spatial, C] tensor; pts: [N, D] -> (feats, weights, rel)."""
    spatial = grid.shape[:-1]
    dim = len(spatial)
    sizes = torch.tensor(spatial, dtype=pts.dtype)
    xmin = torch.as_tensor(xmin, dtype=pts.dtype).expand(dim).clone()
    xmax = torch.as_tensor(xmax, dtype=pts.dtype).expand(dim).clone()
    s = (pts - xmin) / (xmax - xmin) * (sizes - 1.0)
    s = torch.clamp(s, torch.zeros(dim), sizes - 1.0)
    cell = torch.clamp(s.floor().long(), torch.zeros(dim, dtype=torch.long),
                       torch.tensor(spatial, dtype=torch.long) - 2)
    frac = s - cell.to(pts.dtype)

    offsets = torch.tensor(list(itertools.product(*([(0, 1)] * dim))),
                           dtype=torch.long)                  # [K, D]
    corner = cell[:, None, :] + offsets[None]                 # [N, K, D]
    strides = torch.ones(dim, dtype=torch.long)
    for a in range(dim - 2, -1, -1):
        strides[a] = strides[a + 1] * spatial[a + 1]
    flat = (corner * strides).sum(-1)                         # [N, K]
    feats = grid.reshape(-1, grid.shape[-1])[flat]            # [N, K, C]
    offs_f = offsets.to(pts.dtype)
    per_axis = torch.where(offsets.bool()[None], frac[:, None, :],
                           1.0 - frac[:, None, :])
    weights = per_axis.prod(-1)                               # [N, K]
    rel = frac[:, None, :] - offs_f[None]                     # [N, K, D]
    return feats, weights, rel


def torch_query_local_implicit_grid(model, latent_grid, pts,
                                    xmin=0.0, xmax=1.0):
    """latent_grid: [B, *spatial, C]; pts: [B, N, D] -> [B, N, out]."""
    outs = []
    for b in range(latent_grid.shape[0]):
        feats, w, rel = torch_grid_interp_coefficients(
            latent_grid[b], pts[b], xmin, xmax)
        inp = torch.cat([rel, feats], dim=-1)
        out = model(inp)                                      # [N, K, out]
        outs.append(torch.einsum("nko,nk->no", out, w))
    return torch.stack(outs)
