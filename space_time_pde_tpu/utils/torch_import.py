"""Torch-checkpoint import: reference ``state_dict`` -> flax params.

The round-1 verdict's strict-parity gate ("matching rel-L2 vs the
reference pipeline") requires loading weights trained by the reference
(``torch.save``'d ``state_dict``s of ``src/implicit_net.py::ImNet`` and
``src/unet3d.py::UNet3d``) into this build's flax modules. The reference
mount was empty, so the UNet naming scheme cannot be pinned down here —
what CAN be made exact now is the tensor-layout conversion and the
ImNet mapping (its architecture is fully determined: 6 linear layers,
skip-concat, see ``models/imnet.py``), validated against the independent
torch oracle in ``tests/torch_oracle.py``.

Layout rules (torch -> flax):
  Linear   weight [O, I]            -> kernel [I, O]      (transpose)
  ConvNd   weight [O, I, *k]        -> kernel [*k, I, O]  (move axes)
  ConvTransposeNd weight [I, O, *k] -> kernel [*k, I, O]  (flax
           ConvTranspose convolves, torch cross-correlates: flip the
           spatial axes)
  BatchNorm weight/bias             -> scale/bias
  BatchNorm running_mean/var        -> batch_stats mean/var

All functions accept plain numpy/torch tensors (anything with
``.detach``/``.numpy`` or array protocol); torch itself is NOT imported
so the module stays usable in torch-free deployments.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional

import numpy as np

__all__ = [
    "to_numpy", "linear_from_torch", "conv_from_torch",
    "conv_transpose_from_torch", "batchnorm_from_torch",
    "imnet_params_from_torch", "unet3d_params_from_torch",
]


def to_numpy(t) -> np.ndarray:
    """Accept torch tensors / numpy arrays / lists uniformly."""
    if hasattr(t, "detach"):
        t = t.detach()
    if hasattr(t, "cpu"):
        t = t.cpu()
    if hasattr(t, "numpy"):
        t = t.numpy()
    return np.asarray(t)


def linear_from_torch(weight, bias=None) -> Dict[str, np.ndarray]:
    """torch ``nn.Linear`` -> flax ``nn.Dense`` param dict."""
    p = {"kernel": to_numpy(weight).T.copy()}
    if bias is not None:
        p["bias"] = to_numpy(bias)
    return p


def conv_from_torch(weight, bias=None) -> Dict[str, np.ndarray]:
    """torch ``nn.ConvNd`` [O, I, *k] -> flax ``nn.Conv`` [*k, I, O]."""
    w = to_numpy(weight)
    w = np.moveaxis(w, (0, 1), (-1, -2)).copy()
    p = {"kernel": w}
    if bias is not None:
        p["bias"] = to_numpy(bias)
    return p


def conv_transpose_from_torch(weight, bias=None) -> Dict[str, np.ndarray]:
    """torch ``nn.ConvTransposeNd`` [I, O, *k] -> flax ``nn.ConvTranspose``.

    flax's ConvTranspose applies a true convolution (kernel flipped
    relative to torch's cross-correlating transposed conv), so the
    spatial axes are reversed in addition to the [*k, I, O] layout.
    """
    w = to_numpy(weight)
    w = np.moveaxis(w, (0, 1), (-2, -1))          # [*k, I, O]
    spatial = tuple(range(w.ndim - 2))
    w = np.flip(w, axis=spatial).copy()
    p = {"kernel": w}
    if bias is not None:
        p["bias"] = to_numpy(bias)
    return p


def batchnorm_from_torch(weight, bias, running_mean, running_var):
    """torch ``nn.BatchNormNd`` -> (flax params, flax batch_stats)."""
    params = {"scale": to_numpy(weight), "bias": to_numpy(bias)}
    stats = {"mean": to_numpy(running_mean), "var": to_numpy(running_var)}
    return params, stats


def imnet_params_from_torch(
    state_dict: Mapping[str, object],
    layer_key: Callable[[int], str] = lambda i: f"fcs.{i}",
) -> Dict[str, Dict[str, np.ndarray]]:
    """Reference ImNet ``state_dict`` -> flax ``models.ImNet`` params.

    The reference decoder is exactly 6 linear layers (5 hidden +
    output head; ``src/implicit_net.py``). ``layer_key(i)`` maps the
    layer index to the state-dict prefix — default matches a
    ``nn.ModuleList`` named ``fcs`` (the oracle's layout); pass e.g.
    ``lambda i: f"fc{i}"`` for individually-named attributes.
    """
    out = {}
    for i in range(6):
        k = layer_key(i)
        wk, bk = f"{k}.weight", f"{k}.bias"
        if wk not in state_dict:
            raise KeyError(
                f"ImNet layer {i}: {wk!r} not in state_dict (keys: "
                f"{sorted(state_dict)[:8]}...); adapt layer_key to the "
                "checkpoint's naming")
        out[f"fc{i}"] = linear_from_torch(state_dict[wk],
                                          state_dict.get(bk))
    return out


def unet3d_params_from_torch(
    state_dict: Mapping[str, object],
    name_map: Optional[Mapping[str, str]] = None,
):
    """Reference UNet3d ``state_dict`` -> (flax params, batch_stats).

    Requires ``norm="batch"`` models (the reference UNet uses
    BatchNorm). The reference's exact module naming could not be
    verified (empty reference mount — SURVEY.md §0), so this needs an
    explicit ``name_map`` {flax path: torch prefix} built once against
    the real checkpoint; the layout conversions above then apply
    mechanically:

    - ``*.weight/bias`` on conv prefixes -> :func:`conv_from_torch`
      (or :func:`conv_transpose_from_torch` for up-sampling layers,
      torch prefix tagged with a trailing ``!T``);
    - BatchNorm prefixes -> :func:`batchnorm_from_torch`.

    Flax path keys use ``/`` separators, e.g.
    ``{"down_res0/conv1": "encoder.0.conv1",
       "down_res0/norm1": "encoder.0.bn1", ...}``.
    """
    if name_map is None:
        raise NotImplementedError(
            "unet3d_params_from_torch needs a name_map built against a "
            "real reference checkpoint (the reference mount was empty; "
            "see SURVEY.md §0). The tensor-layout conversion itself is "
            "implemented and tested — supply {flax_path: torch_prefix} "
            "and this assembles the pytree.")
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf):
        parts = path.split("/")
        for p in parts[:-1]:
            tree = tree.setdefault(p, {})
        tree[parts[-1]] = leaf

    for flax_path, torch_prefix in name_map.items():
        transpose = torch_prefix.endswith("!T")
        prefix = torch_prefix[:-2] if transpose else torch_prefix
        if f"{prefix}.running_mean" in state_dict:
            p, s = batchnorm_from_torch(
                state_dict[f"{prefix}.weight"],
                state_dict[f"{prefix}.bias"],
                state_dict[f"{prefix}.running_mean"],
                state_dict[f"{prefix}.running_var"])
            put(params, flax_path, p)
            put(stats, flax_path, s)
        else:
            conv = (conv_transpose_from_torch if transpose
                    else conv_from_torch)
            put(params, flax_path, conv(
                state_dict[f"{prefix}.weight"],
                state_dict.get(f"{prefix}.bias")))
    return params, stats
