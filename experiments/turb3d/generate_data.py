"""Generate 4-D (t, z, y, x) turbulence-like data for the turb3d stack.

The reference framework is strictly 3-D (2-D space + time; SURVEY.md
§1); this driver feeds its 4-D extension (BASELINE.json config #5: 3-D
turbulence on a 4-D space-time context grid). Kinds:

- ``abc``: exact decaying ABC/Beltrami Navier–Stokes solution — an
  analytic unsteady solution of incompressible 3-D NS, so ns3d PDE
  residuals on it vanish to float precision (the 4-D analog of the
  Taylor–Green fixture).

Example:
    python experiments/turb3d/generate_data.py --kind abc \
        --nt 24 --nz 32 --ny 32 --nx 32 --out ./data/abc_flow.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from space_time_pde_tpu.data.generator import abc_flow_fields, save_npz


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--kind", type=str, default="abc",
                        choices=("abc",))
    parser.add_argument("--nt", type=int, default=24)
    parser.add_argument("--nz", type=int, default=32)
    parser.add_argument("--ny", type=int, default=32)
    parser.add_argument("--nx", type=int, default=32)
    parser.add_argument("--dt", type=float, default=0.1)
    parser.add_argument("--viscosity", type=float, default=1e-2)
    parser.add_argument("--abc", type=float, nargs=3,
                        default=(1.0, 0.7, 0.3),
                        help="A B C coefficients of the ABC flow")
    parser.add_argument(
        "--seed", type=int, default=None,
        help="random same-statistics Beltrami realization: amplitudes "
             "on the fixed-energy sphere + random phases (overrides "
             "--abc). Independent seeds are fully decorrelated exact "
             "NS solutions — the turb3d train/val/test protocol uses "
             "seeds 42/7/123 (data/splits.py::CANONICAL_SEEDS)")
    parser.add_argument("--out", type=str, default="abc_flow.npz")
    args = parser.parse_args()

    if args.seed is not None:
        from space_time_pde_tpu.data.generator import (
            beltrami_realization_params,
        )
        a, b, c, phases = beltrami_realization_params(args.seed)
        print(f"beltrami realization seed {args.seed}: "
              f"A={a:.3f} B={b:.3f} C={c:.3f} phases="
              + str([round(p, 3) for p in phases]))
    else:
        (a, b, c), phases = args.abc, (0.0, 0.0, 0.0)
    fields = abc_flow_fields(
        nt=args.nt, nz=args.nz, ny=args.ny, nx=args.nx,
        viscosity=args.viscosity, dt=args.dt, A=a, B=b, C=c,
        phases=phases)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_npz(args.out, fields)
    sizes = {k: v.shape for k, v in fields.items() if np.ndim(v) > 0}
    print(f"wrote {args.out}: {sizes}")


if __name__ == "__main__":
    main()
