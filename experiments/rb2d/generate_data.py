"""Generate RB2D training data (CLI).

Stand-in for the reference's Dedalus ``rayleigh_benard.py`` simulation
script + Google-Drive download of ``rb2d_ra1e6_s42.npz`` (Dedalus is
not installed here): runs the numpy Boussinesq solver in
``space_time_pde_tpu/data/generator.py`` and writes the same npz schema.

Example (paper-scale, takes a while):
    python experiments/rb2d/generate_data.py --nx 512 --nz 128 \
        --rayleigh 1e6 --n_snapshots 200 --out data/rb2d_ra1e6_s42.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from space_time_pde_tpu.data import save_npz, simulate_rb2d, \
    taylor_green_fields


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", type=str, default="data/rb2d_ra1e6_s42.npz")
    p.add_argument("--kind", type=str, default="rb2d",
                   choices=["rb2d", "taylor_green"])
    p.add_argument("--nx", type=int, default=512)
    p.add_argument("--nz", type=int, default=128)
    p.add_argument("--lx", type=float, default=4.0)
    p.add_argument("--lz", type=float, default=1.0)
    p.add_argument("--rayleigh", type=float, default=1e6)
    p.add_argument("--prandtl", type=float, default=1.0)
    p.add_argument("--t_transient", type=float, default=25.0)
    p.add_argument("--n_snapshots", type=int, default=200)
    p.add_argument("--snap_dt", type=float, default=0.125)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--nt", type=int, default=64, help="taylor_green frames")
    args = p.parse_args()

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    if args.kind == "taylor_green":
        fields = taylor_green_fields(nt=args.nt, nz=args.nz, nx=args.nx)
    else:
        fields = simulate_rb2d(
            nx=args.nx, nz=args.nz, lx=args.lx, lz=args.lz,
            rayleigh=args.rayleigh, prandtl=args.prandtl,
            t_transient=args.t_transient, n_snapshots=args.n_snapshots,
            snap_dt=args.snap_dt, seed=args.seed, progress=True)
    save_npz(args.out, fields)
    print(f"wrote {args.out}: "
          + ", ".join(f"{k}{v.shape}" for k, v in fields.items()
                      if hasattr(v, "shape") and v.ndim > 0))


if __name__ == "__main__":
    main()
