#!/bin/bash
# Canonical rb2d dataset regeneration (deterministic per seed).
cd /root/repo
for S in 42 7 123 100 101 102 103 104 105; do
  f=data/rb2d_ra1e6_s${S}.npz
  if [ ! -f "$f" ]; then
    echo "=== generating seed $S ==="
    STPDE_PLATFORM=cpu python experiments/rb2d/generate_data.py \
      --nx 512 --nz 128 --rayleigh 1e6 --n_snapshots 200 \
      --seed $S --out "$f" || exit 1
  fi
done
sha256sum data/rb2d_ra1e6_s*.npz | tee data/SHA256SUMS.rb2d
echo DONE
