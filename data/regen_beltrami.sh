#!/bin/bash
# Beltrami realization regeneration: canonical val/test seeds (7, 123)
# + train seeds 42, 100-199 (skipping the canonical held-out seeds).
cd /root/repo
for S in 42 7 123 $(seq 100 199); do
  [ $S -eq 123 ] && [ -f data/beltrami_s123.npz ] && continue
  f=data/beltrami_s${S}.npz
  if [ ! -f "$f" ]; then
    python experiments/turb3d/generate_data.py --seed $S --out "$f" \
      > /dev/null || exit 1
    echo "wrote $f"
  fi
done
echo DONE
