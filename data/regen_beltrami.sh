#!/bin/bash
# Beltrami realization regeneration: canonical val/test seeds (7, 123)
# are generated unconditionally in their own loop; the train seq loop
# (42, 100-299) skips them so a held-out seed is never (re)generated
# under a train-seed code path. (A single merged loop with an
# `S -ge 100 && S -eq 123 && continue` guard skipped the CANONICAL
# occurrence of 123 too — s123 was silently never written.)
cd /root/repo
gen() {
  f=data/beltrami_s${1}.npz
  if [ ! -f "$f" ]; then
    python experiments/turb3d/generate_data.py --seed $1 --out "$f" \
      > /dev/null || exit 1
    echo "wrote $f"
  fi
}
for S in 7 123; do gen $S; done          # canonical held-out seeds
for S in 42 $(seq 100 299); do
  [ $S -eq 123 ] && continue             # never a train seed
  [ $S -eq 7 ] && continue
  gen $S
done
sha256sum data/beltrami_s*.npz | tee data/SHA256SUMS.beltrami
echo DONE
