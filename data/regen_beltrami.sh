#!/bin/bash
# Beltrami realization regeneration: canonical val/test seeds (7, 123)
# + train seeds 42, 100-299 (the seq loop explicitly skips the
# canonical held-out seeds; they are generated only from the leading
# canonical list).
cd /root/repo
for S in 7 123 42 $(seq 100 299); do
  if [ $S -ge 100 ]; then
    [ $S -eq 123 ] && continue   # canonical test seed, never a train seed
    [ $S -eq 7 ] && continue     # canonical val seed (outside seq range;
                                 # guard kept for future range edits)
  fi
  f=data/beltrami_s${S}.npz
  if [ ! -f "$f" ]; then
    python experiments/turb3d/generate_data.py --seed $S --out "$f" \
      > /dev/null || exit 1
    echo "wrote $f"
  fi
done
echo DONE
