#!/bin/bash
# Release-grade suite: the default run PLUS the opt-in slow markers.
# Run this once per round / before any release claim — the slow set
# carries the multi-minute scenario coverage (two-process multihost
# train CLI with the PDE loss on, cliff-recovery drivers, 4-D CLI
# sharded-encoder smoke, composition variants) that the fast default
# suite deliberately excludes.
#
# Budget on a 1-core box: default ~10-14 min, slow ~15-20 min.
set -e
cd "$(dirname "$0")/.."
echo "=== default suite ==="
time python -m pytest tests/ -q
echo "=== slow suite (opt-in markers) ==="
time python -m pytest tests/ -q -m slow
echo "RELEASE SUITE GREEN"
