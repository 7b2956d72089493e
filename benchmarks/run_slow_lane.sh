#!/bin/sh
# The marked-slow regression lane: everything the default suite gates
# behind HDSDP_SLOW (acc-tight4 degenerate LP, m >= 4096 AdaptiveCG
# path).  Run once per round on the CPU and paste the tail into
# NOTES.md.  ~10-15 min uncontended.
set -x
cd "$(dirname "$0")/.." || exit 1
HDSDP_SLOW=1 JAX_PLATFORMS=cpu exec python -m pytest \
    tests/test_scale_slow.py tests/test_lp.py -q "$@"
