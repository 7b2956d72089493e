"""PSDP primal refinement (ref interface/hdsdp_psdp.c) — placeholder.

The full primal-dual refinement loop lands with the PSDP milestone; until
then the refiner declines, which matches the reference's fallback path
(ref hdsdp_algo.c:1804-1815: on PSDP failure the dual solution is restored
and the potential-reduction loop continues with PSDP disabled).
"""

from __future__ import annotations


class PSDPRefiner:
    def __init__(self, ipm):
        self.ipm = ipm

    def optimize(self) -> bool:
        return False

    def get_solution(self, i_group):
        raise NotImplementedError
