"""Top-level solver driver (filled in by hdsdp_tpu.solver.algo)."""

from __future__ import annotations


class HDSDPSolver:  # placeholder until solver.algo lands
    pass


def solve_sdpa_file(path: str, **kwargs):
    raise NotImplementedError
