from hdsdp_tpu.io.sdpa import read_sdpa
from hdsdp_tpu.io.mps import read_mps

__all__ = ["read_sdpa", "read_mps"]
