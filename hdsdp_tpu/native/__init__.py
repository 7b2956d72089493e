"""Native (C++) acceleration components.

The reference solver's runtime is all native C; here the JAX/XLA compute path
is Python-defined, and latency-sensitive host-side work (file parsing, sparse
symbolic analysis) is implemented in C++ with ctypes bindings.  Modules fall
back to pure Python automatically when the shared library has not been built.

Build: ``python -m hdsdp_tpu.native.build`` (uses g++, no external deps).
"""

from hdsdp_tpu.native import sdpa_native  # noqa: F401
