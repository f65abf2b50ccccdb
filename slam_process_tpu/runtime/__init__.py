"""Native runtime accelerators (C, loaded via ctypes).

The reference is pure Python end to end; this engine keeps its hot *device*
path in XLA/Pallas and accelerates the unavoidable host work natively.
Currently: the hex-token scanner (the host-side bottleneck of end-to-end
ingest).  Libraries are built lazily with the system compiler and cached
under build/; every native path has a numpy fallback and an equivalence
test, so a missing toolchain only costs speed.
"""

from slam_process_tpu.runtime import hexscan  # noqa: F401
