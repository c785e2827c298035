"""Native host extensions (C++ via ctypes): built on demand with g++ into a
per-user cache. These mirror the reference's native components (its Cython/
CUDA NMS pair); the hot compute path stays jnp/Pallas on TPU."""

from dfanerf_tpu.native.build import load_library

__all__ = ["load_library"]
