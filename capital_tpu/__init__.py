"""capital_tpu — a TPU-native communication-avoiding dense linear-algebra framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
huttered40/capital (reference: /root/reference), which provides distributed
schedules for Cholesky factorization + simultaneous triangular inverse
(ref: src/alg/cholesky/cholinv/), communication-avoiding CholeskyQR2
(ref: src/alg/qr/cacqr/), SUMMA-style 2.5D matrix multiplication
(ref: src/alg/matmult/summa/), triangular / Newton-Schulz inversion
(ref: src/alg/inverse/), TRSM (ref: src/alg/trsm/), numerical validation
(ref: test/), benchmark drivers (ref: bench/) and an autotuner
(ref: autotune/).

Architecture (TPU-first, NOT a port):
  - MPI communicator grids      -> jax.sharding.Mesh axes ('z','y','x')   [grid.py]
  - packed triangular storage   -> dense + structure masks                [matrix.py]
  - MKL BLAS/LAPACK wrappers    -> jnp/MXU ops + Pallas kernels           [ops/]
  - SUMMA bcast/allreduce       -> shard_map + all_gather/psum over ICI   [parallel/summa.py]
  - recursive C++ templates     -> trace-time-unrolled JAX recursion      [algs/]
  - critter instrumentation     -> analytic cost model + jax.profiler     [tracing.py]
"""

from capital_tpu.grid import Grid
from capital_tpu.matrix import DistMatrix, Structure

__version__ = "0.1.0"

__all__ = [
    "Grid", "DistMatrix", "Structure", "__version__",
    # subpackages/modules (imported lazily by users):
    #   capital_tpu.algs.{cholinv,cacqr,rectri,newton,trsm}
    #   capital_tpu.parallel.summa
    #   capital_tpu.ops.{blas,lapack,pallas_chol,precision}
    #   capital_tpu.{matrix,validate,tracing,io,native}
    #   capital_tpu.apps.als
    #   capital_tpu.{bench,autotune}
]
