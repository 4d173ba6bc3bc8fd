from capital_tpu.ops import blas, lapack

__all__ = ["blas", "lapack"]
