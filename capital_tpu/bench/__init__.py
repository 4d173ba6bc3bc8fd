"""Benchmark drivers (ref: bench/{cholesky,qr,matmult,inverse}/*.cpp).

Run as modules, e.g.:

    python -m capital_tpu.bench.cholinv --n 8192 --c 1 --num-iter 3
    python -m capital_tpu.bench.cacqr   --m 1048576 --n 1024 --variant 2
    python -m capital_tpu.bench.summa_gemm --m 8192 --k 8192 --n 8192

Unlike the reference (whose validate calls are commented out,
ref: bench/cholesky/cholinv.cpp:61-66), residual checks are always on
unless --no-validate.
"""
