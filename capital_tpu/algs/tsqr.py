"""TSQR: unconditionally stable tall-skinny QR by tree reduction.

The communication-avoiding QR of Demmel, Grigori, Hoemmen & Langou
(arXiv:0806.2159 / 0809.2407 — the same paper lineage the reference's
CholeskyQR2 cites, README.md:9): Householder-quality orthogonality at the
SAME communication volume as CholeskyQR (one n x n-class reduction),
complementing cacqr where it runs out of conditioning — CholeskyQR2's
Gram squares the condition number, so f32 wants cond(A) <= ~1e5
(tests/test_cacqr.py); TSQR's per-block Householder factorizations keep
orthogonality at eps for ANY conditioning.

TPU-native schedule (two-level tree — the natural shape when the mesh is
one flat axis of D devices; the reference's multi-level binary butterfly
targets thousands of MPI ranks, ref: the tree discussion of 0809.2407):

  level 0 (local):  A_i = Q_i R_i          per-device Householder QR
  gather:           R_stack = [R_1; ...; R_D]   one all_gather (D n^2
                    words — the same wire volume class as the Gram psum)
  level 1 (replicated): R_stack = Q~ R     every device factors the
                    (D n) x n stack redundantly (ReplicateCommComp
                    placement, ref: cholinv policy.h:160-224)
  back-propagate:   Q_i <- Q_i @ Q~_i      one local gemm per device

Local QR is XLA's Householder geqrf/orgqr — the lapack-engine ops the
reference wraps but never calls (ref: src/lapack/engine.h:58-102,
interface.hpp:50-88); here they finally earn their keep.

Sign convention: R's diagonal is made nonnegative (the LAPACK-style
canonical form), applied as a diagonal flip on both factors.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from capital_tpu import tracing
from capital_tpu.grid import Grid, ALL_AXES
from capital_tpu.matrix import DistMatrix
from capital_tpu.ops import lapack


@dataclass(frozen=True)
class Config:
    """canonical: flip signs so diag(R) >= 0 (deterministic factors)."""

    canonical: bool = True


def factor(grid: Grid, a, cfg: Config = Config()):
    """A = Q R for row-sharded tall-skinny A ((m, n), m >> n, sharded
    P(('z','y','x'), None)). Returns (Q row-sharded with orthonormal
    columns at eps for any cond(A), R (n, n) upper-triangular replicated).
    """
    if isinstance(a, DistMatrix):
        a = a.data
    m, n = a.shape
    ndev = max(grid.num_devices, 1)
    if m % ndev or m // ndev < n:
        raise ValueError(
            f"tsqr needs ndev | m and local rows >= n: m={m}, n={n}, "
            f"devices={ndev}")
    esz = jnp.dtype(a.dtype).itemsize
    tracing.record(
        "tsqr",
        flops=(2.0 * m * n * n * 2.0) / max(ndev, 1)
        + 2.0 * ndev * n * n * n,
        comm_bytes=tracing.all_gather_bytes(n * n * esz, ndev),
        msgs=1,
    )

    with tracing.phase("TSQR::factor"):
        q, r = (_kern_single(a, cfg) if ndev == 1
                else _kern_tree(grid, a, cfg, ndev))
    return q, r


# AUTO-sharding formulation (no shard_map): the level-0 QRs run as ONE
# batched jnp.linalg.qr over the (ndev, m/ndev, n) block view with the
# batch axis sharded — GSPMD keeps each batch element device-local, and
# the QR custom call lowers through its normal path. Measured on-chip: the
# same QR issued INSIDE shard_map hits a ~40x-slower lowering on this
# platform (30.1 s vs 0.71 s at 2^19 x 512), and even a batch=1 batched
# call is ~13x slower than the plain one, hence the 1-device special case.
# Module-level jits: per-call closures would retrace/recompile every
# factor() invocation.


def _canon(q, r):
    s = jnp.where(jnp.diagonal(r) < 0, -1.0, 1.0).astype(r.dtype)
    return q * s[None, :], r * s[:, None]


@partial(jax.jit, static_argnames=("cfg",))
def _kern_single(arr, cfg: Config):
    with jax.default_matmul_precision("highest"):
        q, r = lapack.qr(arr)
    if cfg.canonical:
        q, r = _canon(q, r)
    return q, jnp.triu(r)


@partial(jax.jit, static_argnames=("grid", "cfg", "ndev"))
def _kern_tree(grid: Grid, arr, cfg: Config, ndev: int):
    m, n = arr.shape
    # pin the Householder updates' gemms to f32-faithful passes: at the
    # TPU default (1-pass bf16) the factor's orthogonality lands at 5e-5
    # instead of eps (measured 2^19 x 512) — defeating the whole point of
    # the stable QR
    with jax.default_matmul_precision("highest"):
        blocks = grid.constrain(
            arr.reshape(ndev, m // ndev, n), P(ALL_AXES, None, None))
        q0, r0 = lapack.qr(blocks)
        q0 = grid.constrain(q0, P(ALL_AXES, None, None))
        # the D small R factors, stacked and replicated (the tree's one
        # all-gather-sized exchange)
        r_stack = grid.constrain(r0.reshape(ndev * n, n), P(None, None))
        q1, r = lapack.qr(r_stack)
    if cfg.canonical:
        q1, r = _canon(q1, r)
    from capital_tpu.ops.precision import dot_general as _pdg

    acc = jnp.promote_types(arr.dtype, jnp.float32)
    # per-block back-propagation Q_i <- Q_i @ Q~_i (batched gemm, batch
    # axis still sharded)
    q1b = grid.constrain(q1.reshape(ndev, n, n), P(None, None, None))
    q = _pdg(q0, q1b,
             dimension_numbers=(((2,), (1,)), ((0,), (0,))),
             preferred_element_type=acc).astype(arr.dtype)
    q = grid.constrain(q, P(ALL_AXES, None, None)).reshape(m, n)
    return grid.constrain(q, P(ALL_AXES, None)), jnp.triu(r)
