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

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from capital_tpu import tracing
from capital_tpu.grid import Grid, ALL_AXES
from capital_tpu.matrix import DistMatrix


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
    ndev = grid.num_devices
    if m // max(ndev, 1) < n:
        raise ValueError(
            f"tsqr needs local rows >= n: m={m}, n={n}, devices={ndev}")
    esz = jnp.dtype(a.dtype).itemsize
    tracing.record(
        "tsqr",
        flops=(2.0 * m * n * n * 2.0) / max(ndev, 1)
        + 2.0 * ndev * n * n * n,
        comm_bytes=tracing.all_gather_bytes(n * n * esz, ndev),
        msgs=1,
    )

    def kern(a_blk):
        # pin the Householder updates' gemms to f32-faithful passes: at
        # the TPU default (1-pass bf16) the factor's orthogonality lands
        # at 5e-5 instead of eps (measured 2^19 x 512) — defeating the
        # whole point of the stable QR
        with jax.default_matmul_precision("highest"):
            q0, r0 = jnp.linalg.qr(a_blk, mode="reduced")
            # one all_gather of the D small R factors (axis 0 stacks them)
            r_stack = lax.all_gather(r0, ALL_AXES, axis=0, tiled=True)
            q1, r = jnp.linalg.qr(r_stack, mode="reduced")
        if cfg.canonical:
            s = jnp.where(jnp.diagonal(r) < 0, -1.0, 1.0).astype(r.dtype)
            r = r * s[:, None]
            q1 = q1 * s[None, :]
        # this device's n-row slab of the level-1 Q
        idx = lax.axis_index(ALL_AXES)
        q1_i = lax.dynamic_slice_in_dim(q1, idx * n, n, axis=0)
        from capital_tpu.ops.precision import dot as _pdot

        acc = jnp.promote_types(a_blk.dtype, jnp.float32)
        q = _pdot(q0, q1_i, preferred_element_type=acc)
        return q.astype(a_blk.dtype), jnp.triu(r)

    f = jax.shard_map(
        kern, mesh=grid.mesh,
        in_specs=P(ALL_AXES, None),
        out_specs=(P(ALL_AXES, None), P(None, None)),
        check_vma=False,  # the gathered-stack QR is replicated by
        # construction; the static checker cannot see through linalg.qr
    )
    with tracing.phase("TSQR::factor"):
        q, r = f(a)
    return grid.constrain(q, P(ALL_AXES, None)), r
