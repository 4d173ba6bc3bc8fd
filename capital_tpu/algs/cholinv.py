"""Recursive communication-avoiding Cholesky + simultaneous triangular inverse.

Re-design of the reference's flagship cholinv algorithm
(ref: src/alg/cholesky/cholinv/cholinv.hpp:6-165, cholinv.h:11-53): computes
the upper-triangular R (A = R^T R) AND R^{-1} in one divide-and-conquer
sweep over a c x d x d grid.

Schedule (identical recursion structure, TPU-native mechanics):

    rec(A, n):
      n <= bc:  base case — factor the aggregated block          [leaf]
      else:
        R11, R11inv = rec(A[:n1,:n1])
        R12  = R11inv^T @ A[:n1,n1:]          # TRSM step -> summa TRMM
                                              #   (ref: cholinv.hpp:116-123)
        S    = A[n1:,n1:] - R12^T R12         # Schur complement -> summa SYRK
                                              #   (ref: cholinv.hpp:131-134)
        R22, R22inv = rec(S)
        R12inv = -R11inv @ R12 @ R22inv       # inverse assembly, 2 TRMMs
                                              #   (ref: cholinv.hpp:147-156)

What the reference does with template machinery maps onto JAX as:

  * `simulate` allocation dry-run (cholinv.hpp:50-83)  -> jit tracing
    (recursion unrolls at trace time over static block sizes).
  * serialize sub-block extraction (serialize.hpp)     -> lax.slice on the
    sharded global array; GSPMD re-shards slices.
  * base-case policies (policy.h:160-514)          -> BasePolicy dispatch in
    `_base_case`: REPLICATED all-gathers the bc x bc block to every chip and
    factors it identically; LAYER factors on the z==0 depth layer only and
    broadcasts along depth; GATHER factors on a single device and
    broadcasts mesh-wide. All three are live schedules (lax.cond on mesh
    axis indices inside shard_map) and an autotuning axis.
  * IntermediatesPolicy Save/Flush (policy.h:21-156)   -> XLA buffer
    liveness + optional jax.checkpoint on the recursion (cfg.remat).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from capital_tpu import tracing
from capital_tpu.grid import Grid, AXIS_X, AXIS_Y
from capital_tpu.matrix import DistMatrix, Structure
from capital_tpu.ops import lapack
from capital_tpu.parallel import summa


class BasePolicy(enum.Enum):
    """Base-case compute placement (ref: cholinv/policy.h:160-514).

    The reference's four MPI aggregation strategies, each a REAL schedule
    here (dispatched in `_base_case`):

    REPLICATED (ReplicateCommComp, policy.h:160-224): all-gather the block,
        every chip factors it redundantly. Zero extra collectives (depth
        layers hold identical replicas already); redundant (bc)^3 compute.
        The usual TPU winner — but not always: on large-c meshes with a big
        base case the c-fold redundant potrf+trtri is real MXU time LAYER
        can reclaim.
    LAYER (ReplicateComp, policy.h:226-305): factor only on the z==0 depth
        layer (a lax.cond on the depth axis index inside shard_map — non-
        root layers genuinely skip the compute), then broadcast along depth
        as a psum against zeros. Trades a c-way depth collective for a c-x
        compute saving: wins when bc^3 compute > n^2 depth-broadcast time.
    GATHER (NoReplication, policy.h:307-414): factor only on device
        (z,y,x) == (0,0,0), broadcast to everyone (psum over the whole
        mesh). P-1 devices idle through the base case; exists as the
        reference's measurement point for "no redundant compute at all" and
        as the autotuner's lower anchor.
    GATHER_OVERLAP (NoReplicationOverlap, policy.h:416-514): root-only
        compute like GATHER, but the factor's broadcast overlaps the
        root's triangular-inverse compute — the reference's MPI_Iscatter-
        during-trtri pipeline (policy.h:470-488), expressed as two
        independent subgraphs: psum(R) has no data dependence on
        trtri(R), so XLA's async scheduler runs the collective while the
        root's MXU inverts. Costs the fused chol+inv kernel (the stages
        must be separate ops to overlap) — the same trade the reference
        makes by splitting its potrf/trtri calls.
    """

    REPLICATED = "replicated"
    LAYER = "layer"
    GATHER = "gather"
    GATHER_OVERLAP = "gather_overlap"


@dataclass(frozen=True)
class Config:
    """Knobs of the reference's `info` pack (ref: cholinv.h:16-44).

    split:        recursion split exponent — top-left block is n >> split
                  (ref: cholinv.hpp:92).
    bc_mult:      base-case dim = (d*c) << bc_mult, clamped to >= 128 for
                  MXU-friendly leaves (ref: bc_mult_dim scaling,
                  cholinv.hpp:15-18).
    complete_inv: assemble off-diagonal R12inv blocks at the top level too
                  (ref: cholinv.hpp:147-156).
    base_method:  local kernel for the replicated leaf ('pallas'|'xla'|'auto').
    base_policy:  WHERE the leaf is factored (BasePolicy / its string value)
                  — the reference's BaseCasePolicy template axis.
    summa_impl:   'shard_map' (explicit collectives), 'ring' (Cannon
                  rotation with compute/ppermute overlap) or 'gspmd'.
    summa_chunks: K-chunked gather/gemm pipelining depth for the shard_map
                  impl (the reference's num_chunks Ibcast knob,
                  summa.hpp:195-215).
    summa_throttle: serialize the row/column operand gathers so at most one
                  collective is in flight (the reference's
                  COLLECTIVE_CONCURRENCY_SOLO/LAYER compile flags,
                  summa.hpp:179-192, as a runtime knob).
    summa_collect_chunks: slab-pipelined depth psum of the partial C (the
                  reference's chunked MPI_Iallreduce collect,
                  summa.hpp:238-249); no-op on c == 1 grids.
    remat:        jax.checkpoint the recursion branches (FlushIntermediates
                  analog — trades FLOPs for peak memory).
    """

    split: int = 1
    bc_mult: int = 0
    complete_inv: bool = True
    base_method: str = "auto"
    base_policy: BasePolicy = BasePolicy.REPLICATED
    summa_impl: str = "shard_map"
    summa_chunks: int = 1
    summa_throttle: bool = False
    summa_collect_chunks: int = 1
    remat: bool = False
    # factorization direction (ref: the `dir` knob in the info pack,
    # cholinv.h:26-43): False -> A = R^T R (upper R), True -> A = L L^T
    # (lower L = R^T, exported via one distributed transpose)
    lower: bool = False
    # autotuned single-chip default (autotune_cholinv_wide sweep, n=8192):
    # bc 512-1024 beats 128 by ~1.5x; the pallas leaf covers up to 1024
    min_bc: int = 512

    def __post_init__(self):
        if isinstance(self.base_policy, str):
            object.__setattr__(self, "base_policy",
                               BasePolicy(self.base_policy))

    def base_dim(self, grid: Grid, n: int) -> int:
        # bc_mult is a +-power-of-2 scaling, negative allowed (ref: the
        # bcMultiplier semantics of cholinv.hpp:15-18)
        base = max(self.min_bc, grid.d * grid.c)
        bc = (base >> -self.bc_mult if self.bc_mult < 0
              else base << self.bc_mult)
        return min(max(bc, 1), n)


def _policy_axes(grid: Grid, policy: BasePolicy):
    """Mesh axes whose index must be 0 for a device to compute the leaf.
    Empty tuple = every device computes (REPLICATED)."""
    if policy in (BasePolicy.GATHER, BasePolicy.GATHER_OVERLAP):
        return tuple(ax for ax in (grid.ax_z, grid.ax_y, grid.ax_x)
                     if ax is not None and grid.mesh.shape[ax] > 1)
    if policy is BasePolicy.LAYER:
        if grid.ax_z is not None and grid.c > 1:
            return (grid.ax_z,)
    return ()


def _base_case(grid: Grid, a, cfg: Config):
    """Leaf factorization with placement dispatched on cfg.base_policy
    (ref: the four BaseCasePolicy classes, policy.h:160-514).

    All policies start from the same "gather": the with_sharding_constraint
    to P(None, None) is the all-gather on the slice axes (ref: MPI_Allgather
    in policy.h:176); the constraint back to P('y','x') is a local slice
    (free). They differ in WHO factors the replicated block:

      REPLICATED — everyone (no further collectives);
      LAYER      — the z==0 layer, then psum over the depth axis;
      GATHER     — device (0,..,0), then psum over the whole mesh.

    The conditional compute is a lax.cond on mesh axis indices inside a
    shard_map — real device-local control flow, so the skipped devices do
    no MXU work while the broadcast-psum is in flight."""
    a_rep = grid.constrain(a, P(None, None))
    axes = _policy_axes(grid, cfg.base_policy)
    if not axes:
        r, rinv = lapack.chol_inv(a_rep, lower=False, method=cfg.base_method,
                                  platform=grid.platform)
    elif cfg.base_policy is BasePolicy.GATHER_OVERLAP:
        # the reference's Iscatter-during-trtri overlap (policy.h:470-488):
        # stage the root compute as potrf THEN trtri, and start R's
        # broadcast between them — psum(R) and trtri(R) share only R, so
        # the collective rides the wire while the root's MXU inverts.
        def kern_ov(blk):
            root = jnp.bool_(True)
            for ax in axes:
                root = jnp.logical_and(root, jax.lax.axis_index(ax) == 0)

            def idle(b):
                return jnp.zeros_like(b)

            r_l = jax.lax.cond(
                root, lambda b: lapack.potrf(b, lower=False), idle, blk)
            r_g = jax.lax.psum(r_l, axes)
            ri_l = jax.lax.cond(
                root, lambda rr: lapack.trtri(rr, lower=False), idle, r_l)
            return r_g, jax.lax.psum(ri_l, axes)

        f = jax.shard_map(
            kern_ov, mesh=grid.mesh,
            in_specs=P(None, None), out_specs=P(None, None),
            check_vma=False,
        )
        r, rinv = f(a_rep)
    else:
        def kern(blk):
            root = jnp.bool_(True)
            for ax in axes:
                root = jnp.logical_and(root, jax.lax.axis_index(ax) == 0)

            def compute(b):
                return lapack.chol_inv(b, lower=False,
                                       method=cfg.base_method,
                                       platform=grid.platform)

            def idle(b):
                return jnp.zeros_like(b), jnp.zeros_like(b)

            r_l, ri_l = jax.lax.cond(root, compute, idle, blk)
            # broadcast-from-root as a psum against zeros (ref: the
            # MPI_Bcast along depth at policy.h:288-289 / the scatter+bcast
            # at policy.h:386-413)
            return jax.lax.psum(r_l, axes), jax.lax.psum(ri_l, axes)

        f = jax.shard_map(
            kern, mesh=grid.mesh,
            in_specs=P(None, None), out_specs=P(None, None),
            # the value IS replicated over the unmapped axes (identical
            # replicas in, same cond+psum everywhere) but the static vma
            # checker cannot see through the axis-index cond
            check_vma=False,
        )
        r, rinv = f(a_rep)
    r = grid.constrain(r, grid.slice_spec)
    rinv = grid.constrain(rinv, grid.slice_spec)
    return r, rinv


def _rec(grid: Grid, carry, off: int, n: int, bc: int, cfg: Config, top: bool):
    """Workspace-style recursion with R stored IN the workspace: (W, Rinv)
    are two full-size buffers threaded through the recursion. Each computed
    R block overwrites exactly the A rows it just eliminated (never read as
    A again — elimination proceeds down-right), so the matrix really IS the
    workspace like the reference's in-place overwrite (ref:
    cholinv.hpp:87-165), and R12 is re-read from W after the second
    recursion instead of being kept live across it. Peak memory: 2 n^2 +
    one off-diagonal band, vs O(depth * n^2) for per-level re-assembly.
    All block writes are dynamic_update_slice, which XLA aliases in place.
    Returns W whose upper triangle is R."""
    w, ri = carry
    end = off + n

    if n <= bc:
        # phase names mirror the reference's -DALGORITHMIC_SYMBOLS regions
        # (CI::factor_diag / CI::trsm / CI::tmu, ref: cholinv.hpp:94-136)
        with tracing.phase("CI::factor_diag"):
            esz = w.dtype.itemsize
            tracing.record(
                "base_case",
                flops=2.0 * n**3 / 3.0,  # replicated potrf+trtri on every chip
                comm_bytes=tracing.all_gather_bytes(
                    n * n * esz / max(grid.d1 * grid.d2, 1),
                    grid.d1 * grid.d2,
                ),
                msgs=1,
            )
            blk = jax.lax.slice(w, (off, off), (end, end))
            rb, rib = _base_case(grid, blk, cfg)
            w = jax.lax.dynamic_update_slice(w, rb, (off, off))
            ri = jax.lax.dynamic_update_slice(ri, rib, (off, off))
            return w, ri

    n1 = max(bc, n >> cfg.split)
    n2 = n - n1
    mid = off + n1

    rec = _rec
    if cfg.remat:
        # only the carry is traced; grid/offsets/cfg are static closure state
        ckpt = jax.checkpoint(
            lambda carry, _off, _n: _rec(grid, carry, _off, _n, bc, cfg, False),
            static_argnums=(1, 2),
        )
        rec = lambda _g, carry, _off, _n, _bc, _cfg, _top: ckpt(carry, _off, _n)

    w, ri = rec(grid, (w, ri), off, n1, bc, cfg, False)

    # Sub-blocks are addressed as WINDOWS of the full workspace buffers:
    # the triangle kernels fold the (static) offsets into their BlockSpec
    # index maps, so no lax.slice copy is ever materialized for an operand
    # (each one is a real 1-3 ms HBM copy at n=32768 — the reference's
    # `_restrict_` pointer-offset views, matrix.hpp:171-180, recovered on
    # TPU). Distributed grids slice inside summa (the serialize step).
    kw = dict(impl=cfg.summa_impl, num_chunks=cfg.summa_chunks,
              throttle=cfg.summa_throttle,
              collect_chunks=cfg.summa_collect_chunks)

    # TRSM step: R12 = R11^{-T} A12, written over A12 in the workspace
    # (ref: cholinv.hpp:116-123 — transpose of R11inv + summa TRMM).
    with tracing.phase("CI::trsm"):
        r12 = summa.trmm(grid, ri, w, side="L", uplo="U", trans_a=True,
                         a_window=(off, off, n1, n1),
                         b_window=(off, mid, n1, n2), **kw)
    w = jax.lax.dynamic_update_slice(w, r12, (off, mid))

    # Schur update: A22 <- A22 - R12^T R12 in the workspace
    # (ref: cholinv.hpp:131-134).
    with tracing.phase("CI::tmu"):
        a22 = jax.lax.slice(w, (mid, mid), (end, end))
        s = summa.syrk(grid, w, c=a22, alpha=-1.0, beta=1.0,
                       a_window=(off, mid, n1, n2), **kw)
    del r12  # re-read from W below; keeping it live would double the band
    w = jax.lax.dynamic_update_slice(w, s, (mid, mid))

    w, ri = rec(grid, (w, ri), mid, n2, bc, cfg, False)

    if cfg.complete_inv or not top:
        # R12inv = -R11inv @ R12 @ R22inv (ref: cholinv.hpp:147-156).
        with tracing.phase("CI::inv"):
            t = summa.trmm(grid, ri, w, side="R", uplo="U",
                           a_window=(mid, mid, n2, n2),
                           b_window=(off, mid, n1, n2), **kw)
            r12inv = summa.trmm(grid, ri, t, side="L", uplo="U",
                                alpha=-1.0, a_window=(off, off, n1, n1),
                                **kw)
        ri = jax.lax.dynamic_update_slice(ri, r12inv, (off, mid))
    return w, ri


def factor(grid: Grid, a, cfg: Config = Config()):
    """Factor a (padded) SPD matrix: returns (R, Rinv), both dense upper-
    triangular-valued arrays sharded P('y','x') (ref: cholinv::factor,
    cholinv.hpp:6-28).

    Accepts a DistMatrix or a raw global array whose shape is already
    summa-compatible (d | n and d*c | n).
    """
    if isinstance(a, DistMatrix):
        arr = a.data
    else:
        arr = a
    n = arr.shape[0]
    bc = cfg.base_dim(grid, n)
    zeros = grid.constrain(jnp.zeros_like(arr), grid.slice_spec)
    w, rinv = _rec(grid, (arr, zeros), 0, n, bc, cfg, True)
    # W's upper triangle IS R; the mask is elementwise so XLA aliases it
    r = grid.constrain(jnp.triu(w), grid.slice_spec)
    rinv = grid.constrain(rinv, grid.slice_spec)
    if cfg.lower:
        # A = L L^T with L = R^T (the reference's `dir` switch)
        r = summa.transpose(grid, r, impl=cfg.summa_impl)
        rinv = summa.transpose(grid, rinv, impl=cfg.summa_impl)
    return r, rinv


def construct_r(r, shape=None) -> jax.Array:
    """Dense masked export (ref: construct_R, cholinv.hpp:30-37)."""
    out = jnp.triu(r)
    if shape is not None:
        out = out[: shape[0], : shape[1]]
    return out


def construct_rinv(rinv, shape=None) -> jax.Array:
    """(ref: construct_Rinv, cholinv.hpp:39-46)"""
    return construct_r(rinv, shape)
