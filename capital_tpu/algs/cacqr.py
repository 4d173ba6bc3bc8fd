"""Communication-avoiding CholeskyQR / CholeskyQR2 (tall-skinny QR).

Re-design of the reference's cacqr (ref: src/alg/qr/cacqr/cacqr.hpp:5-280,
cacqr.h:17-55): A = QR for m >> n by factorizing the n x n Gram matrix.
One sweep:

    G = A^T A            (distributed reduction — THE communication)
    R, Rinv = chol_inv(G)
    Q = A @ Rinv         (embarrassingly parallel over row shards)

CholeskyQR2 (num_iter=2) runs the sweep twice and merges R <- R2 @ R1 —
that second sweep IS the conditioning fix (ref: cacqr.hpp:180-210; arXiv
1710.08471). The reference dispatches on grid shape (c==1 -> invoke_1d,
c==d -> invoke_3d on a nested cube, else sweep_tune hybrid,
ref: cacqr.hpp:229-244); here the dispatch is on where the Gram Cholesky
runs:

  * 1D path (default for genuinely tall-skinny A): rows sharded over ALL
    devices, Gram formed by one psum over the whole mesh
    (ref: invoke_1d, cacqr.hpp:5-29 — local syrk + MPI_Allreduce), Gram
    factored REPLICATED on every chip (the n x n block is tiny next to A).
    Q = A @ Rinv is a local trmm per shard — zero communication.
  * 3D path (n large enough to matter): A sharded P('y','x'), Gram via
    summa.syrk, Gram factored by the distributed recursive cholinv
    (ref: sweep_3d, cacqr.hpp:75-120), Q via summa trmm or the 2-block
    `solve` back-substitution when only a partial inverse was assembled
    (ref: solve, cacqr.hpp:44-73).

The Gram reduction policy mirrors the reference's split reduction tree
(column_contig Reduce + column_alt Allreduce, ref: cacqr.hpp:146-149):
'allreduce' = one psum over the joint axis; 'two_stage' = psum_scatter over
the long axis + all_gather (rides ICI rings with half the bytes at the root).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from capital_tpu import tracing
from capital_tpu.ops.precision import dot as _pdot
from capital_tpu.grid import Grid, ALL_AXES, AXIS_X, AXIS_Y, AXIS_Z
from capital_tpu.matrix import DistMatrix
from capital_tpu.ops import blas, lapack
from capital_tpu.algs import cholinv as _cholinv
from capital_tpu.parallel import summa


@dataclass(frozen=True)
class Config:
    """(ref: cacqr::info, cacqr.h:18-40)

    num_iter:     1 = CholeskyQR, 2 = CholeskyQR2 (ref: bench/qr/cacqr.cpp:14
                  variant knob).
    gram_policy:  'allreduce' | 'two_stage' | 'packed' (ref: cacqr.hpp:89-99
                  vs 146-149; 'packed' = the Serialize policy's half-word
                  triangular allreduce, policy.h:77-85).
    local_thresh: Gram side below which the 1D replicated path is used.
    chol:         config of the nested cholinv (ref: cacqr.h:17 — cacqr is
                  parameterized by the cholinv type).
    """

    num_iter: int = 2
    gram_policy: str = "allreduce"
    local_thresh: int = 4096
    base_method: str = "auto"
    # formq_chunks > 1 forms Q = A Rinv by overwriting A's buffer in row
    # chunks (Q row i depends only on A row i): peak memory drops from
    # A + Q to A + chunk, which is what lets near-HBM-sized operands
    # factor on one chip. 1 = plain out-of-place trmm.
    formq_chunks: int = 1
    # Gram kernel: 'dot' (XLA), 'tri' (triangle-aware Pallas syrk, half the
    # MXU flops), 'auto' (tri for f32 on TPU)
    gram_kernel: str = "auto"
    chol: _cholinv.Config = field(default_factory=_cholinv.Config)


# ---------------------------------------------------------------------------
# Gram reductions (the only collectives on the 1D path)
# ---------------------------------------------------------------------------

def _resolve_gram_kernel(kernel: str, dtype, platform: str,
                         n: int | None = None) -> str:
    """'tri' = triangle-aware Pallas syrk (half the MXU flops — the dsyrk
    saving XLA's dot lacks, ref: the reference delegates to MKL dsyrk,
    src/blas/interface.hpp:77-97); 'auto' picks it on TPU: always for f32
    (~2x on Gram compute), and for bf16 at n >= 2048 (measured 29% at
    n=4096 with the long-chunk bf16 tiles; a wash at n=1024 where XLA's
    1-pass gemm already runs at 92% of peak)."""
    if kernel == "auto":
        if platform not in ("tpu", "axon"):
            return "dot"
        if dtype == jnp.float32:
            return "tri"
        if dtype == jnp.bfloat16 and n is not None and n >= 2048:
            return "tri"
        return "dot"
    return kernel


def _local_gram(a_blk, kernel: str):
    if kernel == "tri":
        from capital_tpu.ops.pallas_syrk import syrk_upper

        return syrk_upper(a_blk)
    return _pdot(a_blk.T, a_blk)


# -- packed-triangle form (ref: the Serialize gram policy allreduces the
# n(n+1)/2-word packed uppertri form instead of the full square,
# src/alg/qr/cacqr/policy.h:77-85). TPU-native packing is TILE-granular:
# the upper T x T tiles (i <= j) are stacked into one (npairs, T, T) array
# — contiguous block moves instead of an elementwise triangular gather, and
# the same ~2x byte saving: npairs*T^2 = n(n+T)/2 words.

_PACK_T = 128  # pack tile; 128 keeps every slice lane-aligned


def _tri_pack_size(n: int, t: int = _PACK_T) -> int:
    nt = n // t
    return (nt * (nt + 1) // 2) * t * t


def _pack_tri(g, t: int = _PACK_T):
    n = g.shape[0]
    nt = n // t
    idx = jnp.asarray([i * nt + j for i in range(nt) for j in range(i, nt)])
    tiles = g.reshape(nt, t, nt, t).transpose(0, 2, 1, 3).reshape(nt * nt, t, t)
    return jnp.take(tiles, idx, axis=0)


def _unpack_tri(packed, n: int, t: int = _PACK_T):
    nt = n // t
    idx = jnp.asarray([i * nt + j for i in range(nt) for j in range(i, nt)])
    tiles = jnp.zeros((nt * nt, t, t), packed.dtype).at[idx].set(packed)
    g = tiles.reshape(nt, nt, t, t).transpose(0, 2, 1, 3).reshape(n, n)
    # mirror the strictly-lower tiles from the upper ones (diagonal tiles
    # were packed whole, so only whole-tile mirroring is needed)
    row_t = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // t
    col_t = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // t
    return jnp.where(row_t > col_t, g.T, g)


def gram_1d(grid: Grid, a, policy: str = "allreduce", kernel: str = "dot"):
    """G = A^T A with A sharded P(('z','y','x'), None). Returns G replicated.

    (ref: local _syrk + MPI_Allreduce on world, cacqr.hpp:14-17 +
    policy.h:18-24)."""
    n = a.shape[1]
    kernel = _resolve_gram_kernel(kernel, a.dtype, grid.platform, n)

    if policy == "allreduce":
        def kern(a_blk):
            g = _local_gram(a_blk, kernel)
            return lax.psum(g.astype(a_blk.dtype), ALL_AXES)
    elif policy == "two_stage":
        # reduce-scatter over the long mesh dimension, then all-gather:
        # same result, fewer bytes per link on big meshes
        # (ref: two-stage column_contig/column_alt tree, cacqr.hpp:146-149).
        def kern(a_blk):
            g = _local_gram(a_blk, kernel)
            g = g.astype(a_blk.dtype)
            g = lax.psum_scatter(g, ALL_AXES, scatter_dimension=0, tiled=True)
            return lax.all_gather(g, ALL_AXES, axis=0, tiled=True)
    elif policy == "packed":
        # allreduce the packed upper-triangle form — half the words on the
        # wire, pack/unpack stays on device around the psum (ref: the
        # Serialize gram policy, policy.h:77-85)
        if n % _PACK_T:
            return gram_1d(grid, a, "allreduce", kernel)

        def kern(a_blk):
            g = _local_gram(a_blk, kernel)
            p = _pack_tri(g.astype(a_blk.dtype))
            p = lax.psum(p, ALL_AXES)
            return _unpack_tri(p, n)
    else:
        raise ValueError(f"unknown gram policy {policy!r}")

    f = jax.shard_map(
        kern,
        mesh=grid.mesh,
        in_specs=P(ALL_AXES, None),
        out_specs=P(None, None),
        # vma checking off when (a) the scatter+gather pair provably
        # replicates but the static checker can't see it, or (b) the Pallas
        # gram kernel is used (pallas_call outputs carry no vma annotation)
        check_vma=(policy in ("allreduce", "packed") and kernel != "tri"),
    )
    return f(a)


# ---------------------------------------------------------------------------
# 1D path (ref: invoke_1d, cacqr.hpp:5-29)
# ---------------------------------------------------------------------------

def _sweep_1d(grid: Grid, a, cfg: Config):
    # phase names mirror the reference's -DALGORITHMIC_SYMBOLS regions
    # (CQR::gram / CQR::formR / CQR::formQ, ref: cacqr.hpp:82-116)
    m, n = a.shape
    p = grid.num_devices
    esz = a.dtype.itemsize
    with tracing.phase("CQR::gram"):
        # 'packed' moves the n(n+T)/2-word triangle instead of n^2 (ref:
        # policy.h:77-85); the other policies move the full square.
        words = (_tri_pack_size(n)
                 if cfg.gram_policy == "packed" and n % _PACK_T == 0
                 else n * n)
        tracing.record("gram_1d", flops=2.0 * m * n * n / p,
                       comm_bytes=tracing.psum_bytes(words * esz, p), msgs=1)
        g = gram_1d(grid, a, cfg.gram_policy, kernel=cfg.gram_kernel)
    with tracing.phase("CQR::formR"):
        tracing.record("chol_inv", flops=2.0 * n**3 / 3.0)
        r, rinv = lapack.chol_inv(g, lower=False, method=cfg.base_method,
                                  platform=grid.platform)
    with tracing.phase("CQR::formQ"):
        # Q = A @ Rinv: rinv replicated, rows of A in place — local trmm
        # (triangle-aware Pallas kernel on TPU: ~m n^2 instead of 2 m n^2
        # MXU flops, the dtrmm saving of interface.hpp:54-75).
        tracing.record("trmm_local", flops=2.0 * m * n * n / p)
        if cfg.formq_chunks > 1:
            q = _formq_inplace(grid, a, rinv, cfg.formq_chunks)
        elif grid.num_devices == 1:
            q = blas.trmm(rinv, a, side="R", uplo="U",
                          platform=grid.platform)
        else:
            # keep the Pallas kernel inside the per-device scope: a global
            # pallas_call on a sharded operand would force replication
            def kern(a_blk, t_rep):
                return blas.trmm(t_rep, a_blk, side="R", uplo="U",
                                 platform=grid.platform)

            q = jax.shard_map(kern, mesh=grid.mesh,
                              in_specs=(P(ALL_AXES, None), P(None, None)),
                              out_specs=P(ALL_AXES, None),
                              check_vma=False)(a, rinv)
    q = grid.constrain(q, P(ALL_AXES, None))
    return q, r


def _formq_inplace(grid: Grid, a, rinv, chunks: int):
    """Q = A @ triu(Rinv) overwriting A's row chunks in place (each Q row
    depends only on the same A row, so the read-then-write per chunk lets
    XLA alias the buffer — the donated operand is never duplicated).

    Each chunk multiply goes through blas.trmm, i.e. the triangle-aware
    Pallas kernel on TPU (~half the MXU flops of the plain dot)."""
    t = jnp.triu(rinv)

    def kern(a_blk, t_rep):
        rows = a_blk.shape[0]
        # exact division only: dynamic_slice clamps at the boundary, and a
        # clamped final chunk would re-read rows already transformed
        nch = chunks
        while rows % nch:
            nch -= 1
        ch = rows // nch

        def body(i, buf):
            blk = lax.dynamic_slice_in_dim(buf, i * ch, ch, 0)
            qc = blas.trmm(t_rep, blk, side="R", uplo="U",
                           platform=grid.platform).astype(buf.dtype)
            return lax.dynamic_update_slice_in_dim(buf, qc, i * ch, 0)

        return lax.fori_loop(0, nch, body, a_blk)

    f = jax.shard_map(kern, mesh=grid.mesh,
                      in_specs=(P(ALL_AXES, None), P(None, None)),
                      out_specs=P(ALL_AXES, None),
                      # pallas outputs carry no vma annotation
                      check_vma=False)
    return f(a, t)


def factor_1d(grid: Grid, a, cfg: Config = Config()):
    """CholeskyQR(2) with rows sharded over the full mesh. Returns (Q, R):
    Q sharded like A, R replicated n x n."""
    if isinstance(a, DistMatrix):
        a = a.data
    q, r1 = _sweep_1d(grid, a, cfg)
    if cfg.num_iter == 1:
        return q, r1
    q, r2 = _sweep_1d(grid, q, cfg)
    # merge R <- R2 @ R1 (ref: cacqr.hpp:204-210 — TRMM of the two factors).
    r = blas.trmm(r2, jnp.triu(r1), side="L", uplo="U",
                  platform=grid.platform)
    return q, jnp.triu(r)


# ---------------------------------------------------------------------------
# 3D path (ref: sweep_3d / invoke_3d, cacqr.hpp:75-120, 197-215)
# ---------------------------------------------------------------------------

def _solve_2block(grid: Grid, a, r, rinv, n1: int, cfg: Config):
    """Q from a *partial* inverse via 2-level block back-substitution
    (ref: solve, cacqr.hpp:44-73): Q1 = A1 R11inv; Q2 = (A2 - Q1 R12) R22inv."""
    n = r.shape[0]
    impl = cfg.chol.summa_impl
    a1 = jax.lax.slice(a, (0, 0), (a.shape[0], n1))
    a2 = jax.lax.slice(a, (0, n1), (a.shape[0], n))
    r11i = jax.lax.slice(rinv, (0, 0), (n1, n1))
    r22i = jax.lax.slice(rinv, (n1, n1), (n, n))
    r12 = jax.lax.slice(r, (0, n1), (n1, n))
    q1 = summa.trmm(grid, r11i, a1, side="R", uplo="U", impl=impl)
    t = summa.gemm(grid, q1, r12, c=a2, alpha=-1.0, beta=1.0, impl=impl)
    q2 = summa.trmm(grid, r22i, t, side="R", uplo="U", impl=impl)
    return grid.constrain(jnp.concatenate([q1, q2], axis=1), grid.slice_spec)


def _sweep_3d(grid: Grid, a, cfg: Config):
    # Gram = A^T A distributed (ref: bcast+gemm+reduce+bcast, cacqr.hpp:89-99
    # — summa.syrk's gathers/psum are the same tree on mesh axes).
    with tracing.phase("CQR::gram"):
        g = summa.syrk(grid, a, impl=cfg.chol.summa_impl)
    with tracing.phase("CQR::chol"):
        r, rinv = _cholinv.factor(grid, g, cfg.chol)
    with tracing.phase("CQR::formQ"):
        if cfg.chol.complete_inv:
            q = summa.trmm(grid, rinv, a, side="R", uplo="U",
                           impl=cfg.chol.summa_impl)
        else:
            n1 = max(cfg.chol.base_dim(grid, g.shape[0]),
                     g.shape[0] >> cfg.chol.split)
            q = _solve_2block(grid, a, r, rinv, n1, cfg)
    return q, r


def factor_3d(grid: Grid, a, cfg: Config = Config()):
    """CholeskyQR(2) with A sharded P('y','x') and a distributed Gram
    Cholesky. Returns (Q, R) both sharded P('y','x')."""
    if isinstance(a, DistMatrix):
        a = a.data
    q, r1 = _sweep_3d(grid, a, cfg)
    if cfg.num_iter == 1:
        return q, jnp.triu(r1)
    q, r2 = _sweep_3d(grid, q, cfg)
    r = summa.trmm(grid, r2, jnp.triu(r1), side="L", uplo="U",
                   impl=cfg.chol.summa_impl)
    return q, jnp.triu(r)


# ---------------------------------------------------------------------------
# hybrid path (ref: sweep_tune, cacqr.hpp:124-170 — 1 < c < d regime)
# ---------------------------------------------------------------------------

def gram_hybrid(grid: Grid, a, policy: str = "two_stage",
                kernel: str = "auto"):
    """G = A^T A with A row-sharded over the FULL rect mesh, returned
    SHARDED on the square (z, x) view — rows blocked by 'z', cols by 'x',
    replicated along the long 'y' axis.

    policy='two_stage' is the hierarchical tree (ref: the column_contig
    Reduce + column_alt Allreduce split, cacqr.hpp:146-149): the big
    reductions run on the small minor axes FIRST —

      1. psum_scatter over 'x' (cols -> x shards):  n^2 (c-1)/c bytes,
      2. psum_scatter over 'z' (rows -> z shards):  n^2 (c-1)/c^2 bytes,
      3. psum over 'y' (the long axis):             ~2 n^2/c^2 bytes

    — so the long-axis stage, the one that crosses DCN on a Grid.hybrid
    mesh (its 'x'/'z' are intra-host ICI), moves only 1/c^2 of the matrix.
    Each stage's output lands exactly where the square view's cholinv wants
    it: no re-sharding after the reduction.

    policy='allreduce' is the flat replicated psum (every device gets all
    of G, then keeps its square-view shard); 'packed' is the flat psum in
    packed-triangle form (half the words, ref: policy.h:77-85).
    """
    n = a.shape[1]
    kernel = _resolve_gram_kernel(kernel, a.dtype, grid.platform, n)
    zx_spec = P(AXIS_Z, AXIS_X)

    if policy == "two_stage":
        def kern(a_blk):
            g = _local_gram(a_blk, kernel).astype(a_blk.dtype)
            g = lax.psum_scatter(g, AXIS_X, scatter_dimension=1, tiled=True)
            g = lax.psum_scatter(g, AXIS_Z, scatter_dimension=0, tiled=True)
            return lax.psum(g, AXIS_Y)

        out_specs = zx_spec
    elif policy in ("allreduce", "packed"):
        packed = policy == "packed" and n % _PACK_T == 0

        def kern(a_blk):
            g = _local_gram(a_blk, kernel)
            if packed:
                p = lax.psum(_pack_tri(g.astype(a_blk.dtype)), ALL_AXES)
                return _unpack_tri(p, n)
            return lax.psum(g.astype(a_blk.dtype), ALL_AXES)

        out_specs = P(None, None)
    else:
        raise ValueError(f"unknown gram policy {policy!r}")

    f = jax.shard_map(kern, mesh=grid.mesh,
                      in_specs=P(ALL_AXES, None), out_specs=out_specs,
                      check_vma=kernel != "tri")
    return grid.constrain(f(a), zx_spec)


def _sweep_hybrid(grid: Grid, a, cfg: Config):
    """Rows sharded over the FULL mesh (like 1D), Gram factored DISTRIBUTED
    on a square (z, x) axis view (like 3D).

    The reference's sweep_tune splits the Gram reduction into a
    column_contig Reduce + column_alt Allreduce and runs cholinv on a nested
    square topology built over the rect grid's c^3 cube sub-communicator
    (ref: cacqr.hpp:146-149, 232-234). Here the nested topology is an
    axis-role VIEW: the mesh's depth and col axes (both size c on a rect
    grid) become the cholinv slice, no communicator surgery. The
    hierarchical reduction itself is gram_hybrid (honoring
    cfg.gram_policy / cfg.gram_kernel). Each 'y' layer redundantly factors
    its Gram replica — the ReplicateCommComp placement.
    """
    m, n = a.shape
    with tracing.phase("CQR::gram"):
        p = grid.num_devices
        esz = a.dtype.itemsize
        c = grid.c
        if cfg.gram_policy == "two_stage":
            comm = (tracing.psum_bytes(n * n * esz, c) / 2        # scatter x
                    + tracing.psum_bytes(n * n * esz / c, c) / 2  # scatter z
                    + tracing.psum_bytes(n * n * esz / (c * c), grid.d1))
        else:
            words = (_tri_pack_size(n)
                     if cfg.gram_policy == "packed" and n % _PACK_T == 0
                     else n * n)
            comm = tracing.psum_bytes(words * esz, p)
        tracing.record("gram_hybrid", flops=2.0 * m * n * n / p,
                       comm_bytes=comm, msgs=3)
        g = gram_hybrid(grid, a, cfg.gram_policy, kernel=cfg.gram_kernel)
    sq = grid.view(z=None, y="z", x="x")  # square c x c slice, y-replicated
    g = sq.constrain(g, sq.slice_spec)
    with tracing.phase("CQR::chol"):
        r, rinv = _cholinv.factor(sq, g, cfg.chol)
    with tracing.phase("CQR::formQ"):
        # Q = A @ Rinv with A row-sharded: replicate Rinv, local trmm
        # (Pallas triangle kernel kept inside the per-device scope).
        rinv_rep = sq.constrain(rinv, P(None, None))
        if grid.num_devices == 1:
            q = blas.trmm(rinv_rep, a, side="R", uplo="U",
                          platform=grid.platform)
        else:
            def kern(a_blk, t_rep):
                return blas.trmm(t_rep, a_blk, side="R", uplo="U",
                                 platform=grid.platform)

            q = jax.shard_map(kern, mesh=grid.mesh,
                              in_specs=(P(ALL_AXES, None), P(None, None)),
                              out_specs=P(ALL_AXES, None),
                              check_vma=False)(a, rinv_rep)
        q = grid.constrain(q, P(ALL_AXES, None))
    return q, sq.constrain(r, P(None, None))


def factor_hybrid(grid: Grid, a, cfg: Config = Config()):
    """CholeskyQR(2), hybrid regime: full-mesh row sharding + distributed
    Gram factorization on the (z, x) square view. Returns (Q, R), Q sharded
    like A, R replicated. Requires a rect grid (z and x axes equal size)."""
    if isinstance(a, DistMatrix):
        a = a.data
    if grid.c != grid.d2:
        raise ValueError(
            f"hybrid path needs a rect grid with c == d2, got {grid.shape}")
    q, r1 = _sweep_hybrid(grid, a, cfg)
    if cfg.num_iter == 1:
        return q, jnp.triu(r1)
    q, r2 = _sweep_hybrid(grid, q, cfg)
    r = blas.trmm(r2, jnp.triu(r1), side="L", uplo="U",
                  platform=grid.platform)
    return q, jnp.triu(r)


# ---------------------------------------------------------------------------
# dispatch (ref: cacqr::factor grid dispatch, cacqr.hpp:229-244)
# ---------------------------------------------------------------------------

def factor(grid: Grid, a, cfg: Config = Config()):
    """Dispatch, mirroring the reference's grid-shape dispatch
    (ref: cacqr.hpp:229-244): tiny Gram -> 1D replicated path (c==1 analog);
    larger Gram on a rect grid (c == d2 < d1) -> hybrid sweep_tune analog;
    else -> fully distributed 3D path (c==d analog)."""
    arr = a.data if isinstance(a, DistMatrix) else a
    if arr.shape[1] <= cfg.local_thresh:
        return factor_1d(grid, arr, cfg)
    if not grid.is_square and grid.c == grid.d2 and grid.c > 1:
        return factor_hybrid(grid, arr, cfg)
    return factor_3d(grid, arr, cfg)


def construct_q(q, shape=None):
    """Dense Q export, cropping generator padding (ref: construct_Q,
    cacqr.hpp:250-259)."""
    if shape is not None:
        q = q[: shape[0], : shape[1]]
    return q


def construct_r(r, shape=None):
    """Dense masked R export (ref: construct_R, cacqr.hpp:261-270)."""
    out = jnp.triu(r)
    if shape is not None:
        out = out[: shape[0], : shape[1]]
    return out


def apply_q(grid: Grid, q, x, *, trans: bool = False, cfg: Config = Config(),
            layout: str = "auto", out_dtype=None):
    """Y = Q X (ref: apply_Q summa-GEMM, cacqr.hpp:272-280). apply_QT — which
    the reference left as assert(0) "not implemented" (cacqr.hpp:284) — is
    completed here via the distributed transpose.

    out_dtype (1d trans path): dtype the reduced projection is psummed and
    returned in. Default q.dtype; pass f32 with bf16-stored operands to
    keep the skinny (n x k) projection at full accumulation precision —
    the mixed-precision shape rsvd depends on (only the wide m-row
    operands pay bf16 quantization)."""
    impl = cfg.chol.summa_impl
    if layout == "auto":
        from capital_tpu.validate import _is_row_sharded
        layout = "1d" if _is_row_sharded(q) else "2d"
    if layout == "1d":
        # row-sharded Q: local gemm; Q^T X needs a psum over rows.
        if not trans:
            return blas.gemm(q, x)
        od = out_dtype or q.dtype
        def kern(q_blk, x_blk):
            part = _pdot(q_blk.T, x_blk)
            return lax.psum(part.astype(od), ALL_AXES)
        f = jax.shard_map(kern, mesh=grid.mesh,
                          in_specs=(P(ALL_AXES, None), P(ALL_AXES, None)),
                          out_specs=P(None, None))
        return f(q, x)
    qq = summa.transpose(grid, q, impl=impl) if trans else q
    return summa.gemm(grid, qq, x, impl=impl)
