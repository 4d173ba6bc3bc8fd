"""Distributed 2.5D matrix multiplication over the device mesh.

Re-design of the reference's SUMMA engine (ref: src/alg/matmult/summa/
summa.hpp:6-253): the single communication engine that cholinv, cacqr and
validation all ride on (same dependency shape here).

Reference schedule (MPI): operands block-distributed on the d x d slice and
replicated over the c-deep 'z' axis; A broadcast along row comms and B along
column comms rooted at the depth coordinate z (summa.hpp:163-221); local
GEMM; MPI_Allreduce of the partial C over the depth comm (summa.hpp:223-253).

TPU schedule (shard_map + XLA collectives over ICI), communication-optimal
for the same layout:

    each device (z, y, x) holds block A[y, x] (z-replicated);
    it locally slices the z-th 1/c of its block's K extent (the depth
    "root" of the reference becomes a local slice — data is already
    replicated, so no broadcast is needed to move K-work onto layer z);
    all_gather(A-slices, axis='x') / all_gather(B-slices, axis='y')
    assemble layer z's (1/c of the) K panels;          <- ref: distribute()
    one MXU gemm per device;                           <- ref: local _gemm
    psum over 'z' sums the layer partials.             <- ref: collect()

Per-device bytes moved ~ 2 n^2/(d c) + n^2/d^2: the 2.5D lower bound
O(n^2 / sqrt(c P)). With c=1 this is exactly 2D SUMMA; with c=d it is the
3D algorithm.

The reference's signature overlap knob — num_chunks-way chunked
MPI_Ibcast/Iallreduce pipelining (summa.hpp:195-215, 238-248) — exists here
as two explicit schedules on top of the baseline:

  * num_chunks > 1 on the shard_map impl: the K extent is gathered and
    multiplied in pipelined pieces (gather i+1 overlaps gemm i);
  * impl='ring': Cannon rotation — operand blocks take single ICI hops
    per step via lax.ppermute while the previous step's gemm runs.

All functions take/return *global* jax.Arrays sharded P('y','x') on
grid.mesh and are jit-traceable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from capital_tpu.grid import Grid, AXIS_X, AXIS_Y, AXIS_Z
from capital_tpu.matrix import Structure, apply_structure
from capital_tpu import tracing
from capital_tpu.ops.precision import dot as _pdot


def _slice_window(x, window):
    """Materialize a (r0, c0, h, w) window as a real slice (the distributed
    paths need actual arrays; the single-device kernels fold the offsets
    into their index maps instead — blas.trmm/syrk a_window/b_window)."""
    if window is None:
        return x
    r0, c0, h, w = window
    import jax.lax as _lax

    return _lax.slice(x, (r0, c0), (r0 + h, c0 + w))


def _win_shape(x, window):
    """Shape carrier for cost recording: the windowed extent, not the
    backing array's."""
    if window is None:
        return x
    import jax as _jax

    return _jax.ShapeDtypeStruct((window[2], window[3]), x.dtype)


def _record_gemm_cost(grid: Grid, a, b, collect_chunks: int = 1):
    """Analytic per-device cost of one 2.5D gemm (tracing.py, critter analog):
    2mnk/(d^2 c) MXU flops; two all_gathers of the K panels + one psum over
    depth (collect_chunks slab psums move the same volume in more
    messages — the latency/overlap trade the knob buys). Only active
    inside tracing.trace()."""
    if tracing.active() is None:
        return
    d, c = grid.d1, grid.c
    m, k = a.shape
    n = b.shape[1]
    esz = a.dtype.itemsize
    flops = 2.0 * m * n * k / (d * d * c)
    cc = max(1, collect_chunks) if c > 1 else 1
    comm = (
        tracing.all_gather_bytes(m * k * esz / (d * d * c), grid.d2)
        + tracing.all_gather_bytes(k * n * esz / (d * d * c), d)
        + tracing.psum_bytes(m * n * esz / (d * d), c)
    )
    tracing.record("summa.gemm", flops=flops, comm_bytes=comm, msgs=2 + cc)


def _check_divisible(grid: Grid, a, b):
    d, c = grid.d, grid.c
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"gemm shape mismatch: {a.shape} @ {b.shape}")
    if m % d or n % d or k % (d * c):
        raise ValueError(
            f"summa needs d | m,n and d*c | k: m={m} n={n} k={k} d={d} c={c}"
        )


def _z_slice(a_blk, b_blk, ax_z):
    """Layer z takes the z-th K sub-slice of every block (cyclic-over-
    blocks K chunking; the k-order of the two gathers matches by
    construction)."""
    if ax_z is None:
        return a_blk, b_blk
    z = lax.axis_index(ax_z)
    c = lax.axis_size(ax_z)
    kc_a = a_blk.shape[1] // c
    kc_b = b_blk.shape[0] // c
    a_sub = lax.dynamic_slice_in_dim(a_blk, z * kc_a, kc_a, 1)
    b_sub = lax.dynamic_slice_in_dim(b_blk, z * kc_b, kc_b, 0)
    return a_sub, b_sub


def _make_summa_kernel(ax_z, ax_y, ax_x, num_chunks: int = 1,
                       throttle: bool = False, collect_chunks: int = 1):
    """Local shard_map body over the grid's role axes.
    a_blk: (mb, kb), b_blk: (kb, nb) at coordinates (z, y, x).

    num_chunks > 1 pipelines the operand movement against the MXU exactly
    like the reference's chunked MPI_Ibcast knob (ref: summa.hpp:195-215):
    the K extent is split into num_chunks pieces, each piece is gathered
    and multiplied separately, and because chunk i+1's gather has no data
    dependence on chunk i's gemm, XLA's async scheduler overlaps them
    (software-pipelined double buffering — the Wait/compute interleave of
    summa.hpp:203-213).

    throttle=True is the COLLECTIVE_CONCURRENCY throttle analog (ref:
    summa.hpp:179-192 — compile-time flags restricting which grid planes
    issue collectives concurrently): the A row-gather and B column-gather
    are independent, so XLA issues them concurrently on two ICI dimensions;
    an optimization_barrier chains B's gather behind A's so at most one
    collective is in flight — same contention trade the reference's SOLO
    flag makes.

    collect_chunks > 1 pipelines the COLLECT half — the depth psum of the
    partial C — against the MXU, matching the reference's chunked
    MPI_Iallreduce (ref: summa.hpp:238-249, the other half of its overlap
    knob). Schedule change: the local product is computed in
    collect_chunks row slabs (each a_rows gather + gemm produces one
    finished C slab), and each slab's psum has no data dependence on the
    next slab's gather/gemm, so XLA overlaps reduce i with compute i+1.
    On c>1 meshes the depth reduce is the second-largest wire volume;
    this is its only overlap path. Composes with num_chunks (the K extent
    of each slab's gemm is still gather-pipelined)."""

    def kern(a_blk, b_blk):
        a_sub, b_sub = _z_slice(a_blk, b_blk, ax_z)
        chunks = num_chunks
        while a_sub.shape[1] % chunks or b_sub.shape[0] % chunks:
            chunks -= 1
        ka = a_sub.shape[1] // chunks
        kb = b_sub.shape[0] // chunks

        cc = collect_chunks if ax_z is not None else 1
        while a_sub.shape[0] % cc:
            cc -= 1
        if cc <= 1:
            part = None
            for i in range(chunks):
                a_c = lax.slice_in_dim(a_sub, i * ka, (i + 1) * ka, axis=1)
                b_c = lax.slice_in_dim(b_sub, i * kb, (i + 1) * kb, axis=0)
                a_k = lax.all_gather(a_c, ax_x, axis=1, tiled=True)
                if throttle:
                    a_k, b_c = lax.optimization_barrier((a_k, b_c))
                b_k = lax.all_gather(b_c, ax_y, axis=0, tiled=True)
                p = _pdot(a_k, b_k)
                part = p if part is None else part + p
            if ax_z is not None:
                part = lax.psum(part, ax_z)
            return part.astype(a_blk.dtype)
        # collect-pipelined path: B's K panels gathered ONCE up front (per
        # K chunk, preserving the chunk-gather K ordering the A side
        # uses); then per row slab, one A gather + gemm + psum — slab i's
        # psum overlaps slab i+1's gather/gemm.
        b_ks = []
        for j in range(chunks):
            b_c = lax.slice_in_dim(b_sub, j * kb, (j + 1) * kb, axis=0)
            b_ks.append(lax.all_gather(b_c, ax_y, axis=0, tiled=True))
        mb = a_sub.shape[0] // cc
        slabs = []
        for i in range(cc):
            rows = lax.slice_in_dim(a_sub, i * mb, (i + 1) * mb, axis=0)
            part = None
            for j in range(chunks):
                a_c = lax.slice_in_dim(rows, j * ka, (j + 1) * ka, axis=1)
                a_k = lax.all_gather(a_c, ax_x, axis=1, tiled=True)
                p = _pdot(a_k, b_ks[j])
                part = p if part is None else part + p
            slabs.append(lax.psum(part, ax_z))
        return jnp.concatenate(slabs, axis=0).astype(a_blk.dtype)

    return kern


def _make_ring_kernel(ax_z, ax_y, ax_x, d: int, collect_chunks: int = 1):
    """Cannon-rotation schedule: the TPU-native build of the reference's
    pipelined-broadcast overlap (ref: the num_chunks Ibcast pipeline,
    summa.hpp:195-215 — same goal, ICI-native mechanics).

    Instead of gathering the full K panels up front, operand blocks rotate
    around nearest-neighbor ICI rings one hop per step:

      pre-skew   A(y,x) <- A(y, x+y mod d) along the joint (y,x) axis,
                 B(y,x) <- B(y+x mod d, x)           [one ppermute each]
      d steps    local gemm on the co-resident (k-index-matched) blocks;
                 rotate A one hop along 'x', B one hop along 'y'.

    Step s's single-hop ppermute and step s-1's gemm have no mutual data
    dependence, so XLA double-buffers them: communication hides behind the
    MXU whenever gemm_time >= hop_time. Per-step messages are 1/d the size
    of the all_gather and travel exactly one ICI hop — the schedule 2.5D
    performance lives on for big meshes. Requires a square (d x d) slice.
    """

    def kern(a_blk, b_blk):
        a_sub, b_sub = _z_slice(a_blk, b_blk, ax_z)
        # pre-skew over the joint (y, x) axis: flat index = y*d + x
        skew_a = [(y * d + j, y * d + (j - y) % d)
                  for y in range(d) for j in range(d)]
        skew_b = [(i * d + x, ((i - x) % d) * d + x)
                  for i in range(d) for x in range(d)]
        a_s = lax.ppermute(a_sub, (ax_y, ax_x), skew_a)
        b_s = lax.ppermute(b_sub, (ax_y, ax_x), skew_b)
        rot_a = [(j, (j - 1) % d) for j in range(d)]
        rot_b = [(i, (i - 1) % d) for i in range(d)]
        cc = collect_chunks if ax_z is not None else 1
        while a_s.shape[0] % cc:
            cc -= 1
        part = None
        for s in range(d):
            if s + 1 == d and cc > 1:
                # chunked depth collect (ref: the Iallreduce half of the
                # overlap knob, summa.hpp:238-249): the LAST rotation
                # step's gemm runs in row slabs, each slab's accumulated
                # partial psummed while the next slab's gemm runs.
                mb = a_s.shape[0] // cc
                slabs = []
                for i in range(cc):
                    rows = lax.slice_in_dim(a_s, i * mb, (i + 1) * mb,
                                            axis=0)
                    p = _pdot(rows, b_s)
                    if part is not None:
                        p = p + lax.slice_in_dim(part, i * mb,
                                                 (i + 1) * mb, axis=0)
                    slabs.append(lax.psum(p, ax_z))
                part = jnp.concatenate(slabs, axis=0)
            else:
                p = _pdot(a_s, b_s)
                part = p if part is None else part + p
            if s + 1 < d:
                a_s = lax.ppermute(a_s, ax_x, rot_a)
                b_s = lax.ppermute(b_s, ax_y, rot_b)
        if ax_z is not None and cc <= 1:
            part = lax.psum(part, ax_z)
        return part.astype(a_blk.dtype)

    return kern


def gemm(grid: Grid, a, b, *, c=None, alpha=1.0, beta=0.0, impl="shard_map",
         num_chunks: int = 1, throttle: bool = False,
         collect_chunks: int = 1):
    """C = alpha * A @ B + beta * C, distributed (ref: summa.hpp:6-44).

    impl: 'shard_map' (all_gather K panels; num_chunks > 1 pipelines the
    gathers against partial gemms — the reference's chunked-Ibcast overlap
    knob, summa.hpp:195-215), 'ring' (Cannon rotation: nearest-neighbor
    single-hop ppermutes overlapped with per-step gemms; square slices
    only), or 'gspmd' (let the partitioner choose).

    throttle serializes the two operand gathers (shard_map impl only) —
    the reference's COLLECTIVE_CONCURRENCY_SOLO/LAYER compile flag
    (summa.hpp:179-192) as a runtime knob.

    collect_chunks > 1 pipelines the depth psum of the partial C in row
    slabs against the MXU — the reference's chunked MPI_Iallreduce collect
    (summa.hpp:238-249); both engines support it (no-op when c == 1).

    alpha/beta are applied as a fused elementwise epilogue on the already
    block-aligned output (the reference's save/restore AXPY, summa.hpp:27-35).
    """
    _record_gemm_cost(grid, a, b, collect_chunks=collect_chunks)
    if impl == "gspmd":
        out = _pdot(a, b).astype(a.dtype)
        out = grid.constrain(out, grid.slice_spec)
    else:
        _check_divisible(grid, a, b)
        if impl == "ring":
            kern = _make_ring_kernel(grid.ax_z, grid.ax_y, grid.ax_x, grid.d,
                                     collect_chunks)
        elif impl == "shard_map":
            kern = _make_summa_kernel(grid.ax_z, grid.ax_y, grid.ax_x,
                                      num_chunks, throttle, collect_chunks)
        else:
            raise ValueError(f"unknown summa impl {impl!r}")
        f = jax.shard_map(
            kern,
            mesh=grid.mesh,
            in_specs=(grid.slice_spec, grid.slice_spec),
            out_specs=grid.slice_spec,
        )
        out = f(a, b)
    if alpha != 1.0:
        out = alpha * out
    if c is not None and beta != 0.0:
        out = out + beta * c
    return out


def transpose(grid: Grid, a, impl="shard_map"):
    """Distributed transpose: every device swaps blocks with its grid-
    transposed partner, then transposes locally (ref: util::transpose,
    util.hpp:232-247 — pairwise MPI_Sendrecv_replace). Here the pairwise
    exchange is one lax.ppermute over the joint (row, col) axis pair."""
    tracing.record(
        "summa.transpose",
        comm_bytes=tracing.ppermute_bytes(
            a.size * a.dtype.itemsize / max(grid.d1 * grid.d2, 1)
        ),
        msgs=1,
    )
    if impl == "gspmd":
        return grid.constrain(a.T, grid.slice_spec)
    d = grid.d
    perm = [(y * d + x, x * d + y) for y in range(d) for x in range(d)]

    def kern(blk):
        blk = lax.ppermute(blk, (grid.ax_y, grid.ax_x), perm)
        return blk.T

    f = jax.shard_map(
        kern, mesh=grid.mesh, in_specs=grid.slice_spec,
        out_specs=grid.slice_spec,
    )
    return f(a)


def trmm(grid: Grid, a, b, *, side="L", uplo="U", trans_a=False, alpha=1.0,
         impl="shard_map", num_chunks: int = 1, throttle: bool = False,
         collect_chunks: int = 1, a_window=None, b_window=None):
    """Distributed triangular multiply (ref: summa.hpp:46-83). Triangular
    structure is a global mask fused into the operand (see matrix.py); the
    multiply itself is the gemm engine.

    Under the gspmd impl a transposed operand is contracted on axis 0
    directly (the MXU consumes either layout) instead of materializing the
    transpose — the relayout only exists in the shard_map schedule, where it
    IS the distributed block exchange.

    On a single-device grid the call is one local trmm: route to the
    triangle-aware kernel layer (half the MXU flops on TPU — the dtrmm
    saving of the reference's MKL local kernels, interface.hpp:54-75).

    a_window/b_window=(r0, c0, h, w): operate on windows of larger arrays.
    The single-device tri path folds offsets into kernel index maps
    (zero-copy — how cholinv reads its workspace); distributed paths
    slice explicitly (the slice is the reference's serialize step)."""
    if grid.num_devices == 1:
        from capital_tpu.ops import blas

        aw, bw = _win_shape(a, a_window), _win_shape(b, b_window)
        _record_gemm_cost(grid, aw, bw) if side == "L" else \
            _record_gemm_cost(grid, bw, aw)
        return blas.trmm(a, b, side=side, uplo=uplo, trans_a=trans_a,
                         alpha=alpha, platform=grid.platform,
                         a_window=a_window, b_window=b_window)
    a = _slice_window(a, a_window)
    b = _slice_window(b, b_window)
    t = apply_structure(a, Structure.UPPERTRI if uplo == "U" else Structure.LOWERTRI)
    if trans_a and impl == "gspmd" and side == "L":
        _record_gemm_cost(grid, t, b)
        from capital_tpu.ops.precision import dot_general as _pdg
        out = _pdg(t, b, (((0,), (0,)), ((), ()))).astype(b.dtype)
        out = grid.constrain(out, grid.slice_spec)
        if alpha != 1.0:
            out = alpha * out
        return out
    if trans_a:
        t = transpose(grid, t, impl=impl)
    if side == "L":
        out = gemm(grid, t, b, alpha=alpha, impl=impl, num_chunks=num_chunks,
                   throttle=throttle, collect_chunks=collect_chunks)
    else:
        out = gemm(grid, b, t, alpha=alpha, impl=impl, num_chunks=num_chunks,
                   throttle=throttle, collect_chunks=collect_chunks)
    return out


def _syrk_gspmd(grid: Grid, a, b, c, alpha, beta):
    _record_gemm_cost(grid, a, b)
    from capital_tpu.ops.precision import dot_general as _pdg

    out = _pdg(a, b, (((0,), (0,)), ((), ()))).astype(a.dtype)
    out = grid.constrain(out, grid.slice_spec)
    if alpha != 1.0:
        out = alpha * out
    if c is not None and beta != 0.0:
        out = out + beta * c
    return out


def syrk(grid: Grid, a, *, c=None, alpha=1.0, beta=0.0, impl="shard_map",
         num_chunks: int = 1, throttle: bool = False,
         collect_chunks: int = 1, a_window=None):
    """C = alpha * A^T A + beta * C, distributed (ref: summa.hpp:85-161).

    shard_map impl: grid-transpose + gemm — the reference does exactly this
    (A times A-grid-transposed, summa.hpp:110-161) because block-cyclic
    layout breaks local symmetry; the same argument holds for mesh sharding.
    gspmd impl: contract axis 0 directly, no transpose relayout.

    On a single-device grid the call is one local syrk: route to the
    triangle-aware kernel layer (upper tiles only — half the MXU flops,
    the dsyrk saving of the reference's MKL local kernels,
    interface.hpp:77-97). This is the dominant-flop call of cholinv's
    Schur updates (ref: cholinv.hpp:131-134)."""
    if grid.num_devices == 1:
        from capital_tpu.ops import blas

        aw = _win_shape(a, a_window)
        _record_gemm_cost(grid, aw, aw)
        return blas.syrk(a, c=c, alpha=alpha, beta=beta,
                         platform=grid.platform, a_window=a_window)
    a = _slice_window(a, a_window)
    if impl == "gspmd":
        return _syrk_gspmd(grid, a, a, c, alpha, beta)
    at = transpose(grid, a, impl=impl)
    return gemm(grid, at, a, c=c, alpha=alpha, beta=beta, impl=impl,
                num_chunks=num_chunks, throttle=throttle,
                collect_chunks=collect_chunks)


def syrk2(grid: Grid, a, b, *, c=None, alpha=1.0, beta=0.0,
          impl="shard_map", num_chunks: int = 1, throttle: bool = False,
          collect_chunks: int = 1):
    """Two-matrix SYRK: C = alpha * A^T B + beta * C (ref: the 2-matrix syrk
    overload, summa.hpp:85-108)."""
    if impl == "gspmd":
        return _syrk_gspmd(grid, a, b, c, alpha, beta)
    at = transpose(grid, a, impl=impl)
    return gemm(grid, at, b, c=c, alpha=alpha, beta=beta, impl=impl,
                num_chunks=num_chunks, throttle=throttle,
                collect_chunks=collect_chunks)
