"""Distributed LU factorization with partial pivoting (blocked right-looking,
communication-avoiding panel schedule).

The reference has NO general (non-SPD) direct factorization: its inverse
family is a Newton iteration that does not compile (ref: src/alg/inverse/
newton/newton.h:16-18) and a half-implemented triangular inverse (ref:
src/alg/inverse/rectri/rectri.hpp:61-100), and its TRSM is a stub (ref:
src/alg/trsm/diaginvert/diaginvert.hpp:9). This module completes the dense
direct-solver family the library's own README positions it in ("matrix
factorization library", ref: README.md:1-2): P A = L U with partial
pivoting, the one factorization that handles general square systems.

Schedule — the same communication shape as cholinv (ref: the recursive
elimination of src/alg/cholesky/cholinv/cholinv.hpp:87-165), specialized to
panels because pivoting serializes the panel order:

    for each nb-wide panel k (trace-time unrolled, like cholinv's recursion):
      1. PANEL:  factor W[off:, off:off+nb] with partial pivoting. The tall
         panel is REPLICATED (one all-gather) and every chip factors it
         redundantly — the cholinv REPLICATED base-case policy (ref:
         policy.h:160-224) applied to the panel. This is the TPU answer to
         CALU's tournament pivoting: tournament pivoting exists to avoid
         O(nb) small messages on the panel's critical path; replicating the
         skinny panel removes those messages entirely (one gather, zero
         per-pivot traffic) while keeping the EXACT partial-pivoting
         ordering (tournament pivoting only approximates it).
      2. SWAP:   apply the panel's composed row permutation to the trailing
         columns and the L-history columns (a gather of the affected rows —
         the laswp of LAPACK's getrf, one collective-free resharded take).
      3. U-ROW:  U[k, k+nb:] = L_kk^{-1} W[k, k+nb:] — nb x nb replicated
         trtri + one row-panel multiply (the TRSM step of cholinv,
         ref: cholinv.hpp:116-123, with the inverse-multiply trick).
      4. SCHUR:  W[mid:, mid:] -= L[mid:, k] @ U[k, mid:] — one summa gemm,
         the dominant-flop rank-nb update (ref: the SYRK Schur update,
         cholinv.hpp:131-134, unsymmetric here).

    L, U live IN the workspace (unit diagonal of L implicit), exactly like
    cholinv's in-place R (the reference's in-place overwrite discipline,
    cholinv.hpp:87-165): each panel's factors overwrite the A entries they
    eliminated, so peak memory is one n^2 buffer plus the panel band.

All collectives ride the summa engine; the permutation gathers are
resharding takes XLA lowers to ICI all-to-alls on a mesh. jit-traceable,
grid-agnostic (1 device to c x d x d meshes).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from capital_tpu import tracing
from capital_tpu.grid import Grid
from capital_tpu.matrix import DistMatrix
from capital_tpu.ops import lapack
from capital_tpu.parallel import summa


@dataclass(frozen=True)
class Config:
    """nb: panel width. Large panels amortize the replicated-panel
    factorization and the permutation gathers (each touches the full
    trailing width once per panel); small panels shrink the redundant
    replicated flops m*nb^2. The single-chip sweep (bench/lu.py --sweep)
    puts the knee at 1024-2048 for n >= 8192.

    summa_impl / summa_chunks / summa_throttle: the Schur-update engine
    knobs, same axis set as cholinv.Config."""

    nb: int = 1024
    summa_impl: str = "shard_map"
    summa_chunks: int = 1
    summa_throttle: bool = False
    summa_collect_chunks: int = 1

    def panel(self, grid: Grid, n: int) -> int:
        """Largest panel <= nb dividing n with d | nb and d*c | nb (the
        Schur gemm contracts over the panel width)."""
        nb = min(self.nb, n)
        step = grid.d * grid.c
        while nb > step and (n % nb or nb % step):
            nb -= step if nb % step == 0 else nb % step
        if n % nb:
            nb = n
        return nb


def _panel_lu_jax(panel, ib: int | None = None, platform: str | None = None):
    """Recursive blocked partial-pivoting LU (LAPACK xGETRF2's shape) of a
    replicated (m, nb) panel in pure JAX — no LuDecompositionBlock custom
    call. XLA's getrf custom call allocates scoped VMEM proportional to
    the panel HEIGHT (f32[m, 128] work buffers) and overflows the v5e's
    16-MB scoped limit at m >= ~14k, killing n>=16384 factorizations
    outright; this routine has no height-scaled VMEM footprint.

    Schedule: recursive width halving unrolled at trace time — factor the
    left half, pivot-gather + unit-lower solve + MXU gemm on the right
    half, factor the right half, back-apply its pivots to the left. The
    rank-1 pivot/scale elimination runs only at ib-wide leaves (default
    64), each leaf ONE Pallas kernel with the strip resident in VMEM
    (ops/pallas_getrf.py) on TPU, or the masked fori_loop below on
    CPU/f64. EXACT partial pivoting — same ordering as LAPACK up to
    |.|-ties.

    Returns (lu (m, nb) row-permuted, perm (m,), pivots (nb,)) with
    lax.linalg.lu's return convention."""
    import os

    m, nb = panel.shape
    if ib is None:
        # on-chip sweep at n=16384 nb=2048: ib=64 374 ms, ib=32 394 ms,
        # ib=16 (jax leaf era) slower still — the Pallas leaf's per-step
        # cost is VMEM passes over (ib, mm), but fewer leaves means less
        # recursion glue; 64 is the knee. (64, 32768) f32 = 8 MB VMEM,
        # within budget at the n=32768 donate frontier.
        ib = int(os.environ.get("CAPITAL_LU_IB", "64"))
    acc = jnp.promote_types(panel.dtype, jnp.float32)
    w = panel.astype(acc)
    pivots = jnp.arange(nb, dtype=jnp.int32)
    # The rank-1 leaf as ONE Pallas kernel (strip resident in VMEM): each
    # fori_loop elimination step otherwise costs ~10 XLA kernel launches
    # (~45 us measured) — n sequential steps made the panel the dominant
    # cost of the whole factorization. f32-on-TPU only; the pure-JAX leaf
    # remains the CPU/f64 path.
    leaf_mode = os.environ.get("CAPITAL_LU_LEAF", "auto")
    use_pallas = (leaf_mode != "jax" and acc == jnp.float32
                  and platform in ("tpu", "axon"))

    # The panel is the pivoting-critical path: multipliers computed from
    # its trailing updates steer every later pivot decision, and errors
    # there amplify through the triangular structure. Its gemms stay
    # f32-faithful REGARDLESS of the ambient --precision knob (measured
    # n=16384: letting the panel follow 'high' costs 100x residual,
    # 8.6e-5 -> 8.0e-3, while the panel's m*nb^2 flops are ~1/16 of the
    # total — the Schur gemms keep the ambient precision and the speed).
    pname = "highest"

    def leaf(w, pivots, j0, jw):
        """Rank-1 elimination of columns [j0, j0+jw) over rows [j0, m).
        Returns (w, pivots, pj) with pj a local row perm of [j0, m)."""
        mm = m - j0
        if use_pallas:
            from capital_tpu.ops.pallas_getrf import getrf_leaf_pallas

            sp = lax.slice(w, (j0, j0), (m, j0 + jw))
            sp_out, pj, piv = getrf_leaf_pallas(sp)
            w = lax.dynamic_update_slice(w, sp_out, (j0, j0))
            pivots = lax.dynamic_update_slice(pivots, piv + j0, (j0,))
            return w, pivots, pj
        sp = lax.slice(w, (j0, j0), (m, j0 + jw))
        rows = jnp.arange(mm, dtype=jnp.int32)
        cols = jnp.arange(jw, dtype=jnp.int32)

        def step(c, carry):
            sp, pj, piv = carry
            colv = lax.dynamic_slice(sp, (0, c), (mm, 1))[:, 0]
            cand = jnp.where(rows >= c, jnp.abs(colv), -jnp.inf)
            p_ = jnp.argmax(cand).astype(jnp.int32)
            # two-row swap via dynamic slices (O(jw) traffic; a full
            # (mm, jw) permutation gather per step would dominate)
            row_g = lax.dynamic_slice(sp, (c, 0), (1, jw))
            row_p = lax.dynamic_slice(sp, (p_, 0), (1, jw))
            sp = lax.dynamic_update_slice(sp, row_p, (c, 0))
            sp = lax.dynamic_update_slice(sp, row_g, (p_, 0))
            pj_g = lax.dynamic_slice(pj, (c,), (1,))
            pj_p = lax.dynamic_slice(pj, (p_,), (1,))
            pj = lax.dynamic_update_slice(pj, pj_p, (c,))
            pj = lax.dynamic_update_slice(pj, pj_g, (p_,))
            piv = lax.dynamic_update_slice(piv, (p_ + j0)[None], (j0 + c,))
            colv = lax.dynamic_slice(sp, (0, c), (mm, 1))[:, 0]
            pivval = jnp.take(colv, c)
            safe = jnp.where(pivval == 0, jnp.ones((), acc), pivval)
            lcol = jnp.where(rows > c, colv / safe, colv)
            sp = lax.dynamic_update_slice(sp, lcol[:, None], (0, c))
            urow = lax.dynamic_slice(sp, (c, 0), (1, jw))[0]
            urow = jnp.where(cols > c, urow, jnp.zeros((), acc))
            lmask = jnp.where(rows > c, lcol, jnp.zeros((), acc))
            return (sp - lmask[:, None] * urow[None, :], pj, piv)

        sp, pj, pivots = lax.fori_loop(
            0, jw, step, (sp, jnp.arange(mm, dtype=jnp.int32), pivots))
        w = lax.dynamic_update_slice(w, sp, (j0, j0))
        return w, pivots, pj

    # Leaf width by scoped-VMEM budget: the Pallas kernel's stack holds
    # ~3 live (lw, mm_pad) f32 buffers, against a 16-MB scoped limit
    # (budget 13 MB with margin; a (64, 24576) unrolled variant measured
    # 49.7M and failed to compile). Wider leaves where the strip is
    # short (fewer leaves, less recursion glue — also what keeps the
    # n>=24576 trace within the compile service's appetite); narrower
    # where it is tall. CAPITAL_LU_WIDE_LEAF=0 caps at CAPITAL_LU_IB.
    max_lw = (128 if os.environ.get("CAPITAL_LU_WIDE_LEAF", "1") == "1"
              else ib)

    def leaf_width(j0: int) -> int:
        if not use_pallas:
            return ib
        mm_pad = (m - j0) + (-(m - j0)) % 4096
        for lw in (128, 64, 32):
            if lw <= max_lw and 3 * lw * mm_pad * 4 <= 13 * 2**20:
                return lw
        return 16

    def rec(w, pivots, j0, jw):
        lw = leaf_width(j0)
        if jw <= lw:
            return leaf(w, pivots, j0, jw)
        half = min(((jw // 2) + lw - 1) // lw * lw, jw - 1)
        w, pivots, pj1 = rec(w, pivots, j0, half)
        # right half: laswp by the left pivots, unit-lower solve, Schur
        right = lax.slice(w, (j0, j0 + half), (m, j0 + jw))
        right = jnp.take(right, pj1, axis=0)
        with jax.default_matmul_precision(pname):
            l11 = lax.slice(w, (j0, j0), (j0 + half, j0 + half))
            u12 = lax.linalg.triangular_solve(
                l11, lax.slice(right, (0, 0), (half, jw - half)),
                left_side=True, lower=True, unit_diagonal=True)
            l21 = lax.slice(w, (j0 + half, j0), (m, j0 + half))
            low = lax.slice(right, (half, 0), (m - j0, jw - half)) \
                - jnp.matmul(l21, u12, preferred_element_type=acc)
        w = lax.dynamic_update_slice(w, u12, (j0, j0 + half))
        w = lax.dynamic_update_slice(w, low, (j0 + half, j0 + half))
        w, pivots, pj2 = rec(w, pivots, j0 + half, jw - half)
        # back-apply the right pivots to the left L columns
        left = lax.slice(w, (j0 + half, j0), (m, j0 + half))
        w = lax.dynamic_update_slice(
            w, jnp.take(left, pj2, axis=0), (j0 + half, j0))
        pj2f = jnp.concatenate(
            [jnp.arange(half, dtype=jnp.int32), pj2 + half])
        return w, pivots, jnp.take(pj1, pj2f)

    w, pivots, perm = rec(w, pivots, 0, nb)
    return w.astype(panel.dtype), perm, pivots


def _panel_lu(grid: Grid, panel):
    """Replicated tall-skinny panel LU with partial pivoting: one
    all-gather (the sharding constraint), then every chip runs XLA's
    blocked getrf identically — the REPLICATED placement policy of
    cholinv's base case (ref: policy.h:160-224) on a panel operand.
    Returns (lu, perm, pivots); lu rows are already permuted.

    The getrf's INTERNAL dots must follow the framework precision policy
    (ops/precision.py): on TPU, XLA's blocked lu would otherwise run its
    trailing updates at 1-pass bf16 (measured 4e-2-class residuals on a
    v5e at DEFAULT vs 5e-6 at f32-faithful)."""
    import os

    rep = grid.constrain(panel, P(None, None))
    from capital_tpu.ops.precision import prec

    # On TPU every panel routes to the recursive blocked getrf with the
    # Pallas leaf kernel: XLA's LuDecompositionBlock custom call (a) dies
    # at m >= ~14k on a 16-MB v5e (scoped VMEM scales with panel height)
    # and (b) is slower even where it runs (n=16384 nb=2048: 394 ms
    # all-recursive vs 420 ms with custom-call panels for m <= 8192).
    # CAPITAL_LU_PANEL=xla restores the custom call; =jax forces the
    # recursive panel everywhere (including CPU).
    mode = os.environ.get("CAPITAL_LU_PANEL", "auto")
    if mode == "jax" or (mode == "auto"
                         and grid.platform in ("tpu", "axon")):
        x = rep.astype(jnp.float32) if rep.dtype == jnp.bfloat16 else rep
        lu_pan, perm, pivots = _panel_lu_jax(x, platform=grid.platform)
        return lu_pan.astype(rep.dtype), perm, pivots

    if rep.dtype == jnp.bfloat16:
        lu_pan, pivots, perm = lax.linalg.lu(rep.astype(jnp.float32))
        lu_pan = lu_pan.astype(jnp.bfloat16)
    else:
        p = prec()
        p = p.name.lower() if hasattr(p, "name") else str(p).lower()
        with jax.default_matmul_precision(p):
            lu_pan, pivots, perm = lax.linalg.lu(rep)
    return lu_pan, perm, pivots


def factor(grid: Grid, a, cfg: Config = Config()):
    """P A = L U. Returns (w, perm, sign):

      w:    the workspace whose strict lower triangle is L (unit diagonal
            implicit) and upper triangle is U, sharded P('y','x');
      perm: (n,) int32 — row i of L@U is row perm[i] of A;
      sign: the permutation's sign (for det/slogdet).
    """
    if isinstance(a, DistMatrix):
        a = a.data
    w = a
    n = w.shape[0]
    nb = cfg.panel(grid, n)
    num_p = n // nb
    kw = dict(impl=cfg.summa_impl, num_chunks=cfg.summa_chunks,
              throttle=cfg.summa_throttle,
              collect_chunks=cfg.summa_collect_chunks)

    perm = jnp.arange(n, dtype=jnp.int32)
    sign = jnp.ones((), dtype=w.dtype)
    esz = w.dtype.itemsize
    p_dev = max(grid.num_devices, 1)

    # Lookahead (right-looking with split Schur, the classic getrf
    # pipelining — ref: the overlap discipline of cholinv.hpp:131-134
    # generalized to the pivoted panel chain): panel k+1's columns are
    # Schur-updated by a SEPARATE narrow gemm and factored BEFORE the
    # remainder's slab updates run. Without it, panel k+1 reads the
    # workspace after the whole slab dynamic_update_slice chain — a
    # false dependency that serializes the replicated panel (all-gather
    # + VPU elimination) behind every Schur slab; splitting it lets
    # XLA's scheduler hoist the panel's collective and elimination over
    # the independent remainder gemms (the win site is multi-chip
    # meshes, where the panel is replicated compute and the remainder
    # is sharded MXU work).
    import os as _os

    lookahead = _os.environ.get("CAPITAL_LU_LOOKAHEAD", "0") == "1"
    factored = None  # (lu_pan, pperm, pivots) produced by lookahead

    for k in range(num_p):
        off, mid = k * nb, (k + 1) * nb
        m_k = n - off
        n2 = n - mid

        # 1. replicated panel factorization (phase names follow the
        # cholinv -DALGORITHMIC_SYMBOLS convention, ref: cholinv.hpp:94-136)
        with tracing.phase("LU::panel"):
            tracing.record(
                "lu.panel",
                flops=m_k * nb * nb,  # replicated on every chip
                comm_bytes=tracing.all_gather_bytes(
                    m_k * nb * esz / p_dev, p_dev),
                msgs=1,
            )
            if factored is None:
                panel = lax.slice(w, (off, off), (n, mid))
                lu_pan, pperm, pivots = _panel_lu(grid, panel)
            else:
                lu_pan, pperm, pivots = factored
                factored = None
            w = lax.dynamic_update_slice(
                w, grid.constrain(lu_pan, grid.slice_spec), (off, off))

        # permutation bookkeeping: compose into the global perm and track
        # the sign from the pivot sequence (pivots[i] != i <=> one swap)
        seg = lax.dynamic_slice_in_dim(perm, off, m_k)
        perm = lax.dynamic_update_slice_in_dim(
            perm, jnp.take(seg, pperm, axis=0), off, 0)
        swaps = jnp.sum(pivots != jnp.arange(pivots.shape[0]))
        sign = sign * jnp.where(swaps % 2 == 0, 1.0, -1.0).astype(sign.dtype)

        # 2. apply the panel permutation to the L-history and trailing
        # columns (LAPACK's laswp; takes on the row-sharded workspace,
        # CHUNKED in width — a full-width permuted copy is an extra
        # m_k x (n-nb) buffer that pushes the n=32768 donate frontier
        # out of 16-GB HBM)
        with tracing.phase("LU::swap"):
            tracing.record(
                "lu.swap",
                comm_bytes=2.0 * m_k * (n - nb) * esz / p_dev, msgs=1)
            cw = 4096
            for j0_, j1_ in (((0, off) if off > 0 else (0, 0)),
                             ((mid, n) if n2 > 0 else (0, 0))):
                j = j0_
                while j < j1_:
                    jw = min(cw, j1_ - j)
                    blk = lax.slice(w, (off, j), (n, j + jw))
                    blk = grid.constrain(jnp.take(blk, pperm, axis=0),
                                         grid.slice_spec)
                    w = lax.dynamic_update_slice(w, blk, (off, j))
                    j += jw

        if n2 == 0:
            break

        # 3. U row panel: U_k = L_kk^{-1} W[off:mid, mid:] (the TRSM step,
        # ref: cholinv.hpp:116-123 — inverse-multiply form). Pinned
        # f32-faithful like the panel: the U row feeds every remaining
        # Schur update, so its error compounds across panels.
        with tracing.phase("LU::trsm"), \
                jax.default_matmul_precision("highest"):
            l_kk = jnp.tril(lu_pan[:nb], -1) + jnp.eye(nb, dtype=w.dtype)
            l_inv = lapack.trtri(l_kk, lower=True)
            l_inv = grid.constrain(l_inv, grid.slice_spec)
            u_row = summa.gemm(
                grid, l_inv, lax.slice(w, (off, mid), (mid, n)), **kw)
            w = lax.dynamic_update_slice(w, u_row, (off, mid))

        # 4. Schur update: rank-nb summa gemms (the dominant flops,
        # ref: the Schur SYRK of cholinv.hpp:131-134, unsymmetric here),
        # ROW-SLABBED so the (m2, n2) product is never fully live next to
        # the workspace — monolithic, the top panel's 3.8-GB product +
        # its A22 slice push the n=32768 donate run out of 16-GB HBM.
        # Slabs are whole multiples of nb (keeps summa divisibility).
        with tracing.phase("LU::schur"):
            m2 = n - mid
            la_step = lookahead and (k + 1) < num_p
            if la_step:
                # Lookahead: Schur-update ONLY panel k+1's nb columns
                # (one narrow gemm), factor them immediately, then run
                # the remainder slabs — the factored panel is written
                # into w at the top of iteration k+1, so the stale
                # next-panel columns in w are never read.
                lb_full = lax.slice(w, (mid, off), (n, mid))
                u_np = lax.slice(u_row, (0, 0), (nb, nb))
                a_np = summa.gemm(
                    grid, lb_full, u_np,
                    c=lax.slice(w, (mid, mid), (n, mid + nb)),
                    alpha=-1.0, beta=1.0, **kw)
                factored = _panel_lu(grid, a_np)
                col0, n2r = mid + nb, n2 - nb
                u_rem = lax.slice(u_row, (0, nb), (nb, n2))
            else:
                col0, n2r = mid, n2
                u_rem = u_row
            target = int(_os.environ.get("CAPITAL_LU_SCHUR_MB",
                                         "512")) * 2**20
            rc = m2
            if m2 * n2r * esz > target:
                rc = max(1, target // max(n2r * esz, 1)) // nb * nb
                rc = max(nb, rc)
            j = 0
            while j < m2 and n2r > 0:
                jr = min(rc, m2 - j)
                lb = lax.slice(w, (mid + j, off), (mid + j + jr, mid))
                a22 = lax.slice(w, (mid + j, col0), (mid + j + jr, n))
                s = summa.gemm(grid, lb, u_rem, c=a22, alpha=-1.0,
                               beta=1.0, **kw)
                w = lax.dynamic_update_slice(w, s, (mid + j, col0))
                j += jr
        w = grid.constrain(w, grid.slice_spec)

    return grid.constrain(w, grid.slice_spec), perm, sign


def unpack(w):
    """Dense (L, U) from the packed workspace (masked exports, same shape
    discipline as cholinv.construct_R, ref: cholinv.hpp:30-46)."""
    n = w.shape[0]
    l = jnp.tril(w, -1) + jnp.eye(n, dtype=w.dtype)
    u = jnp.triu(w)
    return l, u


def solve_factored(grid: Grid, w, perm, b, trsm_cfg=None):
    """x = U^{-1} L^{-1} P b via the diaginvert TRSM engine (block
    substitution, each panel update a summa gemm — algs/trsm.py).

    Both substitutions read the packed workspace DIRECTLY (trsm masks the
    wrong triangle itself; unit_diag supplies L's implicit ones) — no
    dense L/U materialization, so the peak live set is the workspace plus
    the RHS block, not workspace + 2 n^2 unpacked copies (which roughly
    halved the solvable n at the donate frontier)."""
    from capital_tpu.algs import trsm

    if isinstance(b, DistMatrix):
        b = b.data
    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    cfg = trsm_cfg or trsm.Config()
    pb = grid.constrain(jnp.take(b, perm, axis=0), grid.slice_spec)
    y = trsm.solve(grid, w, pb, side="L", lower=True, unit_diag=True,
                   cfg=cfg)
    x = trsm.solve(grid, w, y, side="L", lower=False, cfg=cfg)
    return x[:, 0] if vec else x


def solve(grid: Grid, a, b, cfg: Config = Config(), trsm_cfg=None):
    """General square solve A x = b by P A = L U + two triangular
    substitutions."""
    w, perm, _ = factor(grid, a, cfg)
    return solve_factored(grid, w, perm, b, trsm_cfg=trsm_cfg)


def slogdet(grid: Grid, a, cfg: Config = Config()):
    """(sign, log|det A|) from the U diagonal and the permutation sign —
    the general-matrix completion of linalg.slogdet_spd."""
    if isinstance(a, DistMatrix):
        a = a.data
    w, _, psign = factor(grid, a, cfg)
    d = jnp.diagonal(w)
    sign = psign * jnp.prod(jnp.sign(d))
    return sign, jnp.sum(jnp.log(jnp.abs(d)))
