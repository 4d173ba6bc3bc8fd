"""Distributed matrix container: sharded jax.Array + structure metadata.

Replaces the reference's matrix<Scalar,Dim,StructurePolicy,OffloadPolicy>
(ref: src/matrix/matrix.h:38-80) and its structure policies rect / uppertri /
lowertri (ref: src/matrix/structure.h:8-59).

TPU-first design decisions (deliberate departures from the reference):

  * No packed triangular storage. XLA/MXU want dense tiles; triangular
    structure is a *semantic mask* applied lazily (jnp.tril/triu fuse into
    adjacent ops for free). The reference itself keeps a dense `pad` shadow
    buffer next to every packed triangle for exactly this reason
    (ref: matrix.h:78-80, structure.hpp:140-148) — we keep only the dense
    form and drop the packed one.

  * No scratch/pad triple-buffering or swap() rotation (ref: matrix.h:55-56).
    Buffer management is XLA's job; summa's staging buffers are compiler
    temporaries.

  * No _register_/_fill_/_destroy_ lazy allocation or `simulate` dry-run
    (ref: matrix.hpp:126-168, cholinv.hpp:50-83). jit tracing plans all
    allocation statically.

  * Deterministic distribution by *global* position: the reference seeds
    drand48 with global coordinates so any rank layout regenerates the same
    matrix (ref: structure.hpp:80-85). jax.random is counter-based over
    global indices, so sharded generation under jit is layout-independent
    by construction.

Padding: global shapes are padded up to a multiple of the grid tile so every
device holds an identical-shape block (the reference pads by <=1 row/col per
rank, ref: matrix.hpp:7-11). SPD matrices are padded with an identity
diagonal block — chol(blkdiag(A, I)) = blkdiag(chol(A), I) — and tall-skinny
operands with zero rows (Gram unchanged), so algorithms run on padded shapes
and results are cropped on export.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from capital_tpu.grid import Grid, AXIS_X, AXIS_Y


class Structure(enum.Enum):
    """Semantic storage structure (ref: src/matrix/structure.h:8,34,54)."""

    RECT = "rect"
    UPPERTRI = "uppertri"
    LOWERTRI = "lowertri"


def apply_structure(x: jax.Array, structure: Structure) -> jax.Array:
    """Materialize the structure mask (the dense analogue of packed storage).

    Equivalent of util::remove_triangle (ref: src/util/util.hpp:266-318)."""
    if structure == Structure.UPPERTRI:
        return jnp.triu(x)
    if structure == Structure.LOWERTRI:
        return jnp.tril(x)
    return x


def _pad_up(n: int, tile: int) -> int:
    return -(-n // tile) * tile


@jax.tree_util.register_pytree_node_class
@dataclass
class DistMatrix:
    """A logically (m, n) matrix stored padded + sharded on a Grid.

    `data` has the padded shape; `shape` is the logical one. The structure
    tag is metadata — `masked()` materializes it.
    """

    data: jax.Array
    shape: tuple[int, int]
    structure: Structure = Structure.RECT

    # -- pytree protocol (structure/shape are static aux data) ----------
    def tree_flatten(self):
        return (self.data,), (self.shape, self.structure)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    # -- views -----------------------------------------------------------
    @property
    def padded_shape(self) -> tuple[int, int]:
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    def masked(self) -> jax.Array:
        return apply_structure(self.data, self.structure)

    def to_global(self) -> jax.Array:
        """Crop padding and apply the structure mask (export path; the
        analogue of construct_R-style dense exporters, ref: cholinv.hpp:30-46)."""
        m, n = self.shape
        return apply_structure(self.data[:m, :n], self.structure)


# ---------------------------------------------------------------------------
# Distributions (ref: matrix.h:65-68, structure.hpp:36-129)
# ---------------------------------------------------------------------------

def _gen_sharded(grid: Grid, pshape, spec: P, fn):
    """jit a generator with sharded output so huge matrices are born
    distributed (no host-side global materialization)."""
    out_sh = grid.sharding(spec)
    return jax.jit(fn, out_shardings=out_sh)()


def rand(
    grid: Grid,
    m: int,
    n: int,
    key: jax.Array,
    dtype=jnp.float32,
    structure: Structure = Structure.RECT,
    spec: P | None = None,
    row_tile: int | None = None,
    col_tile: int | None = None,
) -> DistMatrix:
    """Uniform(-0.5, 0.5) matrix, deterministic in (key, m, n) regardless of
    grid shape (ref: distribute_random, structure.hpp:106-129)."""
    spec = spec if spec is not None else P(AXIS_Y, AXIS_X)
    rt = row_tile or grid.d1
    ct = col_tile or grid.d2
    pm, pn = _pad_up(m, rt), _pad_up(n, ct)

    def gen():
        u = jax.random.uniform(key, (pm, pn), dtype=dtype, minval=-0.5, maxval=0.5)
        # zero the pad region so it is inert in gemms
        rmask = (jnp.arange(pm) < m)[:, None]
        cmask = (jnp.arange(pn) < n)[None, :]
        return u * (rmask & cmask).astype(dtype)

    return DistMatrix(_gen_sharded(grid, (pm, pn), spec, gen), (m, n), structure)


def symmetric(
    grid: Grid,
    n: int,
    key: jax.Array,
    dtype=jnp.float32,
    diag_shift: float | None = None,
    spec: P | None = None,
    align: int = 1,
) -> DistMatrix:
    """Symmetric positive-definite test matrix: (U + U^T)/2 + shift*I with
    shift defaulting to n for diagonal dominance (ref: distribute_symmetric,
    structure.hpp:69-104 — symmetric-seeded generation + optional +N
    diagonal). Pad region carries an identity diagonal so Cholesky of the
    padded matrix is well-posed."""
    spec = spec if spec is not None else P(AXIS_Y, AXIS_X)
    # align > 1 pads per-device blocks to MXU tiles (128) so base-case
    # kernels never see ragged shapes; the pad region is an inert identity
    # block (chol(blkdiag(A, I)) = blkdiag(chol(A), I))
    tile = align * (grid.d1 if grid.is_square else grid.num_devices)
    pn = _pad_up(n, tile)
    shift = float(n) if diag_shift is None else float(diag_shift)

    def gen():
        u = jax.random.uniform(key, (pn, pn), dtype=dtype, minval=-0.5, maxval=0.5)
        a = (u + u.T) * 0.5
        idx = jnp.arange(pn)
        live = (idx < n)
        mask = (live[:, None] & live[None, :]).astype(dtype)
        a = a * mask
        diag = jnp.where(live, shift, 1.0).astype(dtype)
        return a + jnp.diag(diag)

    return DistMatrix(_gen_sharded(grid, (pn, pn), spec, gen), (n, n), Structure.RECT)


def identity(grid: Grid, n: int, dtype=jnp.float32, spec: P | None = None) -> DistMatrix:
    """(ref: distribute_identity, structure.hpp:36-54)"""
    spec = spec if spec is not None else P(AXIS_Y, AXIS_X)
    pn = _pad_up(n, grid.d1 if grid.is_square else grid.num_devices)

    def gen():
        return jnp.eye(pn, dtype=dtype)

    return DistMatrix(_gen_sharded(grid, (pn, pn), spec, gen), (n, n), Structure.RECT)


def debug(grid: Grid, m: int, n: int, dtype=jnp.float32, spec: P | None = None) -> DistMatrix:
    """Entry (i, j) = i + m*j — globally addressable values for layout tests
    (ref: distribute_debug, structure.hpp:56-67)."""
    spec = spec if spec is not None else P(AXIS_Y, AXIS_X)
    rt = grid.d1
    ct = grid.d2
    pm, pn = _pad_up(m, rt), _pad_up(n, ct)

    def gen():
        i = jax.lax.broadcasted_iota(jnp.int32, (pm, pn), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (pm, pn), 1)
        v = (i + m * j).astype(dtype)
        live = ((i < m) & (j < n)).astype(dtype)
        return v * live

    return DistMatrix(_gen_sharded(grid, (pm, pn), spec, gen), (m, n), Structure.RECT)


def tall_skinny(
    grid: Grid,
    m: int,
    n: int,
    key: jax.Array,
    dtype=jnp.float32,
    col_scale: bool = True,
) -> DistMatrix:
    """Row-sharded tall-skinny operand over ALL devices (the rect-grid /
    1D layout of the reference, ref: topology.h:16-65 + cacqr.hpp:5-29).
    col_scale grades column magnitudes to make orthogonality non-trivial."""
    spec = P(("z", "y", "x"), None)
    pm = _pad_up(m, grid.num_devices)
    pn = n  # n is small; keep unpadded but require MXU-friendly n in algs

    def gen():
        u = jax.random.uniform(key, (pm, pn), dtype=dtype, minval=-0.5, maxval=0.5)
        if col_scale:
            scale = jnp.linspace(1.0, 2.0, pn, dtype=dtype)[None, :]
            u = u * scale
        rmask = (jnp.arange(pm) < m)[:, None].astype(dtype)
        return u * rmask

    return DistMatrix(_gen_sharded(grid, (pm, pn), spec, gen), (m, n), Structure.RECT)
