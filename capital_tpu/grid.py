"""Device grids: the TPU-native equivalent of the reference's MPI process grids.

The reference builds c x d x d ("square", ref: src/util/topology.h:67-143) and
d x c x c ("rect", ref: src/util/topology.h:16-65) communicator grids by
repeatedly splitting MPI_COMM_WORLD; every collective then runs on a
sub-communicator (row / column / depth / slice).

Here the whole job is one SPMD program over a single `jax.sharding.Mesh` with
named axes ('z', 'y', 'x'):

  z — depth / replication axis (the "c" of 2.5D algorithms; maps the
      reference's `depth` communicator),
  y — grid rows (maps `column` comm: ranks varying in the row coordinate),
  x — grid cols (maps `row` comm).

Sub-communicators become axis names passed to collectives (`lax.psum(v, 'z')`
== MPI_Allreduce on the depth comm); the slice comm is the axis pair
('y', 'x'); world is ('z', 'y', 'x'). Communicator construction cost
disappears: the mesh is built once and reused (the reference also builds its
topology once per run — topology.h destructors at :53-60,133-138).

The reference's three `layout` variants (topology.h:80-123) are rank-order
permutations for network locality; on TPU the analogous control is the
device order used to build the mesh, exposed here as `layout=`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Canonical axis names, outermost-first.
AXIS_Z = "z"  # depth / replication ("c")
AXIS_Y = "y"  # grid row coordinate
AXIS_X = "x"  # grid col coordinate
ALL_AXES = (AXIS_Z, AXIS_Y, AXIS_X)


def _device_table(devices: Sequence[Any] | None) -> list:
    if devices is None:
        devices = jax.devices()
    return list(devices)


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


@dataclass(frozen=True)
class Grid:
    """A 3D device grid of shape (c, d1, d2) with axes ('z','y','x').

    square grids have d1 == d2 == d (ref: topo::square, topology.h:67-143);
    rect grids have d1 = P/(c*c) >= d2 = c for tall-skinny operands
    (ref: topo::rect, topology.h:16-65).

    `roles` maps the algorithmic roles (depth, row, col) onto mesh axis
    names. The default is the identity; `view()` returns a Grid over the
    SAME mesh with axes re-cast in different roles — the TPU-native
    equivalent of the reference's nested topologies (cacqr builds a square
    topo::square on the rect grid's cube sub-communicator,
    ref: cacqr.hpp:232-234; here no communicator surgery is needed, the
    mesh axes just play different parts). A role of None means "no axis":
    that dimension has size 1 and arrays are replicated over the unmentioned
    mesh axes.
    """

    mesh: Mesh
    roles: tuple = (AXIS_Z, AXIS_Y, AXIS_X)  # (depth, row, col) axis names

    # ---- role indirection ----------------------------------------------

    @property
    def ax_z(self) -> str | None:
        return self.roles[0]

    @property
    def ax_y(self) -> str | None:
        return self.roles[1]

    @property
    def ax_x(self) -> str | None:
        return self.roles[2]

    def view(self, z=None, y=AXIS_Y, x=AXIS_X) -> "Grid":
        """Re-cast mesh axes into new (depth, row, col) roles."""
        return Grid(mesh=self.mesh, roles=(z, y, x))

    # ---- constructors -------------------------------------------------

    @classmethod
    def square(
        cls,
        c: int = 1,
        d: int | None = None,
        devices: Sequence[Any] | None = None,
        layout: int = 0,
    ) -> "Grid":
        """c-deep d x d grid. P = c*d*d devices.

        Mirrors topo::square(comm, c, layout, num_chunks) (topology.h:67).
        `layout` permutes device order (0: natural; 1: z-innermost — the
        reference's front-face-major variant, topology.h:96-103).
        """
        devs = _device_table(devices)
        p = len(devs)
        if d is None:
            d = math.isqrt(p // c)
        if c * d * d != p:
            raise ValueError(f"square grid needs c*d*d == P: c={c}, d={d}, P={p}")
        return cls._build(devs, (c, d, d), layout)

    @classmethod
    def rect(
        cls,
        c: int = 1,
        devices: Sequence[Any] | None = None,
        layout: int = 0,
    ) -> "Grid":
        """Tunable d x c x c grid with long axis d = P/c^2 on 'y'.

        Mirrors topo::rect (topology.h:16-65): interpolates 1D (c=1) -> 3D
        (c=d) parallelism for tall-skinny operands; the QR driver sweeps c
        (ref: bench/qr/cacqr.cpp:17-18,31).
        """
        devs = _device_table(devices)
        p = len(devs)
        if c * c > p or p % (c * c) != 0:
            raise ValueError(f"rect grid needs c^2 | P: c={c}, P={p}")
        d = p // (c * c)
        return cls._build(devs, (c, d, c), layout)

    @staticmethod
    def _hybrid_axes(c: int, d: int, n_hosts: int):
        """(per_host_shape, dcn_shape) for a c x d x d grid over n_hosts.

        Exactly one mesh axis is split across DCN; preference order
        'y' then 'z': splitting rows keeps the column ('x') and depth
        ('z') collectives — summa's gathers and depth psums — entirely on
        intra-host ICI, so only row-axis reductions cross DCN (the layout
        the Gram two-stage tree is shaped for). Raises when no axis is
        divisible by n_hosts instead of silently building a wrong mesh."""
        if d % n_hosts == 0:
            return (c, d // n_hosts, d), (1, n_hosts, 1)
        if c % n_hosts == 0:
            return (c // n_hosts, d, d), (n_hosts, 1, 1)
        raise ValueError(
            f"hybrid grid cannot split c={c} x d={d} x d={d} over "
            f"{n_hosts} hosts: none of the axes is divisible by the host "
            f"count; choose c/d so that n_hosts | d or n_hosts | c")

    @classmethod
    def hybrid(cls, c: int = 1, d: int | None = None,
               devices: Sequence[Any] | None = None) -> "Grid":
        """Multi-host grid: the slice's row axis spans hosts (DCN), columns
        and depth stay intra-host (ICI), via mesh_utils'
        create_hybrid_device_mesh. Collectives along 'x'/'z' then ride ICI
        rings and only the row-axis reductions cross DCN — the layout the
        Gram two-stage tree (gram_policy='two_stage') is shaped for.

        Single-process fallback: behaves like square() when only one host
        is visible."""
        import jax.experimental.mesh_utils as mesh_utils

        devs = _device_table(devices)
        p = len(devs)
        if d is None:
            d = math.isqrt(p // c)
        if c * d * d != p:
            raise ValueError(f"hybrid grid needs c*d*d == P: c={c}, d={d}, P={p}")
        n_hosts = max(1, len({getattr(dev, "process_index", 0) for dev in devs}))
        if n_hosts == 1:
            return cls.square(c=c, d=d, devices=devs)
        per_host, dcn = cls._hybrid_axes(c, d, n_hosts)
        arr = mesh_utils.create_hybrid_device_mesh(
            per_host, dcn, devices=devs, allow_split_physical_axes=True)
        return cls(mesh=Mesh(arr, ALL_AXES))

    @classmethod
    def _build(cls, devs: list, shape: tuple[int, int, int], layout: int) -> "Grid":
        arr = np.asarray(devs)
        c, d1, d2 = shape
        if layout == 0:
            arr = arr.reshape(shape)
        elif layout == 1:
            # z-innermost: consecutive devices stack along depth.
            arr = arr.reshape(d1, d2, c).transpose(2, 0, 1)
        elif layout == 2:
            # sub-block locality: consecutive devices fill 2x2 tiles of the
            # slice before moving on, keeping neighbor blocks on physically
            # adjacent chips (the reference's 64-rank subcube blocking for
            # network locality, ref: topology.h:104-123, scaled to 2x2 here
            # since ICI tori reward nearest-neighbor placement at tile
            # granularity).
            if d1 % 2 or d2 % 2:
                raise ValueError("layout=2 needs even grid sides")
            t = arr.reshape(c, d1 // 2, d2 // 2, 2, 2)
            arr = t.transpose(0, 1, 3, 2, 4).reshape(shape)
        else:
            raise ValueError(f"unknown layout {layout}")
        return cls(mesh=Mesh(arr, ALL_AXES))

    # ---- properties ----------------------------------------------------

    @property
    def c(self) -> int:
        """Depth (replication) factor — size of the depth-role axis."""
        return self.mesh.shape[self.ax_z] if self.ax_z else 1

    @property
    def d1(self) -> int:
        return self.mesh.shape[self.ax_y] if self.ax_y else 1

    @property
    def d2(self) -> int:
        return self.mesh.shape[self.ax_x] if self.ax_x else 1

    @property
    def d(self) -> int:
        """Side of the square slice; valid only when d1 == d2."""
        if self.d1 != self.d2:
            raise ValueError(f"grid is not square: {self.shape}")
        return self.d1

    @property
    def shape(self) -> tuple[int, int, int]:
        return (self.c, self.d1, self.d2)

    @property
    def num_devices(self) -> int:
        return self.c * self.d1 * self.d2

    @property
    def platform(self) -> str:
        """Hardware platform of the mesh's devices ('tpu', 'cpu', ...)."""
        return self.mesh.devices.flat[0].platform

    @property
    def is_square(self) -> bool:
        return self.d1 == self.d2

    # ---- shardings -----------------------------------------------------

    def sharding(self, spec: P) -> NamedSharding:
        return NamedSharding(self.mesh, spec)

    @property
    def block2d(self) -> NamedSharding:
        """Block layout of a matrix over the (y, x) slice, replicated over z.

        This is the reference's canonical distribution: every matrix lives
        block-cyclically on the d x d slice and identically on each depth
        layer (ref: src/matrix/matrix.hpp:7-11 + seeded generation
        structure.hpp:80-85 which makes all layers identical).
        """
        return self.sharding(P(self.ax_y, self.ax_x))

    @property
    def slice_spec(self) -> P:
        """PartitionSpec of the (row, col) slice in this grid's roles."""
        return P(self.ax_y, self.ax_x)

    @property
    def row1d(self) -> NamedSharding:
        """Rows sharded over every device (tall-skinny layout).

        TPU-native analogue of the reference's 1D / rect-grid distribution
        for m >> n operands (ref: cacqr.hpp:5-29, topology.h:16-65)."""
        return self.sharding(P(ALL_AXES, None))

    @property
    def replicated(self) -> NamedSharding:
        return self.sharding(P(None, None))

    def constrain(self, x: jax.Array, spec: P) -> jax.Array:
        """with_sharding_constraint, degrading non-divisible dims to
        replicated: a (n, 1) RHS on a 2-wide x axis cannot be sharded
        P('y','x') — XLA requires dim % axis == 0 — and the correct
        semantic for a too-narrow dim is replication along that axis
        (the operand still shards along its divisible dims)."""
        sizes = dict(self.mesh.shape)
        ent = []
        for i, s in enumerate(spec):
            if s is not None and i < x.ndim:
                names = s if isinstance(s, tuple) else (s,)
                total = 1
                for nm in names:
                    total *= sizes.get(nm, 1)
                if x.shape[i] % total:
                    s = None
            ent.append(s)
        return jax.lax.with_sharding_constraint(x, self.sharding(P(*ent)))
