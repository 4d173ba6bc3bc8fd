"""Instrumentation: analytic cost model + profiler hooks (the critter analog).

The reference's performance apparatus is the external `critter` library: PMPI
interposition + annotated regions, extracting critical-path / per-process /
volumetric cost vectors (exec, comp, comm, synch) that drive the autotuner
(ref: src/util/shared.h:26-35 CRITTER macros; autotune/cholesky/cholinv/
tune.cpp:29-31,63-66,79-82; autotune/util.h:4-61 report tables).

TPU-native re-design: there is no PMPI to interpose on — collectives are XLA
ops compiled into one program. But the schedule is *fully known at trace
time* (the recursion unrolls in Python), so the same cost vectors are
computed ANALYTICALLY while tracing:

  * every summa/gram/transpose call records its MXU flops and per-link ICI
    bytes for the mesh it runs on (the volumetric + critical-path costs
    critter measures),
  * phases are bracketed like CRITTER_START/STOP via `phase(...)`
    (ref: -DALGORITHMIC_SYMBOLS regions CI::factor_diag / CI::trsm / CQR::gram,
    cholinv.hpp:94-136, cacqr.hpp:82-116), and double as jax.named_scope
    annotations so the same names appear in XLA/jax.profiler traces,
  * wall-clock measurement stays separate (bench drivers), exactly like the
    reference's uninstrumented-reference-run-then-instrumented-run protocol
    (autotune/.../tune.cpp:33-41,72-78).

Collective cost formulas (bytes a single device moves on its links) assume
bidirectional-ring ICI per mesh axis — the standard TPU model (scaling-book):

  all_gather(bytes_out on axis of size p):  (p-1)/p * bytes_out
  psum (all-reduce):                        2 * (p-1)/p * bytes
  psum_scatter / reduce_scatter:            (p-1)/p * bytes
  ppermute (transpose partner exchange):    bytes (one send + one recv)
"""

from __future__ import annotations

import contextlib
import threading
from collections import defaultdict
from dataclasses import dataclass, field

import jax


# ---------------------------------------------------------------------------
# cost vectors
# ---------------------------------------------------------------------------

@dataclass
class Costs:
    """Per-phase cost vector (the analog of critter's exec/comp/comm rows,
    ref: autotune/util.h:9-35)."""

    flops: float = 0.0          # MXU flops on one device
    comm_bytes: float = 0.0     # bytes one device moves over ICI
    msgs: int = 0               # number of collective launches (latency term)
    calls: int = 0

    def add(self, flops=0.0, comm_bytes=0.0, msgs=0):
        self.flops += flops
        self.comm_bytes += comm_bytes
        self.msgs += msgs
        self.calls += 1


class Tracer:
    """Accumulates analytic costs per phase during jit tracing.

    Usage:
        with tracing.trace() as t:
            jax.jit(step)(x)          # tracing populates t
        print(t.report())
    """

    def __init__(self):
        self.by_phase: dict[str, Costs] = defaultdict(Costs)
        self._stack: list[str] = []

    # -- phase bracketing (CRITTER_START/STOP analog) --------------------
    @contextlib.contextmanager
    def phase(self, name: str):
        self._stack.append(name)
        try:
            with jax.named_scope(name):
                yield self
        finally:
            self._stack.pop()

    @property
    def current_phase(self) -> str:
        return self._stack[-1] if self._stack else "<top>"

    def record(self, kind: str, flops=0.0, comm_bytes=0.0, msgs=0):
        self.by_phase[f"{self.current_phase}/{kind}"].add(flops, comm_bytes, msgs)
        self.by_phase["<total>"].add(flops, comm_bytes, msgs)

    # -- reporting (the cp/pp/vol table analog, autotune/util.h:4-61) ----
    def totals(self) -> Costs:
        return self.by_phase["<total>"]

    def report(self) -> str:
        rows = sorted(k for k in self.by_phase if k != "<total>")
        w = max([len(r) for r in rows] + [12])
        out = [f"{'phase':<{w}}  {'GFLOP':>10}  {'ICI MiB':>10}  {'msgs':>6}  {'calls':>6}"]
        for k in rows + ["<total>"]:
            c = self.by_phase[k]
            out.append(
                f"{k:<{w}}  {c.flops/1e9:>10.3f}  {c.comm_bytes/2**20:>10.3f}"
                f"  {c.msgs:>6d}  {c.calls:>6d}"
            )
        return "\n".join(out)

    def model_time(self, flops_per_s: float, ici_bytes_per_s: float,
                   latency_s: float = 1e-6) -> float:
        """Roofline-style time estimate: max(comp, comm) + latency * msgs —
        the cost model the autotuner scores candidate configs with (the
        critical-path cost analog)."""
        t = self.totals()
        return max(t.flops / flops_per_s, t.comm_bytes / ici_bytes_per_s) + (
            latency_s * t.msgs
        )


# ---------------------------------------------------------------------------
# active-tracer plumbing (thread-local; tracing happens on the caller thread)
# ---------------------------------------------------------------------------

_tls = threading.local()


def active() -> Tracer | None:
    return getattr(_tls, "tracer", None)


@contextlib.contextmanager
def trace():
    prev = active()
    t = Tracer()
    _tls.tracer = t
    try:
        yield t
    finally:
        _tls.tracer = prev


@contextlib.contextmanager
def phase(name: str):
    """Phase bracket that is a no-op named_scope when no tracer is active
    (the reference's CRITTER macros compile to nothing without -DCRITTER,
    ref: shared.h:26-35)."""
    t = active()
    if t is None:
        with jax.named_scope(name):
            yield None
    else:
        with t.phase(name):
            yield t


def record(kind: str, *, flops=0.0, comm_bytes=0.0, msgs=0):
    t = active()
    if t is not None:
        t.record(kind, flops=flops, comm_bytes=comm_bytes, msgs=msgs)


# ---------------------------------------------------------------------------
# collective cost formulas (bidirectional ring per mesh axis)
# ---------------------------------------------------------------------------

def all_gather_bytes(shard_bytes: float, p: int) -> float:
    return shard_bytes * (p - 1)


def psum_bytes(full_bytes: float, p: int) -> float:
    return 2.0 * full_bytes * (p - 1) / p


def reduce_scatter_bytes(full_bytes: float, p: int) -> float:
    return full_bytes * (p - 1) / p


def ppermute_bytes(shard_bytes: float) -> float:
    return 2.0 * shard_bytes  # one send + one recv


# ---------------------------------------------------------------------------
# jax.profiler integration (the hardware-measured side)
# ---------------------------------------------------------------------------

@contextlib.contextmanager
def profile(logdir: str):
    """Capture an XLA/TPU profiler trace; phase names above appear as
    named_scope annotations inside it."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
