"""Autotuner: config-space sweeps scored by measured time + analytic costs.

Re-design of the reference's critter-driven tuning harness
(ref: autotune/cholesky/cholinv/tune.cpp:154-268, autotune/qr/cacqr/
tune.cpp:84-253, report tables in autotune/util.h:4-127).
"""

from capital_tpu.autotune.tune import (
    Candidate,
    sweep_cholinv,
    sweep_cacqr,
    write_tables,
)

__all__ = ["Candidate", "sweep_cholinv", "sweep_cacqr", "write_tables"]
