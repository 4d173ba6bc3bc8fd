"""Autotuner sweeps on the virtual CPU mesh (the reference sweeps policy x
bcMultiplier x grid aspect under critter, autotune/*/tune.cpp)."""

import json
import os

import jax
import pytest

from capital_tpu.autotune import tune
from capital_tpu.grid import Grid
from capital_tpu import matrix


def test_sweep_cholinv_policy_axes(grid222):
    """The multi-device sweep space includes the base-policy and overlap
    axes, and every candidate runs clean."""
    a = matrix.symmetric(grid222, 128, jax.random.key(0)).data
    space = {
        "bc_mult": [0],
        "base_method": ["xla"],
        "min_bc": [64],
        "summa_impl": ["shard_map", "ring"],
        "summa_chunks": [1, 2],
        "base_policy": ["replicated", "layer"],
    }
    cands = tune.sweep_cholinv(grid222, a, space, num_iter=1)
    assert len(cands) == 8
    errs = [c.error for c in cands if c.error]
    assert not errs, errs
    assert all(c.time_s < float("inf") for c in cands)


def test_sweep_grids_has_grid_column(tmp_path, cpus):
    """Mesh-shape sweep (the rep_factor axis) tags each candidate with its
    grid; write_tables emits all four reference-style report files."""
    shapes = [("square", 1, 1), ("square", 1, 2), ("square", 2, 2)]
    space = {"bc_mult": [0], "base_method": ["xla"], "min_bc": [64],
             "summa_impl": ["shard_map"]}
    cands = tune.sweep_grids("cholinv", n=128, shapes=shapes, space=space,
                             num_iter=1, devices=cpus)
    tags = {c.params["grid"] for c in cands}
    assert tags == {"square-c1x1x1", "square-c1x2x2", "square-c2x2x2"}
    assert not [c.error for c in cands if c.error]

    prefix = str(tmp_path / "sweep")
    tune.write_tables(cands, prefix)
    for suffix in ("_cp_times.txt", "_cp_costs.txt", "_cross_times.txt",
                   "_cross_costs.txt", ".jsonl"):
        assert os.path.exists(prefix + suffix), suffix
    head = open(prefix + "_cp_times.txt").readline()
    assert "grid" in head and "time_s" in head
    rec = json.loads(open(prefix + ".jsonl").readline())
    assert "grid" in rec["params"] and "devices" in rec["params"]


def test_sweep_cacqr_gram_axis(grid222):
    a = matrix.tall_skinny(grid222, 512, 128, jax.random.key(1)).data
    space = {"num_iter": [2], "base_method": ["xla"],
             "gram_policy": ["allreduce", "two_stage", "packed"]}
    cands = tune.sweep_cacqr(grid222, a, space, num_iter=1)
    assert not [c.error for c in cands if c.error]
    assert len(cands) == 3


def test_sweep_eigh(grid122):
    """Spectral sweep: every candidate runs clean and carries the analytic
    cost vector the run emits."""
    import numpy as np

    from capital_tpu.algs import cholinv, polar  # noqa: F401 (import check)

    rng = np.random.default_rng(7)
    q, _ = np.linalg.qr(rng.standard_normal((256, 256)))
    a_np = (q * np.linspace(0.5, 3.0, 256)) @ q.T
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    space = {"base_n": [128, 256], "summa_impl": ["gspmd"],
             "sign_l0": [None], "precision": ["highest"]}
    cands = tune.sweep_eigh(grid122, a, space, num_iter=1)
    assert len(cands) == 2
    assert not [c.error for c in cands if c.error]
    assert all(c.time_s < float("inf") for c in cands)
    assert all(c.costs.get("gflop", 0) > 0 for c in cands)


def test_sweep_cholinv_workspace_axis(grid122):
    """The workspace axis dispatches the cyclic-layout recursion
    (algs/cholinv_cyclic.py) alongside the block-sharded flagship."""
    a = matrix.symmetric(grid122, 128, jax.random.key(2)).data
    space = {
        "bc_mult": [0], "base_method": ["xla"], "min_bc": [64],
        "summa_impl": ["shard_map"],
        "workspace": ["block", "cyclic"],
    }
    cands = tune.sweep_cholinv(grid122, a, space, num_iter=1)
    assert len(cands) == 2
    assert not [c.error for c in cands if c.error]
    assert {c.params["workspace"] for c in cands} == {"block", "cyclic"}
