"""Config-space fuzz: random (shape, grid, knob) combinations through the
full stack. The reference has no tests at all (SURVEY §4); this sweep is
the regression net for the knob lattice its policy templates spanned."""

import itertools
import random

import jax
import jax.numpy as jnp
import pytest

from capital_tpu import matrix, validate
from capital_tpu.algs import cacqr, cholinv

_rng = random.Random(20260817)

_CHOL_CASES = [
    dict(n=96, split=1, bc=32, complete_inv=True, impl="shard_map"),
    dict(n=160, split=2, bc=32, complete_inv=False, impl="shard_map"),
    dict(n=256, split=1, bc=128, complete_inv=True, impl="gspmd"),
    dict(n=320, split=3, bc=64, complete_inv=True, impl="shard_map"),
    dict(n=192, split=1, bc=48, complete_inv=True, impl="gspmd"),
    dict(n=224, split=2, bc=224, complete_inv=True, impl="shard_map"),
]


@pytest.mark.parametrize("case", _CHOL_CASES, ids=lambda c: f"n{c['n']}_s{c['split']}_bc{c['bc']}_{c['impl']}")
@pytest.mark.parametrize("gridname", ["grid122", "grid222"])
def test_cholinv_fuzz(case, gridname, request):
    grid = request.getfixturevalue(gridname)
    # summa divisibility: pad n up to a d*c multiple via the generator
    a = matrix.symmetric(grid, case["n"], jax.random.key(case["n"]))
    cfg = cholinv.Config(split=case["split"], min_bc=case["bc"],
                         complete_inv=case["complete_inv"],
                         base_method="xla", summa_impl=case["impl"])
    r, rinv = cholinv.factor(grid, a, cfg)
    res = float(validate.cholesky_residual(grid, a.data, r, impl=case["impl"]))
    assert res < 5e-6, (case, res)
    if case["complete_inv"]:
        ores = float(validate.inverse_residual(grid, r, rinv,
                                               impl=case["impl"]))
        assert ores < 5e-6, (case, ores)


_QR_CASES = [
    dict(m=512, n=32, variant=1, policy="allreduce", chunks=1),
    dict(m=1024, n=64, variant=2, policy="two_stage", chunks=1),
    dict(m=768 + 256, n=96, variant=2, policy="allreduce", chunks=4),
    dict(m=4096, n=160, variant=2, policy="two_stage", chunks=2),
]


@pytest.mark.parametrize("case", _QR_CASES, ids=lambda c: f"m{c['m']}_n{c['n']}_v{c['variant']}_{c['policy']}")
def test_cacqr_fuzz(case, grid_rect):
    a = matrix.tall_skinny(grid_rect, case["m"], case["n"],
                           jax.random.key(case["m"]))
    cfg = cacqr.Config(num_iter=case["variant"], gram_policy=case["policy"],
                       formq_chunks=case["chunks"], base_method="xla")
    q, r = cacqr.factor_1d(grid_rect, a, cfg)
    ortho = float(validate.qr_orthogonality(grid_rect, q, layout="1d"))
    res = float(validate.qr_residual(grid_rect, a.data, q, r, layout="1d"))
    tol = 1e-4 if case["variant"] == 1 else 1e-5
    assert ortho < tol, (case, ortho)
    assert res < 1e-5, (case, res)


def test_cholinv_random_spd_family(grid122):
    """Random diagonal shifts (conditioning) and seeds."""
    for seed in range(3):
        shift = 10.0 ** _rng.uniform(1, 3)
        a = matrix.symmetric(grid122, 128, jax.random.key(seed),
                             diag_shift=shift)
        cfg = cholinv.Config(min_bc=64, base_method="xla")
        r, _ = cholinv.factor(grid122, a, cfg)
        res = float(validate.cholesky_residual(grid122, a.data, r))
        assert res < 1e-5, (seed, shift, res)
