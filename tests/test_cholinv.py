import jax
import jax.numpy as jnp
import numpy as np
import pytest

from capital_tpu import matrix, validate
from capital_tpu.algs import cholinv


def _spd(grid, n, seed=0):
    return matrix.symmetric(grid, n, jax.random.key(seed)).data


@pytest.mark.parametrize("gridname", ["grid122", "grid222"])
def test_factor_residual(gridname, request):
    grid = request.getfixturevalue(gridname)
    n = 256
    a = _spd(grid, n)
    cfg = cholinv.Config(min_bc=64, base_method="xla")
    r, rinv = cholinv.factor(grid, a, cfg)
    res = float(validate.cholesky_residual(grid, a, r))
    inv = float(validate.inverse_residual(grid, r, rinv))
    assert res < 5e-6, res
    assert inv < 5e-6, inv


def test_factor_matches_xla_chol(grid122):
    n = 128
    a = _spd(grid122, n, seed=1)
    cfg = cholinv.Config(min_bc=32, base_method="xla")
    r, _ = cholinv.factor(grid122, a, cfg)
    ref = np.linalg.cholesky(np.asarray(a, dtype=np.float64)).T
    np.testing.assert_allclose(np.triu(np.asarray(r)), ref, rtol=0, atol=2e-4)


def test_split_knob(grid122):
    n = 256
    a = _spd(grid122, n, seed=2)
    for split in (1, 2):
        cfg = cholinv.Config(min_bc=32, split=split, base_method="xla")
        r, rinv = cholinv.factor(grid122, a, cfg)
        assert float(validate.cholesky_residual(grid122, a, r)) < 5e-6


def test_complete_inv_false_top_level(grid122):
    n = 128
    a = _spd(grid122, n, seed=3)
    cfg = cholinv.Config(min_bc=32, complete_inv=False, base_method="xla")
    r, rinv = cholinv.factor(grid122, a, cfg)
    # diagonal blocks of rinv are exact inverses; the top-level off-diagonal
    # block is intentionally zero (ref: cholinv.hpp:147-156 skip)
    n1 = 64
    ri = np.asarray(rinv)
    assert np.all(ri[:n1, n1:] == 0)
    rd = np.asarray(r)
    np.testing.assert_allclose(
        np.triu(rd[:n1, :n1]) @ np.triu(ri[:n1, :n1]), np.eye(n1), atol=1e-4
    )


def test_base_case_only(grid122):
    """n == bc exercises the pure replicated leaf."""
    n = 64
    a = _spd(grid122, n, seed=4)
    cfg = cholinv.Config(min_bc=64, base_method="xla")
    r, rinv = cholinv.factor(grid122, a, cfg)
    assert float(validate.cholesky_residual(grid122, a, r)) < 5e-6
    assert float(validate.inverse_residual(grid122, r, rinv)) < 5e-6


def test_lower_direction(grid122):
    """cfg.lower mirrors the reference's `dir` knob: A = L L^T with
    L = R^T (ref: cholinv.h:26-43)."""
    import numpy as np

    n = 128
    a = _spd(grid122, n, seed=7)
    up = cholinv.Config(min_bc=64, base_method="xla")
    lo = cholinv.Config(min_bc=64, base_method="xla", lower=True)
    r, rinv = cholinv.factor(grid122, a, up)
    l, linv = cholinv.factor(grid122, a, lo)
    np.testing.assert_allclose(np.asarray(l), np.asarray(r).T, atol=1e-6)
    np.testing.assert_allclose(np.asarray(linv), np.asarray(rinv).T, atol=1e-6)


def test_remat_matches(grid122):
    """FlushIntermediates analog: remat produces identical results."""
    import numpy as np

    n = 128
    a = _spd(grid122, n, seed=11)
    base = cholinv.Config(min_bc=32, base_method="xla")
    remat = cholinv.Config(min_bc=32, base_method="xla", remat=True)
    r0, ri0 = cholinv.factor(grid122, a, base)
    r1, ri1 = cholinv.factor(grid122, a, remat)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ri0), np.asarray(ri1), atol=1e-6)


@pytest.mark.parametrize("policy", ["layer", "gather", "gather_overlap"])
def test_base_policy_matches_replicated(grid222, policy):
    """The reference's four BaseCasePolicy schedules agree numerically
    (ref: policy.h:160-514). LAYER computes on z==0 + depth broadcast;
    GATHER computes on one device + mesh-wide broadcast; both must equal
    the redundant-everywhere REPLICATED result bit-for-bit (same local
    kernel, broadcast of identical values). GATHER_OVERLAP stages potrf
    and trtri as separate ops so R's broadcast overlaps the inverse
    compute (ref: the Iscatter-during-trtri pipeline, policy.h:470-488) —
    a different rounding path than the fused chol+inv kernel, so it
    agrees to rounding, not bitwise."""
    n = 256
    a = _spd(grid222, n, seed=13)
    base = cholinv.Config(min_bc=64, base_method="xla")
    alt = cholinv.Config(min_bc=64, base_method="xla", base_policy=policy)
    r0, ri0 = cholinv.factor(grid222, a, base)
    r1, ri1 = cholinv.factor(grid222, a, alt)
    if policy == "gather_overlap":
        np.testing.assert_allclose(np.asarray(r0), np.asarray(r1),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ri0), np.asarray(ri1),
                                   rtol=1e-4, atol=1e-6)
    else:
        np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
        np.testing.assert_array_equal(np.asarray(ri0), np.asarray(ri1))


def test_base_policy_under_jit(grid222):
    """LAYER's axis-index cond must be jit-traceable over the mesh."""
    n = 128
    a = _spd(grid222, n, seed=14)
    cfg = cholinv.Config(min_bc=64, base_method="xla", base_policy="layer")
    r, rinv = jax.jit(lambda x: cholinv.factor(grid222, x, cfg))(a)
    assert float(validate.cholesky_residual(grid222, a, r)) < 5e-6
    assert float(validate.inverse_residual(grid222, r, rinv)) < 5e-6


def test_negative_bc_mult(grid1):
    """bc_mult is a +-power-of-2 scaling (ref: the bcMultiplier semantics,
    cholinv.hpp:15-18) — negative values must halve the base case, not
    crash on a negative shift (round-4 fix)."""
    from capital_tpu import matrix, validate
    from capital_tpu.algs import cholinv

    cfg = cholinv.Config(bc_mult=-1, min_bc=128, base_method="xla")
    assert cfg.base_dim(grid1, 1024) == 64
    a = matrix.symmetric(grid1, 256, jax.random.key(2))
    r, rinv = cholinv.factor(grid1, a, cfg)
    assert float(validate.cholesky_residual(grid1, a.data, r)) < 1e-5
