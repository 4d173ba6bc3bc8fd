"""High-level solver API vs dense numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from capital_tpu import linalg, matrix
from capital_tpu.algs import cacqr, cholinv


def test_spd_solve(grid122):
    n, k = 256, 32
    a = matrix.symmetric(grid122, n, jax.random.key(0)).data
    b = matrix.rand(grid122, n, k, jax.random.key(1)).data
    cfg = cholinv.Config(min_bc=64, base_method="xla", summa_impl="shard_map")
    x = linalg.spd_solve(grid122, a, b, cfg)
    res = np.linalg.norm(np.asarray(a) @ np.asarray(x) - np.asarray(b))
    res /= np.linalg.norm(np.asarray(b))
    assert res < 1e-5, res


def test_spd_solve_refine_recovers_degraded_factor(grid122):
    """Iterative refinement: a factor degraded to bf16 (simulating a fast
    low-precision factorization — CPU ignores matmul-precision tiers, so
    degradation is injected on the factor itself) must recover full-f32
    solve residuals within two sweeps."""
    n, k = 256, 16
    a = matrix.symmetric(grid122, n, jax.random.key(10)).data
    b = matrix.rand(grid122, n, k, jax.random.key(11)).data
    cfg = cholinv.Config(min_bc=64, base_method="xla", summa_impl="shard_map")
    r, rinv = cholinv.factor(grid122, a, cfg)
    bad = (r.astype(jnp.bfloat16).astype(jnp.float32),
           rinv.astype(jnp.bfloat16).astype(jnp.float32))

    def res(x):
        out = np.linalg.norm(np.asarray(a) @ np.asarray(x) - np.asarray(b))
        return out / np.linalg.norm(np.asarray(b))

    r0 = res(linalg.spd_solve(grid122, a, b, cfg, factor=bad))
    r2 = res(linalg.spd_solve(grid122, a, b, cfg, factor=bad, refine=2))
    assert r0 > 1e-4          # the degraded factor alone is bf16-class
    assert r2 < 1e-5, (r0, r2)  # refinement recovers f32-class
    assert r2 < r0 / 50


def test_spd_solve_factor_reuse(grid122):
    """The factor= path equals factoring inside the call."""
    n, k = 256, 16
    a = matrix.symmetric(grid122, n, jax.random.key(12)).data
    b = matrix.rand(grid122, n, k, jax.random.key(13)).data
    cfg = cholinv.Config(min_bc=64, base_method="xla", summa_impl="shard_map")
    fac = cholinv.factor(grid122, a, cfg)
    x0 = linalg.spd_solve(grid122, a, b, cfg)
    x1 = linalg.spd_solve(grid122, a, b, cfg, factor=fac)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x1), atol=1e-6)


def test_lstsq_refine(grid_rect):
    """One refinement sweep must not hurt, and tightens a perturbed-R
    solve back to the oracle."""
    m, n, k = 2048, 64, 8
    a = matrix.tall_skinny(grid_rect, m, n, jax.random.key(14)).data
    b = matrix.rand(grid_rect, m, k, jax.random.key(15),
                    spec=jax.sharding.PartitionSpec(("z", "y", "x"), None),
                    row_tile=grid_rect.num_devices).data
    cfg = cacqr.Config(num_iter=2, base_method="xla")
    x0, *_ = np.linalg.lstsq(np.asarray(a), np.asarray(b), rcond=None)
    x = linalg.lstsq(grid_rect, a, b, cfg, refine=1)
    np.testing.assert_allclose(np.asarray(x), x0, atol=1e-3)


def test_inv(grid122):
    n = 128
    a = matrix.symmetric(grid122, n, jax.random.key(2)).data
    cfg = cholinv.Config(min_bc=64, base_method="xla", summa_impl="shard_map")
    ainv = linalg.inv(grid122, a, cfg)
    err = np.linalg.norm(np.asarray(a) @ np.asarray(ainv) - np.eye(n))
    assert err / np.sqrt(n) < 1e-4, err


def test_lstsq(grid_rect):
    m, n, k = 2048, 64, 8
    a = matrix.tall_skinny(grid_rect, m, n, jax.random.key(3)).data
    b = matrix.rand(grid_rect, m, k, jax.random.key(4),
                    spec=jax.sharding.PartitionSpec(("z", "y", "x"), None),
                    row_tile=grid_rect.num_devices).data
    cfg = cacqr.Config(num_iter=2, base_method="xla")
    x = linalg.lstsq(grid_rect, a, b, cfg)
    x0, *_ = np.linalg.lstsq(np.asarray(a), np.asarray(b), rcond=None)
    np.testing.assert_allclose(np.asarray(x), x0, atol=1e-3)


def test_chunked_validators_match(grid1):
    """Panel-accumulated validators equal the dense formulas (the n=32768
    memory path)."""
    import jax
    import numpy as np

    from capital_tpu import matrix, validate
    from capital_tpu.algs import cholinv

    n = 256
    a = matrix.symmetric(grid1, n, jax.random.key(40)).data
    cfg = cholinv.Config(min_bc=64, base_method="xla", summa_impl="gspmd")
    r, rinv = cholinv.factor(grid1, a, cfg)
    d0 = float(validate.cholesky_residual(grid1, a, r, impl="gspmd"))
    d1 = float(validate.cholesky_residual(grid1, a, r, impl="gspmd",
                                          chunks=4))
    i0 = float(validate.inverse_residual(grid1, r, rinv, impl="gspmd"))
    i1 = float(validate.inverse_residual(grid1, r, rinv, impl="gspmd",
                                         chunks=4))
    # residuals are rounding-level (~1e-7): the two formulas accumulate in
    # different orders, so only same-magnitude agreement is meaningful
    np.testing.assert_allclose(d1, d0, rtol=0.5, atol=1e-7)
    np.testing.assert_allclose(i1, i0, rtol=0.5, atol=1e-7)
    assert d1 < 5e-6 and i1 < 5e-6


def test_pinv_square(grid122):
    import numpy as np

    from capital_tpu import linalg
    from capital_tpu.algs import cholinv, eigh, polar, svd

    n = 256
    rng = np.random.default_rng(11)
    u, _ = np.linalg.qr(rng.standard_normal((n, n)))
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = np.geomspace(1.0, 1e-2, n)
    a_np = (u * s) @ v.T
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    chol = cholinv.Config(min_bc=64, base_method="xla")
    cfg = svd.Config(polar=polar.Config(chol=chol),
                     eig=eigh.Config(base_n=128,
                                     polar=polar.Config(compute_h=False,
                                                        chol=chol)))
    ap = linalg.pinv(grid122, a, cfg=cfg, layout="2d")
    ap64 = np.asarray(ap, np.float64)
    want = np.linalg.pinv(a_np)
    # pinv error scales with cond^2 * eps for the small singular values
    assert np.linalg.norm(ap64 - want) / np.linalg.norm(want) < 5e-3
    # Moore-Penrose identities
    assert np.linalg.norm(a_np @ ap64 @ a_np - a_np) / np.linalg.norm(a_np) < 1e-4


def test_cond_and_spd_sqrt(grid122):
    import numpy as np

    from capital_tpu import linalg
    from capital_tpu.algs import cholinv, eigh, polar, svd

    n = 256
    rng = np.random.default_rng(12)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = np.geomspace(4.0, 0.25, n)
    a_np = (q * w) @ q.T
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    chol = cholinv.Config(min_bc=64, base_method="xla")
    ecfg = eigh.Config(base_n=128,
                       polar=polar.Config(compute_h=False, chol=chol))
    scfg = svd.Config(polar=polar.Config(chol=chol), eig=ecfg)

    c = float(linalg.cond(grid122, a, cfg=scfg, layout="2d"))
    assert abs(c - 16.0) / 16.0 < 1e-3

    h = linalg.spd_sqrt(grid122, a, cfg=ecfg)
    h64 = np.asarray(h, np.float64)
    np.testing.assert_allclose(h64, h64.T, atol=1e-6)
    assert np.linalg.norm(h64 @ h64 - a_np) / np.linalg.norm(a_np) < 2e-5

    hi = linalg.spd_sqrt(grid122, a, cfg=ecfg, inverse=True)
    hi64 = np.asarray(hi, np.float64)
    assert np.linalg.norm(hi64 @ a_np @ hi64 - np.eye(n)) / np.sqrt(n) < 5e-5


def test_nearest_orthogonal_and_psd(grid122):
    import numpy as np

    from capital_tpu import linalg
    from capital_tpu.algs import cholinv, polar

    n = 192
    rng = np.random.default_rng(13)
    a_np = rng.standard_normal((n, n)) * 0.5 + np.eye(n)
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    pcfg = polar.Config(chol=cholinv.Config(min_bc=64, base_method="xla"))

    u = linalg.nearest_orthogonal(grid122, a, cfg=pcfg)
    u64 = np.asarray(u, np.float64)
    assert np.linalg.norm(u64.T @ u64 - np.eye(n)) / np.sqrt(n) < 1e-5
    # oracle: polar factor from SVD
    uu, _, vv = np.linalg.svd(a_np)
    assert np.abs(u64 - uu @ vv).max() < 1e-4

    x = linalg.nearest_psd(grid122, a, cfg=pcfg)
    x64 = np.asarray(x, np.float64)
    np.testing.assert_allclose(x64, x64.T, atol=1e-6)
    assert np.linalg.eigvalsh(x64).min() > -1e-4
    # Higham oracle: eigenvalue clipping of the symmetric part
    b = (a_np + a_np.T) / 2
    w, q = np.linalg.eigh(b)
    want = (q * np.maximum(w, 0.0)) @ q.T
    assert np.linalg.norm(x64 - want) / np.linalg.norm(want) < 1e-4


def test_general_solve_normal_and_polar(grid122):
    import numpy as np

    from capital_tpu import linalg
    from capital_tpu.algs import cholinv

    n, k = 256, 8
    rng = np.random.default_rng(21)
    # controlled cond=50 nonsymmetric operand
    u, _ = np.linalg.qr(rng.standard_normal((n, n)))
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a_np = (u * np.geomspace(1.0, 1.0 / 50.0, n)) @ v.T
    x_true = rng.standard_normal((n, k))
    b_np = a_np @ x_true
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    b = jax.device_put(np.asarray(b_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    cfg = cholinv.Config(min_bc=64, base_method="xla")

    for method, tol in (("normal", 5e-5), ("polar", 5e-5)):
        x = linalg.solve(grid122, a, b, method=method, cfg=cfg)
        err = np.linalg.norm(np.asarray(x, np.float64) - x_true) \
            / np.linalg.norm(x_true)
        assert err < tol, (method, err)


def test_general_solve_polar_hard_cond(grid122):
    import numpy as np

    from capital_tpu import linalg
    from capital_tpu.algs import cholinv

    n = 192
    rng = np.random.default_rng(22)
    u, _ = np.linalg.qr(rng.standard_normal((n, n)))
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a_np = (u * np.geomspace(1.0, 1e-4, n)) @ v.T  # cond 1e4
    x_true = rng.standard_normal((n, 4))
    b_np = a_np @ x_true
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    b = jax.device_put(np.asarray(b_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    cfg = cholinv.Config(min_bc=64, base_method="xla")
    x = linalg.solve(grid122, a, b, method="polar", refine=2, cfg=cfg)
    # forward error bounded by cond * eps-class
    err = np.linalg.norm(np.asarray(x, np.float64) - x_true) \
        / np.linalg.norm(x_true)
    assert err < 5e-2, err
    # backward residual is the stable-solver contract
    res = np.linalg.norm(a_np @ np.asarray(x, np.float64) - b_np) \
        / np.linalg.norm(b_np)
    assert res < 1e-5, res


def test_slogdet_spd(grid122):
    import numpy as np

    from capital_tpu import linalg, matrix
    from capital_tpu.algs import cholinv

    n = 256
    a = matrix.symmetric(grid122, n, jax.random.key(30)).data
    sign, ld = linalg.slogdet_spd(
        grid122, a, cfg=cholinv.Config(min_bc=64, base_method="xla"))
    want = np.linalg.slogdet(np.asarray(a, np.float64))
    assert float(sign) == 1.0 and want[0] == 1.0
    np.testing.assert_allclose(float(ld), want[1], rtol=1e-5)


def test_expm_against_torch_oracle(grid122):
    import numpy as np
    import torch

    from capital_tpu import linalg
    from capital_tpu.algs import cholinv

    n = 192
    rng = np.random.default_rng(31)
    # moderate-norm nonsymmetric operand (one squaring level)
    a_np = rng.standard_normal((n, n)) * (8.0 / np.sqrt(n))
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    out = linalg.expm(grid122, a,
                      cfg=cholinv.Config(min_bc=64, base_method="xla"))
    want = torch.matrix_exp(torch.tensor(a_np, dtype=torch.float64)).numpy()
    got = np.asarray(out, np.float64)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 5e-5


def test_expm_small_norm_no_squaring(grid122):
    import numpy as np
    import torch

    from capital_tpu import linalg
    from capital_tpu.algs import cholinv

    n = 128
    rng = np.random.default_rng(32)
    a_np = rng.standard_normal((n, n)) * 0.05  # norm << theta13
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    out = linalg.expm(grid122, a,
                      cfg=cholinv.Config(min_bc=64, base_method="xla"))
    want = torch.matrix_exp(torch.tensor(a_np, dtype=torch.float64)).numpy()
    assert np.linalg.norm(np.asarray(out, np.float64) - want) \
        / np.linalg.norm(want) < 2e-6


def test_logm_powm_spd(grid122):
    import numpy as np

    from capital_tpu import linalg
    from capital_tpu.algs import cholinv, eigh, polar

    n = 192
    rng = np.random.default_rng(33)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = np.geomspace(0.5, 3.0, n)
    a_np = (q * w) @ q.T
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    chol = cholinv.Config(min_bc=64, base_method="xla")
    ecfg = eigh.Config(base_n=128,
                       polar=polar.Config(compute_h=False, chol=chol))

    lg = np.asarray(linalg.logm_spd(grid122, a, cfg=ecfg), np.float64)
    want = (q * np.log(w)) @ q.T
    assert np.linalg.norm(lg - want) / np.linalg.norm(want) < 5e-5

    p3 = np.asarray(linalg.powm_spd(grid122, a, 0.25, cfg=ecfg), np.float64)
    wantp = (q * w**0.25) @ q.T
    assert np.linalg.norm(p3 - wantp) / np.linalg.norm(wantp) < 5e-5


def test_lstsq_tsqr_illconditioned(grid1d8):
    import numpy as np

    from capital_tpu import linalg

    m, n, k = 2048, 64, 4
    rng = np.random.default_rng(41)
    u, _ = np.linalg.qr(rng.standard_normal((m, n)))
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a_np = (u * np.geomspace(1.0, 1e-6, n)) @ v.T  # cond 1e6: CQR2 dies
    x_true = rng.standard_normal((n, k))
    b_np = a_np @ x_true
    a = jax.device_put(np.asarray(a_np, np.float32), grid1d8.row1d)
    b = jax.device_put(np.asarray(b_np, np.float32), grid1d8.row1d)
    x = linalg.lstsq(grid1d8, a, b, method="tsqr")
    # backward residual is the stable contract at this conditioning
    res = np.linalg.norm(a_np @ np.asarray(x, np.float64) - b_np) \
        / np.linalg.norm(b_np)
    assert res < 1e-5, res


def test_eig_residual_matches_dense(grid1):
    """The chunked device-side eigenpair validator equals the dense
    formula (used by sweep_eigh's quality column instead of a host f64
    rebuild)."""
    import numpy as np
    from capital_tpu import validate

    n = 192
    u = jax.random.uniform(jax.random.key(0), (n, n), minval=-0.5,
                           maxval=0.5)
    a = (u + u.T) * 0.5
    w, v = jnp.linalg.eigh(a)
    r_dev = float(validate.eig_residual(grid1, a, w, v, chunks=4))
    a64, v64 = np.asarray(a, np.float64), np.asarray(v, np.float64)
    r_ref = float(np.linalg.norm(a64 @ v64 - v64 * np.asarray(w, np.float64))
                  / np.linalg.norm(a64))
    assert abs(r_dev - r_ref) < 1e-7 + 0.1 * r_ref


def test_vector_rhs_convention(grid122):
    """1-D b in -> 1-D x out, for every solve endpoint (numpy's
    convention). Returning (n, 1) is a correctness trap: the user's
    `a @ x - b` residual check then broadcasts to (n, n) and silently
    measures nonsense."""
    import numpy as np

    n = 128
    key = jax.random.key(11)
    g = jax.random.normal(key, (n, n), dtype=jnp.float32)
    spd = g @ g.T + n * jnp.eye(n)
    b = jax.random.normal(jax.random.key(12), (n,), dtype=jnp.float32)

    for method in ("normal", "lu", "polar"):
        x = linalg.solve(grid122, g + 10 * jnp.eye(n), b, method=method)
        assert x.shape == (n,), (method, x.shape)
    x = linalg.spd_solve(grid122, spd, b)
    assert x.shape == (n,)
    res = float(jnp.linalg.norm(spd @ x - b) / jnp.linalg.norm(b))
    assert res < 1e-4, res

    m, k = 512, 32
    a_tall = jax.random.normal(jax.random.key(13), (m, k), jnp.float32)
    bt = jax.random.normal(jax.random.key(14), (m,), jnp.float32)
    xt = linalg.lstsq(grid122, a_tall, bt)
    assert xt.shape == (k,)
    # least-squares optimality: A^T (A x - b) ~ 0
    ng = float(jnp.linalg.norm(a_tall.T @ (a_tall @ xt - bt)))
    assert ng < 1e-2 * float(jnp.linalg.norm(a_tall.T @ bt)), ng
