"""General-solver walkthrough: steady-state advection-diffusion via LU.

The direct-solver endpoint the reference positions itself for but never
finishes (its Newton inverse doesn't compile, its TRSM is a stub —
SURVEY §0): a genuinely NONSYMMETRIC system, where Cholesky does not
apply and partial pivoting is load-bearing. We discretize

    -nu * Laplace(u) + (b . grad) u = f        on the unit square,
    u = 0 on the boundary

with upwind advection (the upwind stencil makes A nonsymmetric; central
differencing at this Peclet number would oscillate), assemble the dense
operator sharded over the mesh, and run the whole direct-solver family
off ONE factorization:

    w, perm, sign = lu.factor(grid, A)     (P A = L U, exact pivoting)
    u  = lu.solve_factored(w, perm, f)     (steady state)
    u2 = lu.solve_factored(w, perm, f2)    (second forcing — free)
    logdet via lu.slogdet                  (same workspace discipline)

plus two refinement sweeps (linalg.solve method='lu') to pull the f32
substitution back to factor-class residuals.

    python examples/steady_state_transport.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

import jax
import jax.numpy as jnp
import numpy as np

from capital_tpu.grid import Grid
from capital_tpu.algs import lu
from capital_tpu import linalg


def transport_operator(g: int, nu: float, bx: float, by: float):
    """Dense (g^2, g^2) upwind advection-diffusion operator on a g x g
    interior grid (Dirichlet boundary), h = 1/(g+1)."""
    h = 1.0 / (g + 1)
    n = g * g
    a = np.zeros((n, n), np.float32)
    idx = lambda i, j: i * g + j  # noqa: E731
    for i in range(g):
        for j in range(g):
            r = idx(i, j)
            # diffusion: 5-point Laplacian
            a[r, r] += 4.0 * nu / h**2
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < g and 0 <= jj < g:
                    a[r, idx(ii, jj)] -= nu / h**2
            # upwind advection (b > 0: backward differences)
            a[r, r] += (bx + by) / h
            if i > 0:
                a[r, idx(i - 1, j)] -= by / h
            if j > 0:
                a[r, idx(i, j - 1)] -= bx / h
    return a, h


def main():
    # CAPITAL_FORCE_CPU=1 keeps the walkthrough off a tunnel-attached TPU
    # (e.g. while a benchmark holds it — the tunnel serializes clients)
    devs = (jax.devices("cpu")
            if jax.default_backend() == "cpu" or os.environ.get("CAPITAL_FORCE_CPU")
            else jax.devices())
    n_dev = max(d * d for d in (1, 2) if d * d <= len(devs))
    grid = Grid.square(c=1, d=int(n_dev**0.5), devices=devs[:n_dev])
    print(f"grid {grid.shape} on {grid.platform}")

    g, nu, bx, by = 16, 0.05, 1.0, 0.5  # cell Peclet ~ b*h/nu ~ 1.2
    a_np, h = transport_operator(g, nu, bx, by)
    n = g * g
    print(f"operator: {n} x {n}, cell Peclet {bx * h / nu:.2f}, "
          f"nonsymmetry ||A-A^T||/||A|| = "
          f"{np.linalg.norm(a_np - a_np.T) / np.linalg.norm(a_np):.3f}")

    a = grid.constrain(jnp.asarray(a_np), grid.slice_spec)
    xs, ys = np.meshgrid(np.linspace(h, 1 - h, g), np.linspace(h, 1 - h, g),
                         indexing="ij")
    f1 = jnp.asarray(np.exp(-60 * ((xs - 0.3) ** 2 + (ys - 0.3) ** 2))
                     .ravel(), jnp.float32)          # source blob
    f2 = jnp.asarray((xs * ys).ravel(), jnp.float32)  # second forcing

    # one factorization, many consumers
    w, perm, sign = jax.jit(lambda x: lu.factor(grid, x))(a)
    u1 = lu.solve_factored(grid, w, perm, f1)
    u2 = lu.solve_factored(grid, w, perm, f2)
    for name, f, u in (("blob", f1, u1), ("poly", f2, u2)):
        res = float(jnp.linalg.norm(a @ u - f) / jnp.linalg.norm(f))
        print(f"steady state [{name}]: max u = {float(jnp.max(u)):.4f}, "
              f"residual {res:.2e}")

    # refined solve endpoint (2 sweeps against the original operand)
    x_ref = linalg.solve(grid, a, f1, method="lu", refine=2)
    res_ref = float(jnp.linalg.norm(a @ x_ref - f1) / jnp.linalg.norm(f1))
    print(f"refined solve: residual {res_ref:.2e}")

    # slogdet off the same factorization discipline (det > 0: the upwind
    # operator is an M-matrix)
    s, logdet = lu.slogdet(grid, a)
    print(f"slogdet: sign {float(s):+.0f}, logdet {float(logdet):.2f}")

    # oracle check vs numpy's f64 solve
    u64 = np.linalg.solve(a_np.astype(np.float64), np.asarray(f1, np.float64))
    err = np.linalg.norm(np.asarray(u1) - u64) / np.linalg.norm(u64)
    print(f"vs f64 oracle: rel error {err:.2e}")
    assert err < 1e-3
    print("OK")


if __name__ == "__main__":
    main()
