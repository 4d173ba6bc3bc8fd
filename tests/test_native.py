"""Native layout engine vs numpy oracles.

ref: the reference's redistribution utilities (src/util/util.hpp:56-230) and
packed triangular offsets (src/matrix/structure.h:39,59)."""

import numpy as np
import pytest

from capital_tpu import native


def test_native_lib_builds():
    assert native.available(), "csrc/layout.cpp failed to build via make"


@pytest.mark.parametrize("pr,pc,bb", [(2, 2, 1), (2, 4, 2), (3, 3, 16)])
def test_block_cyclic_roundtrip(pr, pc, bb):
    rng = np.random.default_rng(0)
    m, n = 96, 96
    a = rng.standard_normal((m, n)).astype(np.float32)
    panels = native.block_to_cyclic(a, pr, pc, bb)
    back = native.cyclic_to_block(panels, m, n, pr, pc, bb)
    np.testing.assert_array_equal(a, back)


def test_block_cyclic_layout_semantics():
    """bb=1, pr=pc=2: entry (r, c) lands on process (r%2, c%2) at local
    (r//2, c//2) — the reference's pure-cyclic layout (util.hpp:72-99)."""
    m = n = 8
    a = np.arange(m * n, dtype=np.float32).reshape(m, n)
    panels = native.block_to_cyclic(a, 2, 2, 1)
    for r in range(m):
        for c in range(n):
            assert panels[(r % 2) * 2 + (c % 2), r // 2, c // 2] == a[r, c]


@pytest.mark.parametrize("upper", [True, False])
def test_pack_roundtrip(upper):
    rng = np.random.default_rng(1)
    n = 64
    a = rng.standard_normal((n, n)).astype(np.float32)
    tri = np.triu(a) if upper else np.tril(a)
    packed = native.pack_triangle(a, upper=upper)
    assert packed.shape == (n * (n + 1) // 2,)
    back = native.unpack_triangle(packed, n, upper=upper)
    np.testing.assert_array_equal(tri, back)


def test_pack_upper_offsets():
    """Packed offset of (row, col), row<=col, is col*(col+1)/2 + row
    (ref: structure.h:39)."""
    n = 16
    a = np.zeros((n, n), np.float32)
    a[2, 5] = 7.0
    packed = native.pack_triangle(a, upper=True)
    assert packed[5 * 6 // 2 + 2] == 7.0


def test_transpose():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((130, 70)).astype(np.float32)
    np.testing.assert_array_equal(native.transpose(a), a.T)


def test_io_factor_roundtrip(tmp_path):
    """Packed checkpoint save/load (capital_tpu/io.py) preserves factors."""
    import jax
    import jax.numpy as jnp

    from capital_tpu import io as cio
    from capital_tpu.ops.lapack import chol_inv_xla

    n = 96
    u = jax.random.uniform(jax.random.key(0), (n, n), minval=-0.5, maxval=0.5)
    a = (u + u.T) * 0.5 + n * jnp.eye(n)
    r, _ = chol_inv_xla(a)
    p = str(tmp_path / "r.npz")
    cio.save_factor(p, r, upper=True, meta={"seed": 0})
    back, meta = cio.load_factor(p)
    np.testing.assert_array_equal(np.asarray(r), back)
    assert int(meta["seed"]) == 0


def test_io_sharded_roundtrip(tmp_path, grid122):
    """orbax sharded checkpoint: save on a mesh, restore re-sharded —
    values and shardings preserved without any gather."""
    import jax
    import numpy as _np

    from capital_tpu import io as cio, matrix

    a = matrix.symmetric(grid122, 64, jax.random.key(3))
    path = str(tmp_path / "ckpt")
    cio.save_sharded(path, {"a": a, "step": jnp_scalar(7)})
    out = cio.load_sharded(path, {"a": a.data, "step": jnp_scalar(0)})
    _np.testing.assert_array_equal(_np.asarray(a.data), _np.asarray(out["a"]))
    assert out["a"].sharding == a.data.sharding
    assert int(out["step"]) == 7


def jnp_scalar(v):
    import jax.numpy as jnp

    return jnp.asarray(v, jnp.int32)
