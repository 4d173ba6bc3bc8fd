import jax
import jax.numpy as jnp
import numpy as np
import pytest

from capital_tpu import matrix
from capital_tpu.matrix import Structure


def test_rand_layout_independent(grid222, grid122):
    """Same (key, shape) must generate the identical global matrix on any
    grid — the reference's global-coordinate-seeded reproducibility
    (ref: structure.hpp:80-85)."""
    key = jax.random.key(7)
    a = matrix.rand(grid222, 64, 64, key)
    b = matrix.rand(grid122, 64, 64, key)
    np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))


def test_symmetric_spd(grid222):
    a = matrix.symmetric(grid222, 60, jax.random.key(0))
    g = np.asarray(a.data)
    assert a.shape == (60, 60)
    np.testing.assert_allclose(g, g.T, atol=1e-6)
    # diagonally dominant => positive definite; padding is identity
    w = np.linalg.eigvalsh(g)
    assert w.min() > 0
    assert g[-1, -1] == pytest.approx(1.0) or a.padded_shape == (60, 60)


def test_identity_and_debug(grid122):
    eye = matrix.identity(grid122, 16)
    np.testing.assert_array_equal(np.asarray(eye.to_global()), np.eye(16, dtype=np.float32))
    dbg = matrix.debug(grid122, 8, 6)
    g = np.asarray(dbg.to_global())
    i, j = np.indices((8, 6))
    np.testing.assert_array_equal(g, (i + 8 * j).astype(np.float32))


def test_structure_mask(grid122):
    a = matrix.rand(grid122, 32, 32, jax.random.key(1), structure=Structure.UPPERTRI)
    g = np.asarray(a.to_global())
    assert np.allclose(g, np.triu(g))


def test_tall_skinny_sharded(grid222):
    a = matrix.tall_skinny(grid222, 100, 16, jax.random.key(2))
    assert a.shape == (100, 16)
    assert a.padded_shape[0] % grid222.num_devices == 0
    g = np.asarray(a.data)
    assert np.all(g[100:] == 0)


def test_pytree_roundtrip(grid122):
    a = matrix.rand(grid122, 16, 16, jax.random.key(3))
    leaves, tree = jax.tree_util.tree_flatten(a)
    b = jax.tree_util.tree_unflatten(tree, leaves)
    assert b.shape == a.shape and b.structure == a.structure
