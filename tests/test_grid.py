import numpy as np
import pytest

from capital_tpu.grid import Grid


def test_square_shape(grid222):
    assert grid222.shape == (2, 2, 2)
    assert grid222.c == 2 and grid222.d == 2
    assert grid222.num_devices == 8
    assert grid222.is_square


def test_rect_shape(grid_rect):
    c, d1, d2 = grid_rect.shape
    assert (c, d2) == (2, 2) and d1 == 2
    assert not grid_rect.is_square or d1 == d2


def test_square_validates(cpus):
    with pytest.raises(ValueError):
        Grid.square(c=3, d=2, devices=cpus[:8])


def test_layouts_differ(cpus):
    g0 = Grid.square(c=2, d=2, devices=cpus[:8], layout=0)
    g1 = Grid.square(c=2, d=2, devices=cpus[:8], layout=1)
    ids0 = np.vectorize(lambda d: d.id)(g0.mesh.devices)
    ids1 = np.vectorize(lambda d: d.id)(g1.mesh.devices)
    assert ids0.shape == ids1.shape == (2, 2, 2)
    assert not np.array_equal(ids0, ids1)


def test_shardings(grid222):
    from jax.sharding import PartitionSpec as P

    assert grid222.block2d.spec == P("y", "x")
    assert grid222.row1d.spec == P(("z", "y", "x"), None)


def test_layout2_subblock(cpus):
    """layout=2 places consecutive devices in 2x2 slice tiles
    (ref: the 64-rank subcube blocking, topology.h:104-123)."""
    from capital_tpu.grid import Grid

    g = Grid.square(c=2, d=2, devices=cpus[:8], layout=2)
    assert g.shape == (2, 2, 2)
    ids = [[d.id for d in row] for row in g.mesh.devices[0]]
    # first four devices fill the z=0 slice as one 2x2 tile
    assert sorted(ids[0] + ids[1]) == [0, 1, 2, 3]


def test_layout2_rejects_odd(cpus):
    import pytest
    from capital_tpu.grid import Grid

    with pytest.raises(ValueError):
        Grid.square(c=8, d=1, devices=cpus[:8], layout=2)


def test_hybrid_single_host_fallback(cpus):
    """One visible host: hybrid() degrades to square() on the same devices."""
    from capital_tpu.grid import Grid

    g = Grid.hybrid(c=2, d=2, devices=cpus[:8])
    assert g.shape == (2, 2, 2)
    assert g.mesh.axis_names == ("z", "y", "x")


def test_hybrid_axes_split_preference():
    """DCN splits rows first, depth second, and rejects indivisible grids
    instead of silently building a wrong mesh."""
    from capital_tpu.grid import Grid

    # 4 hosts, d=8 divisible: split 'y'
    assert Grid._hybrid_axes(2, 8, 4) == ((2, 2, 8), (1, 4, 1))
    # d=3 not divisible by 2 but c=4 is: split 'z'
    assert Grid._hybrid_axes(4, 3, 2) == ((2, 3, 3), (2, 1, 1))
    # nothing divisible: explicit error
    import pytest

    with pytest.raises(ValueError, match="cannot split"):
        Grid._hybrid_axes(3, 5, 2)


def test_hybrid_shape_mismatch():
    from capital_tpu.grid import Grid
    import jax
    import pytest

    with pytest.raises(ValueError, match="c\\*d\\*d"):
        Grid.hybrid(c=3, d=2, devices=jax.devices("cpu")[:8])
