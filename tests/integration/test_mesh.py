"""Multi-device sharding on the virtual 8-device CPU mesh.

What the reference never had (SURVEY.md section 2): mesh-sharded solves and
ensembles must agree with single-device results.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from numpy.testing import assert_allclose

from xmca_tpu.parallel import make_mesh, sharded_solve, distribute_array
from xmca_tpu.core.solver import solve_mca
from xmca_tpu.xarray import xMCA


requires_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason='needs 8 virtual devices'
)


@pytest.fixture(scope='module')
def xy():
    rng = np.random.default_rng(0)
    Xl = rng.standard_normal((96, 64))
    Xr = rng.standard_normal((96, 48))
    return Xl - Xl.mean(0), Xr - Xr.mean(0)


@requires_8dev
def test_space_sharded_solve_matches_single_device(xy):
    Xl, Xr = xy
    mesh = make_mesh(ensemble=1, space=8)
    s_sh, Vl_sh, Vr_sh = sharded_solve(
        jnp.asarray(Xl), jnp.asarray(Xr), mesh=mesh
    )
    s, Vl, Vr = solve_mca(jnp.asarray(Xl), jnp.asarray(Xr))
    assert_allclose(np.asarray(s_sh), np.asarray(s), atol=1e-10)
    assert_allclose(np.abs(np.asarray(Vl_sh)), np.abs(np.asarray(Vl)),
                    atol=1e-8)
    assert_allclose(np.abs(np.asarray(Vr_sh)), np.abs(np.asarray(Vr)),
                    atol=1e-8)


@requires_8dev
def test_distribute_array_sharding(xy):
    Xl, _ = xy
    mesh = make_mesh(ensemble=1, space=8)
    xs = distribute_array(jnp.asarray(Xl), mesh)
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(96, 8)}


@requires_8dev
def test_ensemble_sharded_rule_n_matches_unsharded(sst64, prcp64):
    mesh = make_mesh(ensemble=8, space=1)
    m = xMCA(sst64, prcp64)
    m.solve()
    unsharded = np.asarray(m.rule_n(8, seed=99))
    m.set_solver(mesh=mesh)
    sharded = np.asarray(m.rule_n(8, seed=99))
    # sharded execution reorders reductions; f64 keeps this tiny
    assert_allclose(sharded, unsharded, rtol=1e-9)


@requires_8dev
def test_ensemble_sharded_bootstrap_matches_unsharded(sst64, prcp64):
    mesh = make_mesh(ensemble=8, space=1)
    m = xMCA(sst64, prcp64)
    m.solve()
    unsharded = np.asarray(
        m.bootstrapping(8, 3, disable_progress=True, seed=5)
    )
    m.set_solver(mesh=mesh)
    sharded = np.asarray(
        m.bootstrapping(8, 3, disable_progress=True, seed=5)
    )
    assert_allclose(sharded, unsharded, rtol=1e-9)


@requires_8dev
def test_mesh_2d_ensemble_and_space(xy):
    """Joint (ensemble=2, space=4) mesh: sharded surrogate batches whose
    inner solve is itself space-sharded compile and execute."""
    from xmca_tpu.stats.significance import rule_n_spectra
    mesh = make_mesh(ensemble=2, space=4)
    spectra, totals = rule_n_spectra(
        64, (32, 24), 4, dtype=np.float64, mesh=mesh, seed=0,
        batch_size=4,
    )
    assert spectra.shape[0] == 4
    assert totals.shape == (4,)
    assert np.isfinite(spectra).all()


def test_make_mesh_too_many_devices():
    with pytest.raises(ValueError):
        make_mesh(ensemble=64, space=64)
