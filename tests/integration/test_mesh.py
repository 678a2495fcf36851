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


# ------------------------------------------------ fast path, space-sharded
# The bench-critical pipeline (Cholesky-reduced kernel + subspace SVD +
# rotation, xmca_tpu.core.fastpath) must itself run space-sharded: the
# temporal Gram contracts over the sharded space axis (per-device partials
# + psum over ICI), the n x n reduction stays replicated, and the spatial
# loading back-projection is local to each shard.

@pytest.fixture(scope='module')
def big_xy():
    """Shapes where sharding is the point: space >> time, p = 8k."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((512, 8))
    Xl = base @ rng.standard_normal((8, 8192)) \
        + 0.5 * rng.standard_normal((512, 8192))
    Xr = base @ rng.standard_normal((8, 8192)) \
        + 0.5 * rng.standard_normal((512, 8192))
    return Xl - Xl.mean(0), Xr - Xr.mean(0)


@requires_8dev
def test_space_sharded_fast_solve_truncated(big_xy):
    from xmca_tpu.core.fastpath import fast_solve_truncated
    Xl, Xr = big_xy
    key = jax.random.PRNGKey(3)

    s, Vl, Vr = fast_solve_truncated(
        jnp.asarray(Xl), jnp.asarray(Xr), key, n_modes=10, n_iter=10
    )

    mesh = make_mesh(ensemble=1, space=8)
    Xl_sh = distribute_array(jnp.asarray(Xl), mesh)
    Xr_sh = distribute_array(jnp.asarray(Xr), mesh)
    s_sh, Vl_sh, Vr_sh = fast_solve_truncated(
        Xl_sh, Xr_sh, key, n_modes=10, n_iter=10
    )
    # the loadings come back sharded along space — same layout as the data
    assert len({sh.data.shape for sh in Vl_sh.addressable_shards}) == 1

    assert_allclose(np.asarray(s_sh), np.asarray(s), rtol=1e-10)
    # singular VECTORS are only defined up to sign — and, for the
    # noise-floor modes beyond the 8 planted ones, up to rotation within
    # their (degenerate) subspace, which GSPMD's reduction reorder can
    # excite.  Compare the well-separated leading modes, sign-aligned.
    k = 8
    from tests.conftest import align_modes
    for ours, ref in ((Vl_sh, Vl), (Vr_sh, Vr)):
        ours = np.asarray(ours)[:, :k]
        ref = np.asarray(ref)[:, :k]
        assert_allclose(align_modes(ours, ref), ref, atol=1e-7)


@requires_8dev
def test_space_sharded_fast_rotated_variance(big_xy):
    from xmca_tpu.core.fastpath import fast_rotated_variance
    Xl, Xr = big_xy
    key = jax.random.PRNGKey(4)

    var, conv = fast_rotated_variance(
        jnp.asarray(Xl), jnp.asarray(Xr), key, n_rot=8, power=1, n_iter=10
    )

    mesh = make_mesh(ensemble=2, space=4)
    Xl_sh = distribute_array(jnp.asarray(Xl), mesh)
    Xr_sh = distribute_array(jnp.asarray(Xr), mesh)
    var_sh, conv_sh = fast_rotated_variance(
        Xl_sh, Xr_sh, key, n_rot=8, power=1, n_iter=10
    )

    assert bool(conv) and bool(conv_sh)
    assert_allclose(np.asarray(var_sh), np.asarray(var), rtol=1e-9)


@requires_8dev
def test_space_sharded_analytic_rotated_variance(big_xy):
    """The complex (analytic-in-the-Gram) surrogate pipeline, sharded."""
    from xmca_tpu.core.fastpath import (fast_rotated_variance_analytic,
                                        hilbert_imag_matrix)
    Xl, Xr = big_xy
    H = jnp.asarray(hilbert_imag_matrix(512, np.float64))
    key = jax.random.PRNGKey(5)

    var, conv = fast_rotated_variance_analytic(
        jnp.asarray(Xl), jnp.asarray(Xr), H, key, n_rot=8, n_iter=10,
        tol=1e-5,
    )

    mesh = make_mesh(ensemble=1, space=8)
    Xl_sh = distribute_array(jnp.asarray(Xl), mesh)
    Xr_sh = distribute_array(jnp.asarray(Xr), mesh)
    var_sh, conv_sh = fast_rotated_variance_analytic(
        Xl_sh, Xr_sh, H, key, n_rot=8, n_iter=10, tol=1e-5,
    )

    assert bool(conv) and bool(conv_sh)
    assert_allclose(np.asarray(var_sh), np.asarray(var), rtol=1e-9)


@requires_8dev
def test_space_sharded_streamed_solve_matches_unsharded(xy):
    """Out-of-core + multi-chip compose: a streamed solve with every
    chunk column-sharded over the mesh's 'space' axis must equal the
    unsharded streamed solve — including NaN-column drops, odd chunk
    widths (pad columns are zero, contributing nothing), and the
    analytic (complex) Gram fold."""
    from xmca_tpu.core.streaming import streamed_mca, chunks_from_array

    Xl, Xr = (x.copy() for x in xy)
    Xl[:, 5] = np.nan
    Xr[:, [2, 40]] = np.nan

    def loaders(X, chunk):
        return lambda: chunks_from_array(X, chunk)

    for complexify in (False, True):
        base = streamed_mca(
            loaders(Xl, 64), loaders(Xr, 48), Xl.shape[0], 5,
            complexify=complexify, dtype=jnp.float64,
        )
        mesh = make_mesh(ensemble=1, space=8)
        # chunk width 13: every chunk padded (13 % 8 != 0), plus a
        # ragged tail
        sh = streamed_mca(
            loaders(Xl, 13), loaders(Xr, 13), Xl.shape[0], 5,
            complexify=complexify, dtype=jnp.float64, mesh=mesh,
        )
        assert_allclose(sh.svals, base.svals, rtol=1e-9)
        assert sh.total_covariance == pytest.approx(
            base.total_covariance, rel=1e-9)
        for k in ('left', 'right'):
            assert (sh.keep[k] == base.keep[k]).all()
            assert_allclose(sh.means[k], base.means[k], atol=1e-12)
        assert_allclose(np.abs(sh.V_left), np.abs(base.V_left),
                        atol=1e-8)
        assert_allclose(np.abs(sh.V_right), np.abs(base.V_right),
                        atol=1e-8)
        # complex device arrays: split real/imag for materialization
        # (CLAUDE.md transfer rule; harmless on CPU, fatal on axon)
        def _abs_np(a):
            return np.abs(np.asarray(jnp.real(a))
                          + 1j * np.asarray(jnp.imag(a)))
        assert_allclose(_abs_np(sh.scores_left),
                        _abs_np(base.scores_left), atol=1e-8)


@requires_8dev
def test_space_sharded_fold_solve_public_api():
    """Public complexified truncated solve (analytic-fold path) under a
    space-sharded mesh matches the unsharded result.  (Synthetic wide
    fields: the sharded resident solve needs the packed space dimension
    divisible by the mesh's space axis.)"""
    from xmca_tpu.array import MCA

    rng = np.random.default_rng(3)
    n, lat, lon = 48, 8, 16
    left = rng.standard_normal((n, lat, lon))
    right = rng.standard_normal((n, lat, lon))

    def build(mesh):
        m = MCA(left, right)
        m.set_solver(truncate=5, mesh=mesh)
        m.solve(complexify=True)
        m.rotate(4)
        return m

    ms = build(make_mesh(ensemble=1, space=8))
    mb = build(None)
    assert_allclose(ms.singular_values(5), mb.singular_values(5),
                    rtol=1e-7)
    assert_allclose(ms.variance(4), mb.variance(4), rtol=1e-5)


@requires_8dev
def test_space_sharded_streamed_public_api():
    """from_chunks + set_solver(mesh with a space axis) routes the
    streamed passes through the sharded path and matches the
    single-device public result."""
    from xmca_tpu.array import MCA

    rng = np.random.default_rng(7)
    X = {k: rng.standard_normal((64, 30 * 11)) for k in ('l', 'r')}

    def loader(A):
        def chunks():
            for s in range(0, A.shape[1], 37):
                yield A[:, s:s + 37]
        return chunks

    def build(mesh):
        m = MCA.from_chunks(
            loader(X['l']), loader(X['r']),
            n_observations=64, left_shape=(30, 11),
            right_shape=(30, 11),
        )
        m.set_solver(truncate=4, mesh=mesh)
        m.solve()
        return m

    ms = build(make_mesh(ensemble=1, space=8))
    mb = build(None)
    assert_allclose(ms.singular_values(), mb.singular_values(),
                    rtol=1e-9)
    es, eb = ms.eofs(4, rotated=False), mb.eofs(4, rotated=False)
    for k in ('left', 'right'):
        assert_allclose(np.abs(es[k]), np.abs(eb[k]), atol=1e-8)
