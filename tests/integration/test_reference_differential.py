"""Differential validation against the LIVE reference rotation module.

The golden fixtures (`/root/reference/tests/integration/fixtures`) store
only *unrotated* EOFs, so fixture replay never pins a rotated value.  The
reference's rotation module is importable with numpy alone
(xmca/tools/rotation.py) — here it is executed directly and our varimax /
promax / rotated getters are compared against its outputs on the same
loading stacks, for real and complex solutions and promax powers 1/2/4.

Singular vectors (and therefore rotated loadings) are unique only up to a
per-mode unit factor; all comparisons align phases mode-by-mode first.
"""
import importlib.util
import os

import numpy as np
import pytest

from xmca_tpu.xarray import xMCA
import xmca_tpu.tools.rotation as our_rot

REF_ROTATION = '/root/reference/xmca/tools/rotation.py'


@pytest.fixture(scope='module')
def ref_rotation():
    if not os.path.exists(REF_ROTATION):
        pytest.skip('reference rotation module not mounted')
    spec = importlib.util.spec_from_file_location('ref_rotation',
                                                  REF_ROTATION)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _phases(ours, ref):
    """Per-column unit factor aligning `ours` onto `ref`."""
    ip = np.sum(np.conj(ours) * ref, axis=0)
    mag = np.abs(ip)
    return np.where(mag > 0, ip / np.where(mag > 0, mag, 1.0), 1.0)


@pytest.fixture(scope='module')
def loadings(sst64, prcp64):
    """sqrt(sval)-scaled loading stacks L = [V_l; V_r] sqrt(s), n_rot=10.

    Built once from a solved f64 model on the reference's own fixture
    fields — the unrotated V entering `rotate` is exactly what the golden
    tests already validate to ~1e-6.
    """
    out = {}
    for cplx in (False, True):
        m = xMCA(sst64, prcp64)
        m.solve(complexify=cplx)
        s = np.asarray(m.singular_values(10))
        V = m._get_V(10, rotated=False)
        L = np.concatenate([V['left'], V['right']], axis=0)
        out['cplx' if cplx else 'real'] = (L * np.sqrt(s), m)
    return out


@pytest.mark.parametrize('case', ['real', 'cplx'])
def test_varimax_matches_reference(loadings, ref_rotation, case):
    L, _ = loadings[case]
    B_ref, R_ref = ref_rotation.varimax(L.copy())
    B, R = our_rot.varimax(L)

    ph = _phases(B, B_ref)
    np.testing.assert_allclose(B * ph, B_ref, atol=1e-5)
    np.testing.assert_allclose(R * ph, R_ref, atol=1e-5)


@pytest.mark.parametrize('case', ['real', 'cplx'])
@pytest.mark.parametrize('power', [1, 2, 4])
def test_promax_matches_reference(loadings, ref_rotation, case, power):
    L, _ = loadings[case]
    B_ref, R_ref, phi_ref = ref_rotation.promax(L.copy(), power)
    B, R, phi = our_rot.promax(L, power)

    scale = np.abs(B_ref).max()
    ph = _phases(B, B_ref)
    np.testing.assert_allclose(B * ph, B_ref, atol=1e-5 * scale)
    np.testing.assert_allclose(R * ph, R_ref, atol=1e-5)
    # phi transforms with the aligning phases on both sides
    phi_aligned = np.conj(ph)[:, None] * phi * ph[None, :]
    np.testing.assert_allclose(phi_aligned, phi_ref, atol=1e-5)


@pytest.mark.parametrize('case', ['real', 'cplx'])
@pytest.mark.parametrize('power', [1, 2])
def test_rotated_getters_match_reference_rotation(loadings, ref_rotation,
                                                  case, power):
    """Rotated EOFs/PCs/variance pinned to the reference's own rotation.

    Recomputes the reference's `rotate` + `_get_V`/`_get_U` semantics
    (xmca/array.py:781-844,615-674) with the rotation matrices produced by
    the *reference's* promax, then compares our public rotated getters.
    """
    L, m_template = loadings[case]
    cplx = case == 'cplx'
    n_rot = 10

    # our model, rotated through the public API
    m = m_template
    m.rotate(n_rot, power=power)

    B_ref, R_ref, _ = ref_rotation.promax(L.copy(), power)
    n_left = m._V['left'].shape[0]
    norm_ref = {
        'left': np.linalg.norm(B_ref[:n_left], axis=0),
        'right': np.linalg.norm(B_ref[n_left:], axis=0),
    }
    variance_ref = norm_ref['left'] * norm_ref['right']
    var_idx = np.argsort(variance_ref)[::-1]

    np.testing.assert_allclose(
        np.asarray(m.variance(n_rot)), variance_ref[var_idx], rtol=1e-5
    )

    s = np.asarray(m.singular_values(n_rot))
    sqrt_s = np.sqrt(s)
    if power == 1:
        R_inv_T = R_ref            # orthogonal
    else:
        R_inv_T = np.linalg.pinv(R_ref).conjugate().T

    V_unrot = {k: v[:, :n_rot] for k, v in m._V.items()}
    ours_V = m._get_V(n_rot, rotated=True)
    ours_U = m._get_U(n_rot, rotated=True)
    X = m._get_X()

    for k in ('left', 'right'):
        V_ref_rot = (V_unrot[k] * sqrt_s @ R_ref / norm_ref[k])[:, var_idx]
        U_ref_rot = ((X[k] @ V_unrot[k]) / sqrt_s @ R_inv_T)[:, var_idx]

        ph = _phases(ours_V[k], V_ref_rot)
        np.testing.assert_allclose(
            ours_V[k] * ph, V_ref_rot, atol=1e-5
        )
        # PCs carry the conjugate phase so that U V^H is invariant
        scale_u = np.abs(U_ref_rot).max()
        np.testing.assert_allclose(
            ours_U[k] * np.conj(ph), U_ref_rot, atol=1e-5 * scale_u
        )


@pytest.mark.parametrize('power', [1, 2])
def test_rotated_reconstruction_matches_reference_rotation(
        loadings, ref_rotation, power):
    """Mode-subset reconstruction depends on the rotation — pin it too."""
    L, m = loadings['real']
    n_rot = 10
    m.rotate(n_rot, power=power)

    B_ref, R_ref, _ = ref_rotation.promax(L.copy(), power)
    n_left = m._V['left'].shape[0]
    norm_ref = {
        'left': np.linalg.norm(B_ref[:n_left], axis=0),
        'right': np.linalg.norm(B_ref[n_left:], axis=0),
    }
    variance_ref = norm_ref['left'] * norm_ref['right']
    var_idx = np.argsort(variance_ref)[::-1]
    s = np.asarray(m.singular_values(n_rot))
    sqrt_s = np.sqrt(s)
    R_inv_T = (R_ref if power == 1
               else np.linalg.pinv(R_ref).conjugate().T)

    k_modes = 4
    ours = m._reconstructed_X(mode=k_modes, original_scale=False)
    X = m._get_X()
    for k in ('left', 'right'):
        V_rot = (m._V[k][:, :n_rot] * sqrt_s @ R_ref
                 / norm_ref[k])[:, var_idx]
        U_rot = ((X[k] @ m._V[k][:, :n_rot]) / sqrt_s @ R_inv_T)[:, var_idx]
        norm_sorted = norm_ref[k][var_idx]
        rec_ref = ((U_rot[:, :k_modes] * norm_sorted[:k_modes])
                   @ V_rot[:, :k_modes].conjugate().T).real
        scale = np.abs(rec_ref).max()
        np.testing.assert_allclose(ours[k], rec_ref, atol=1e-5 * scale)


@pytest.mark.parametrize('power', [1, 4])
def test_rotated_predict_consistent_with_reference_rotation(
        loadings, ref_rotation, power):
    """predict() on training data reproduces the reference-pinned PCs."""
    L, m = loadings['real']
    m.rotate(10, power=power)
    fields = m.fields(original_scale=True)
    pred = m.predict(left=fields['left'][:20], n=5)

    B_ref, R_ref, _ = ref_rotation.promax(L.copy(), power)
    n_left = m._V['left'].shape[0]
    norm_ref = np.linalg.norm(B_ref[:n_left], axis=0)
    variance_ref = norm_ref * np.linalg.norm(B_ref[n_left:], axis=0)
    var_idx = np.argsort(variance_ref)[::-1]
    s = np.asarray(m.singular_values(10))
    R_inv_T = (R_ref if power == 1
               else np.linalg.pinv(R_ref).conjugate().T)

    X = m._get_X()
    U_ref = ((X['left'] @ m._V['left'][:, :10]) / np.sqrt(s)
             @ R_inv_T)[:, var_idx][:20, :5]
    scale = np.abs(U_ref).max()
    ph = _phases(pred['left'], U_ref)
    np.testing.assert_allclose(
        pred['left'] * ph, U_ref, atol=1e-5 * scale
    )
