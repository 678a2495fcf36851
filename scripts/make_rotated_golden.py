"""Generate the rotated-values golden for the on-chip replay.

The fixture directories store only UNROTATED eofs (the reference's
``save_analysis`` always does, xmca/xarray.py:1277-1279), so the on-chip
golden replay in ``scripts/tpu_checks.py`` could pin rotated output only
by finiteness until round 5 — exactly the numeric surface the round-3
Newton-Schulz trailing-mode collapse lived in.  This script computes the
varimax-rotated EOFs/PCs/variance of the reference's sst x prcp fixtures
once on the CPU backend (the fixture .nc files store float32, so the
pipeline runs f32 even under x64 — bitwise-stable on CPU; the f64
parity suite pins this same rotation against the live reference at
1e-5, tests/integration/test_reference_differential.py) and stores them as
``tests/oracles/rotated_golden_cpu.npz``; ``tpu_checks.py`` compares the
TPU f32 rotated output against this file after sign alignment.

Run on CPU: ``python scripts/make_rotated_golden.py``.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax                                              # noqa: E402
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

FIXTURES = os.environ.get(
    'XMCA_REFERENCE_FIXTURES',
    '/root/reference/tests/integration/fixtures',
)
K_CHECK = 20      # must match tpu_checks.py golden config
N_ROT = 10


def main():
    from xmca_tpu.compat import open_dataarray
    from xmca_tpu.xarray import xMCA

    sst = open_dataarray(os.path.join(FIXTURES, 'sst.nc'))
    prcp = open_dataarray(os.path.join(FIXTURES, 'prcp.nc'))
    m = xMCA(sst, prcp)
    m.set_field_names('sst', 'prcp')
    m.set_solver(truncate=K_CHECK)
    m.solve()
    m.rotate(N_ROT)
    eofs = m.eofs(N_ROT)
    pcs = m.pcs(N_ROT)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'tests', 'oracles', 'rotated_golden_cpu.npz',
    )
    np.savez_compressed(
        out,
        eofs_left=np.asarray(eofs['left'].values),
        eofs_right=np.asarray(eofs['right'].values),
        pcs_left=np.asarray(pcs['left'].values),
        pcs_right=np.asarray(pcs['right'].values),
        variance=np.asarray(m.variance(N_ROT).values),
        k_check=K_CHECK, n_rot=N_ROT,
    )
    print('wrote', out)


if __name__ == '__main__':
    main()
