"""Surrogate-field generation for Monte-Carlo ensembles.

The hot loop of Rule-N (reference: the host loop around
``np.random.rand`` + per-run solves, xmca/array.py:1753-1765) is, on
TPU, dominated not by linear algebra but by *drawing the random
fields*: a (2000, 100k) threefry Gaussian draw costs 17.8 ms while the
temporal Gram it feeds costs ~4.4 ms.

**The production generator is** :func:`bits_field`: random words from
the hardware-backed ``rbg`` bit generator mapped through a
moment-matched popcount/sign transform (pure XLA, fused into the
consumer; 3.8 ms per field at 32-bit words, less at 16).  The Rule-N
pipeline (``xmca_tpu.stats.significance._rule_n_generated``) draws its
surrogates this way.

The Pallas kernels below go further and never materialize the field at
all — generation happens inside the contractions:

* :func:`surrogate_gram` seeds the on-core hardware PRNG, generates
  bfloat16 tiles of the surrogate field directly in VMEM, and
  accumulates the temporal Gram ``X X^T`` on the MXU; column means and
  their projections are accumulated alongside, so the *centered* Gram
  is recovered with a rank-1 correction
  (:func:`centered_gram_from_raw`).
* :func:`surrogate_project` re-seeds the same per-tile streams to
  REGENERATE identical field tiles and contracts them against a small
  (n, m) matrix — the spatial loading back-projection ``X^T S``.

They are correct on-chip (scripts/tpu_checks.py) but MEASURED SLOWER
than `bits_field` + XLA's tuned matmul at MCA shapes (27 vs 8.2 ms per
field+Gram; a no-PRNG control of the kernel still costs 28 ms, i.e.
the full-accumulator grid structure, not the RNG, is the limit — see
benchmarks/RESULTS.md).  They are retained as the documented
alternative for shapes/hardware where fusion wins.

Draw distributions (all exactly representable in bfloat16 — no
quantization noise, unlike bfloat16-rounded Gaussians):
``normal16`` / ``normal32`` standardize a popcount-binomial matched to
N(0, 1) in its first three moments (excess kurtosis -1/8 / -1/16);
``rademacher`` maps one bit to +-1.  Wishart/Marchenko-Pastur null
spectra at MCA scales depend only on the first two moments (spectral
universality); equivalence to Gaussian ensembles is measured in
tests/unit/test_surrogate.py and
tests/integration/test_significance.py.

Non-TPU backends fall back to pure-XLA implementations of the same
distributions (different bit streams, identical statistics), so every
consumer runs everywhere.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

# one odd 32-bit constant Weyl-steps the per-tile PRNG streams; kernel 1
# and kernel 2 derive identical tile seeds so regeneration is exact
_TILE_SEED_STEP = np.int32(-1640531527)          # 2654435769 as int32
# kernel-id salt folded into sign_field_sums' base seed: its tile
# streams must NOT overlap surrogate_gram/surrogate_project's
# ``seed + k * _TILE_SEED_STEP`` family when both ever draw from the
# same base seed in one ensemble (surrogate_field/gram/project keep the
# UNsalted family on purpose — regeneration across those three kernels
# must stay exact, tests/unit/test_surrogate.py)
_SIGN_SUMS_SEED_SALT = np.int32(0x53474E53)      # 'SGNS'
_INV_SQRT8 = 0.3535533905932738


def _ceil_to(x, m):
    return -(-x // m) * m


def _bits_to_draw(bits, dist):
    """Random bits -> bfloat16 surrogate values (VPU ops only).

    ``normal32`` / ``normal16``: standardized popcount-binomial —
    Binomial(b, 1/2) matches N(0, 1) in its first three moments with
    excess kurtosis ``-2/b``.  ``normal16`` consumes half the random
    bits (the draw is bandwidth-bound at production shapes) for a
    still-negligible kurtosis deficit of -1/8.
    """
    if dist == 'rademacher':
        return jnp.where(
            (bits.astype(jnp.uint32) & np.uint32(1)).astype(jnp.int32)
            == 1,
            jnp.bfloat16(1.0), jnp.bfloat16(-1.0),
        )
    if dist == 'rademacher8':
        # +-1 stored as int8: the temporal Gram then runs the MXU's
        # s8 x s8 -> s32 mode (2x the bf16 rate, exact accumulation)
        return jnp.where(
            (bits.astype(jnp.int32) & np.int32(1)) == 1,
            jnp.int8(1), jnp.int8(-1),
        )
    # popcount keeps the unsigned dtype; hop through int32 on the way
    # to float (Mosaic has no uint32 -> float32 cast in-kernel)
    if dist == 'normal32':
        pc = jax.lax.population_count(
            bits.astype(jnp.uint32)
        ).astype(jnp.int32).astype(jnp.float32)
        return ((pc - 16.0) * _INV_SQRT8).astype(jnp.bfloat16)
    if dist == 'normal16':
        pc = jax.lax.population_count(
            bits.astype(jnp.uint32) & np.uint32(0xFFFF)
        ).astype(jnp.int32).astype(jnp.float32)
        return ((pc - 8.0) * 0.5).astype(jnp.bfloat16)
    raise ValueError(f'unknown surrogate distribution: {dist!r}')


# --------------------------------------------------------------- kernel 1
@functools.partial(
    jax.jit, static_argnames=('n', 'p', 'dist', 'block_p')
)
def surrogate_gram(seed, n, p, dist='normal32', block_p=512):
    """Raw temporal Gram of an (n, p) surrogate field, field never stored.

    Returns ``(G, mu, u, mumu)``:

    * ``G``    (n, n)  float32 — ``X X^T`` of the *uncentered* draw
    * ``mu``   (p,)    float32 — column (time-)means of the draw
    * ``u``    (n,)    float32 — ``X @ mu``
    * ``mumu`` ()      float32 — ``mu . mu``

    so the centered Gram is ``G - u 1^T - 1 u^T + mumu`` (see
    :func:`centered_gram_from_raw`).  ``seed`` is a scalar int32; equal
    seeds produce identical fields (and :func:`surrogate_project`
    regenerates the same field from the same seed).
    """
    if jax.default_backend() != 'tpu':
        X = _xla_surrogate_field(seed, n, p, dist)
        mu = jnp.mean(X.astype(jnp.float32), axis=0)
        G = jax.lax.dot_general(
            X, X, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        u = X.astype(jnp.float32) @ mu
        return G, mu, u, mu @ mu

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad = _ceil_to(n, 128)
    p_pad = _ceil_to(p, block_p)
    grid = (p_pad // block_p,)

    def kernel(seed_ref, g_ref, mu_ref, u_ref, mumu_ref):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            g_ref[:] = jnp.zeros_like(g_ref)
            u_ref[:] = jnp.zeros_like(u_ref)
            mumu_ref[0, 0] = jnp.float32(0.0)

        pltpu.prng_seed(seed_ref[0] + k * _TILE_SEED_STEP)
        bits = pltpu.prng_random_bits((n_pad, block_p))
        X = _bits_to_draw(bits, dist)
        row_ok = jax.lax.broadcasted_iota(
            jnp.int32, (n_pad, block_p), 0) < n
        col_ok = (jax.lax.broadcasted_iota(
            jnp.int32, (n_pad, block_p), 1) + k * block_p) < p
        X = jnp.where(row_ok & col_ok, X, jnp.bfloat16(0.0))

        g_ref[:] += jax.lax.dot_general(
            X, X, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        Xf = X.astype(jnp.float32)
        mu_blk = jnp.sum(Xf, axis=0, keepdims=True) * (1.0 / n)
        mu_ref[:] = mu_blk
        u_ref[:] += jax.lax.dot_general(
            Xf, mu_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mumu_ref[0, 0] += jnp.sum(mu_blk * mu_blk)

    G, mu, u, mumu = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_pad, n_pad), lambda k: (0, 0)),
            pl.BlockSpec((1, block_p), lambda k: (0, k)),
            pl.BlockSpec((n_pad, 1), lambda k: (0, 0)),
            pl.BlockSpec(
                (1, 1), lambda k: (0, 0), memory_space=pltpu.SMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, p_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
    )(jnp.reshape(jnp.asarray(seed).astype(jnp.int32), (1,)))
    return (G[:n, :n], mu[0, :p], u[:n, 0], mumu[0, 0])


def centered_gram_from_raw(G, u, mumu):
    """Temporal Gram of the centered field from raw-field accumulators.

    ``(X - 1 mu^T)(X - 1 mu^T)^T = G - u 1^T - 1 u^T + (mu.mu) 1 1^T``
    — rank-1 algebra on the small (n, n) matrix, so centering the
    surrogate costs nothing at data scale.
    """
    return G - u[:, None] - u[None, :] + mumu


# --------------------------------------------------------------- kernel 2
@functools.partial(
    jax.jit, static_argnames=('n', 'p', 'dist', 'block_p')
)
def surrogate_project(seed, S, n, p, dist='normal32', block_p=512):
    """``X^T @ S`` for the regenerated surrogate field, (p, m) float32.

    ``S`` is a small (n, m) float32 matrix (spatial-vector recovery
    weights).  The field tiles are REGENERATED from ``seed`` with the
    exact per-tile streams of :func:`surrogate_gram` — HBM traffic is
    just the (p, m) output.  For the *centered* field use
    ``surrogate_project(...) - mu[:, None] * S.sum(0)[None, :]``.
    """
    m = S.shape[1]
    if jax.default_backend() != 'tpu':
        X = _xla_surrogate_field(seed, n, p, dist)
        return jax.lax.dot_general(
            X, S.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad = _ceil_to(n, 128)
    p_pad = _ceil_to(p, block_p)
    m_pad = _ceil_to(m, 128)
    grid = (p_pad // block_p,)
    S_pad = jnp.zeros((n_pad, m_pad), jnp.float32).at[:n, :m].set(
        S.astype(jnp.float32)
    )

    def kernel(seed_ref, s_ref, v_ref):
        k = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + k * _TILE_SEED_STEP)
        bits = pltpu.prng_random_bits((n_pad, block_p))
        X = _bits_to_draw(bits, dist)
        row_ok = jax.lax.broadcasted_iota(
            jnp.int32, (n_pad, block_p), 0) < n
        col_ok = (jax.lax.broadcasted_iota(
            jnp.int32, (n_pad, block_p), 1) + k * block_p) < p
        X = jnp.where(row_ok & col_ok, X, jnp.bfloat16(0.0))
        v_ref[:] = jax.lax.dot_general(
            X, s_ref[:].astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    V = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n_pad, m_pad), lambda k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_p, m_pad), lambda k: (k, 0)),
        out_shape=jax.ShapeDtypeStruct((p_pad, m_pad), jnp.float32),
    )(jnp.reshape(jnp.asarray(seed).astype(jnp.int32), (1,)), S_pad)
    return V[:p, :m]


def bits_field(seed, shape, dist='normal16', impl='rbg'):
    """Materialized surrogate field from cheap bit transforms (pure XLA).

    The production surrogate generator: ``jax.random.bits`` with the
    hardware-backed ``rbg`` implementation plus a popcount/sign map is
    ~5x cheaper than a threefry Gaussian draw on TPU (3.8 ms vs 17.8 ms
    per (2000, 100k) bfloat16 field at 32-bit; 'normal16' halves the
    generated bits for another ~30%) and XLA fuses the bit transform
    into the consumer.  ``seed`` may be a traced int32 scalar.

    ``'rademacher1'`` spends ONE random bit per element (the draw is
    generation-rate-bound at production shapes — measured ~75 GB/s of
    generated bytes on a v5e): a (n, p/8) uint8 block is expanded to
    8 independent fair signs per byte, int8 like 'rademacher8' (the
    two are the SAME distribution, only the bit budget differs).  The
    expansion is PLANE-MAJOR — output column ``g*1024 + j*128 + c``
    takes bit ``j`` of byte ``g*128 + c`` — a fixed column permutation
    of the byte-major order (iid signs are permutation-invariant)
    chosen so the minor dimension stays a whole 128-lane tile through
    the reshape (the byte-major order — 8 consecutive columns from one
    byte — forces a cross-lane relayout).  Even plane-major, XLA's
    lowering of the 8-way broadcast+select costs more than the 7/8 of
    generation it saves: measured 24.8 vs 21.5 ms/run end-to-end
    against 'rademacher8' through the public rule_n at (2000, 2x100k)
    (null q95 agreed to 2e-4).  'rademacher8' stays the TPU default;
    the 1-bit budget pays off only when the expansion happens in-kernel
    (see ``ops.syrk`` notes).
    """
    key = jax.random.key(
        jnp.asarray(seed).astype(jnp.uint32), impl=impl
    )
    if dist == 'rademacher1':
        n_, p_ = shape
        ng = -(-p_ // 1024)             # groups of 8 planes x 128 lanes
        bits = jax.random.bits(key, (n_, ng * 128), jnp.uint8)
        b = bits.reshape(n_, ng, 1, 128)
        shifts = jnp.arange(8, dtype=jnp.uint8).reshape(1, 1, 8, 1)
        bitv = (b >> shifts) & jnp.uint8(1)
        x = jnp.where(bitv == jnp.uint8(1), jnp.int8(1), jnp.int8(-1))
        return x.reshape(n_, ng * 1024)[:, :p_]
    bits_dtype = {
        'normal16': jnp.uint16,
        'rademacher8': jnp.uint8,       # one random byte per element
    }.get(dist, jnp.uint32)
    bits = jax.random.bits(key, shape, bits_dtype)
    return _bits_to_draw(bits, dist)


# --------------------------------------------------------------- kernel 3
@functools.partial(
    jax.jit, static_argnames=('n', 'p', 'n_pad', 'p_pad', 'block_n')
)
def sign_field_sums(seed, n, p, n_pad, p_pad, block_n=512):
    """Masked bf16 +-1 field plus its column sums, one HBM write.

    Each (block_n, 4096) output block is expanded in VMEM from ONE
    (block_n, 128) block of hardware random words — bit plane ``j`` of
    word lane ``c`` becomes output column ``g*4096 + j*128 + c``
    (plane-major, a fixed permutation of iid signs; see
    :func:`bits_field` ``'rademacher1'`` for why the minor dimension
    must stay a whole 128-lane tile).  The draw spends 1 random bit
    per element instead of ``bits_field``'s 8 and fuses the masking
    and the column sums, so the only data-sized HBM traffic is the
    single bf16 write.

    **Measured SLOWER than the XLA path** and therefore NOT the
    production draw: 2.41 ms/field at (2048, 102400) vs 2.10 for
    ``bits_field('rademacher8')`` + mask + column sums inside one jit
    region (XLA fuses all three into the generation pass; the
    hardware rbg generator is fast enough that the 8x bit budget
    costs nothing — both paths are bound by the bf16 write +
    transform, not by bit generation).  Kept as the documented
    alternative for hardware where generation dominates, and as the
    regeneration-free template for a future draw-inside-syrk fusion.

    Rows ``>= n`` and columns ``>= p`` are zeroed in-kernel (the
    padded field feeds ``ops.syrk`` directly).  ``n_pad`` must be a
    multiple of ``block_n``, ``p_pad`` of 4096.  Returns
    ``(X, colsum)`` with ``X`` bf16 ``(n_pad, p_pad)``.  Non-TPU
    backends fall back to :func:`_xla_surrogate_field` (identical
    distribution, different bit stream).
    """
    if n_pad % block_n or p_pad % 4096:
        raise ValueError('n_pad %% block_n or p_pad %% 4096 != 0')
    # domain-separate this kernel's tile streams from the
    # surrogate_gram/surrogate_project family (same Weyl step, so an
    # unsalted shared base seed would reuse their random bits)
    seed = jnp.asarray(seed).astype(jnp.int32) ^ _SIGN_SUMS_SEED_SALT
    if jax.default_backend() != 'tpu':
        X = _xla_surrogate_field(seed, n, p, 'rademacher')
        Xp = jnp.zeros((n_pad, p_pad), jnp.bfloat16).at[:n, :p].set(X)
        return Xp, jnp.sum(Xp.astype(jnp.float32), axis=0)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rb = n_pad // block_n
    n_cg = p_pad // 4096

    def kernel(seed_ref, x_ref, s_ref):
        g = pl.program_id(0)
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            s_ref[:] = jnp.zeros_like(s_ref)

        pltpu.prng_seed(
            seed_ref[0] + (g * n_rb + r + 1) * _TILE_SEED_STEP
        )
        words = pltpu.prng_random_bits((block_n, 128)).astype(jnp.int32)
        row = (jax.lax.broadcasted_iota(jnp.int32, (block_n, 128), 0)
               + r * block_n)
        lane = jax.lax.broadcasted_iota(jnp.int32, (block_n, 128), 1)
        # masks and signs as f32 factors with ONE bf16 cast at the end:
        # Mosaic cannot relayout the i1 comparisons from their 32-bit
        # (8, 128) tiling into a bf16 (16, 128) select, so every select
        # targets f32 (the comparands' own tiling)
        rowm = jnp.where(row < n, jnp.float32(1.0), jnp.float32(0.0))
        for j in range(32):
            col = g * 4096 + j * 128 + lane
            colm = jnp.where(col < p, jnp.float32(1.0),
                             jnp.float32(0.0))
            sgn = jnp.where(((words >> j) & 1) == 1,
                            jnp.float32(1.0), jnp.float32(-1.0))
            plane = sgn * rowm * colm
            x_ref[:, j * 128:(j + 1) * 128] = plane.astype(jnp.bfloat16)
            s_ref[:, j * 128:(j + 1) * 128] += jnp.sum(
                plane, axis=0, keepdims=True
            )

    X, colsum = pl.pallas_call(
        kernel,
        grid=(n_cg, n_rb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((block_n, 4096), lambda g, r: (r, g)),
            pl.BlockSpec((1, 4096), lambda g, r: (0, g)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, p_pad), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, p_pad), jnp.float32),
        ),
    )(jnp.reshape(jnp.asarray(seed).astype(jnp.int32), (1,)))
    return X, colsum[0]


# ------------------------------------------------------------ XLA fallback
def _xla_surrogate_field(seed, n, p, dist):
    """Materialized surrogate field on non-TPU backends.

    Same distributions from ``jax.random.bits`` (different bit streams
    than the TPU hardware PRNG; all consumers depend only on the
    distribution).  Exists so the generated-surrogate pipeline — and its
    tests — run on any backend.
    """
    key = jax.random.fold_in(
        jax.random.PRNGKey(0), jnp.asarray(seed).astype(jnp.uint32)
    )
    bits = jax.random.bits(key, (n, p), jnp.uint32)
    return _bits_to_draw(bits, dist)


def surrogate_field(seed, n, p, dist='normal32', block_p=512):
    """Materialize the surrogate field itself (p-sized HBM write).

    Debug/verification surface: asserts that :func:`surrogate_gram` /
    :func:`surrogate_project` match a plain XLA contraction of the very
    same field.  On TPU the tiles come from the same per-tile hardware
    PRNG streams as the fused kernels; production code never calls this.
    """
    if jax.default_backend() != 'tpu':
        return _xla_surrogate_field(seed, n, p, dist)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad = _ceil_to(n, 128)
    p_pad = _ceil_to(p, block_p)
    grid = (p_pad // block_p,)

    def kernel(seed_ref, x_ref):
        k = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + k * _TILE_SEED_STEP)
        bits = pltpu.prng_random_bits((n_pad, block_p))
        X = _bits_to_draw(bits, dist)
        row_ok = jax.lax.broadcasted_iota(
            jnp.int32, (n_pad, block_p), 0) < n
        col_ok = (jax.lax.broadcasted_iota(
            jnp.int32, (n_pad, block_p), 1) + k * block_p) < p
        x_ref[:] = jnp.where(row_ok & col_ok, X, jnp.bfloat16(0.0))

    X = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((n_pad, block_p), lambda k: (0, k)),
        out_shape=jax.ShapeDtypeStruct((n_pad, p_pad), jnp.bfloat16),
    )(jnp.reshape(jnp.asarray(seed).astype(jnp.int32), (1,)))
    return X[:n, :p]
