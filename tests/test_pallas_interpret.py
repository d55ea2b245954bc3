"""CPU interpret-mode coverage for every Pallas kernel body.

``pltpu.force_tpu_interpret_mode()`` emulates TPU-specific primitives (DMA semaphores,
scalar prefetch) on CPU, so the kernel *logic* runs in the ordinary CI suite --
previously these kernels were only exercised by the TPU-gated statistical tests.

One caveat shapes these tests: the interpreter stubs ``pltpu.prng_random_bits`` to
ZEROS (jax _src/pallas/mosaic/interpret/interpret_pallas_call.py, "TODO: Implement
this properly"). That makes every kernel fully DETERMINISTIC under interpret mode --
the Box-Muller/uniform draws become known constants -- so instead of statistical
checks (the TPU-gated tests' job) we verify the numerical pipeline EXACTLY against
numpy mirrors evaluated with the same constant "randomness"."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from openmcmc_tpu.linalg import gmrf
from openmcmc_tpu.linalg import structured as st

B = 256  # rows actually checked; kernels pad to their BLOCK_B lanes internally

# constants the stubbed PRNG produces (bits == 0)
U_HALF = 0.5 / 16777216.0  # uniforms built as (i24 + 0.5) * 2^-24
U_ONE = 1.0 / 16777216.0  # uniforms built as (i24 + 1.0) * 2^-24


@pytest.fixture
def interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


def _box_muller(u1, u2):
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def _erfinv_poly_np(t):
    """Numpy mirror of prng.erfinv_poly (Giles single-precision polynomial)."""
    w = -np.log((1.0 - t) * (1.0 + t))
    arg = np.where(w < 5.0, w - 2.5, np.sqrt(np.maximum(w, 1e-30)) - 3.0)
    cs = [
        (2.81022636e-08, -2.00214257e-04), (3.43273939e-07, 1.00950558e-04),
        (-3.5233877e-06, 1.34934322e-03), (-4.39150654e-06, -3.67342844e-03),
        (2.1858087e-04, 5.73950773e-03), (-1.25372503e-03, -7.62246130e-03),
        (-4.17768164e-03, 9.43887047e-03), (2.46640727e-01, 1.00167406e00),
        (1.50140941e00, 2.83297682e00),
    ]
    small = w < 5.0
    p = np.where(small, cs[0][0], cs[0][1])
    for a, b in cs[1:]:
        p = p * arg + np.where(small, a, b)
    return p * t


def _icdf(u):
    """Numpy mirror of prng.normal_icdf under the interpret stub: the engines'
    direct normal draws use the Giles inverse-CDF (clamped at ~5.2 sigma)."""
    t = np.clip(2.0 * u - 1.0, -1.0 + 1.2e-7, 1.0 - 1.2e-7)
    return np.sqrt(2.0) * _erfinv_poly_np(t)


def _tridiag_q(p, scale=20.0):
    P = gmrf.precision_irregular(jnp.arange(p, dtype=jnp.float32))
    return st.add(st.scale(scale, st.Banded(P.bands.at[0, 0].add(0.01))), st.Diagonal(jnp.ones(p)))


def test_tridiag_kernel_interpret(interpret, rng):
    """Thomas factorization + substitutions verified exactly: with the stubbed PRNG the
    kernel computes x = L^{-T}(L^{-1} b + z0) for a known constant z0."""
    from openmcmc_tpu.linalg.pallas_tridiag import _pallas_batched

    p = 16
    Q = _tridiag_q(p)
    b = jnp.asarray(rng.normal(size=p), jnp.float32)
    x = np.asarray(
        _pallas_batched(
            jnp.asarray([7], jnp.int32),
            jnp.broadcast_to(Q.bands[0], (B, p)) + 0.0,
            jnp.broadcast_to(Q.bands[1], (B, p)) + 0.0,
            jnp.broadcast_to(b, (B, p)) + 0.0,
        )
    )
    # kernel uniforms: u1 = (bits24 + 1) * 2^-24 = U_ONE, u2 = bits24 * 2^-24 = 0
    z0 = _box_muller(U_ONE, 0.0)
    Qd = np.asarray(st.to_dense(Q), np.float64)
    L = np.linalg.cholesky(Qd)
    want = np.linalg.solve(L.T, np.linalg.solve(L, np.asarray(b, np.float64)) + z0)
    assert x.shape == (B, p)
    np.testing.assert_allclose(x, np.broadcast_to(want, (B, p)), rtol=2e-4, atol=2e-4)


def test_gamma_kernel_interpret(interpret):
    """Marsaglia-Tsang squeeze verified exactly: with constant candidate draws the
    accepted value has a closed form."""
    from openmcmc_tpu.linalg.pallas_gamma import _pallas_gamma_flat

    for a in (1.5, 4.0, 8.0):
        draws = np.asarray(
            _pallas_gamma_flat(jnp.asarray([11], jnp.int32), jnp.full((512,), a, jnp.float32))
        )
        d = a - 1.0 / 3.0
        c = 1.0 / np.sqrt(9.0 * d)
        x = _box_muller(U_HALF, U_HALF)
        v = (1.0 + c * x) ** 3
        ok = (v > 0) and (np.log(U_HALF) < 0.5 * x * x + d - d * v + d * np.log(v))
        want = d * v if ok else d
        np.testing.assert_allclose(draws, np.full(512, want), rtol=1e-4)


def test_fused_smoother_interpret(interpret, rng):
    """Whole-run smoother engine: executes end-to-end (fori loops, double-buffered
    DMA, analytic log-post); deterministic draws are finite and sane."""
    from openmcmc_tpu.fused import run_fused_smoother

    n_time = 16
    s = np.linspace(0.0, 10.0, n_time)
    y = np.sin(s) + rng.normal(0.0, 0.5, n_time)
    out = run_fused_smoother(5, y, s, n_burn=3, n_iter=6, n_chains=64)
    assert out["b"].shape == (64, 6, n_time)
    for name in ("b", "lam", "tau", "log_post"):
        assert bool(np.isfinite(np.asarray(out[name])).all()), name
    assert float(out["tau"].min()) > 0 and float(out["lam"].min()) > 0


def test_fused_linreg_interpret(interpret, rng):
    """Whole-run linreg engine: with constant z the beta draw equals the conditional
    mean plus a computable offset; check the full pipeline runs and stays finite."""
    from openmcmc_tpu.fused import run_fused_linreg

    N = 50
    x = np.sort(rng.random(N))
    X = np.stack([np.ones(N), x], 1)
    y = X @ np.array([2.0, 0.5]) + rng.normal(0, 0.1, N)
    out = run_fused_linreg(9, X, y, n_burn=5, n_iter=8, n_chains=64)
    assert out["beta"].shape == (64, 8, 2)
    for name in ("beta", "lam", "tau", "log_post"):
        assert bool(np.isfinite(np.asarray(out[name])).all()), name
    assert float(out["tau"].min()) > 0 and float(out["lam"].min()) > 0


def test_fused_rw_interpret(interpret):
    """Whole-run random-walk engine: with the stubbed PRNG the proposal noise and
    accept threshold are constants, so the chain is a deterministic recursion we can
    mirror exactly in numpy."""
    from openmcmc_tpu.fused import run_fused_rw

    y = np.array([150.0, 155.0, 190.0, 160.0, 173.0])
    mu, tau, lam, step, h0 = 160.0, 1.0 / 200.0, 1.0 / 100.0, 5.0, 200.0
    n_burn, n_iter = 3, 6
    out = run_fused_rw(9, y, n_burn=n_burn, n_iter=n_iter, n_chains=64,
                       mu=mu, tau=tau, lam=lam, step=step, h0=h0)
    assert out["h"].shape == (64, n_iter)

    n, s1, s2 = len(y), y.sum(), (y**2).sum()
    const = 0.5 * (n * np.log(tau) - n * np.log(2 * np.pi)) + 0.5 * (np.log(lam) - np.log(2 * np.pi))

    def lp(h):
        return const - 0.5 * tau * (s2 - 2 * h * s1 + n * h * h) - 0.5 * lam * (h - mu) ** 2

    z0 = _icdf(U_HALF)
    log_u = np.log(U_HALF)
    h, cur = h0, lp(h0)
    draws = []
    for it in range(n_burn + n_iter):
        hp = h + step * z0
        lpp = lp(hp)
        if log_u < lpp - cur:
            h, cur = hp, lpp
        if it >= n_burn:
            draws.append(h)
    np.testing.assert_allclose(np.asarray(out["h"][0]), np.asarray(draws), rtol=1e-4)


def test_fused_rw_adapt_interpret(interpret):
    """Robbins-Monro adaptation path of the RW engine: with the stubbed PRNG the
    per-iteration acceptance probability and the log-step nudges are deterministic,
    so the adapted chain (and the returned final log_step) must match an exact
    numpy mirror of the burn-in-only adaptation recursion."""
    from openmcmc_tpu.fused import run_fused_rw

    y = np.array([150.0, 155.0, 190.0, 160.0, 173.0])
    mu, tau, lam, step, h0 = 160.0, 1.0 / 200.0, 1.0 / 100.0, 5.0, 200.0
    target, rate = 0.44, 0.1
    n_burn, n_iter = 4, 5
    out = run_fused_rw(9, y, n_burn=n_burn, n_iter=n_iter, n_chains=64,
                       mu=mu, tau=tau, lam=lam, step=step, h0=h0,
                       adapt_step=True, target_accept=target, adapt_rate=rate)

    n, s1, s2 = len(y), y.sum(), (y**2).sum()
    const = 0.5 * (n * np.log(tau) - n * np.log(2 * np.pi)) + 0.5 * (np.log(lam) - np.log(2 * np.pi))

    def lp(h):
        return const - 0.5 * tau * (s2 - 2 * h * s1 + n * h * h) - 0.5 * lam * (h - mu) ** 2

    z0 = _icdf(U_HALF)
    log_u = np.log(U_HALF)
    h, cur, log_step = h0, lp(h0), np.log(step)
    draws, steps = [], []
    for it in range(n_burn + n_iter):
        hp = h + np.exp(log_step) * z0
        lpp = lp(hp)
        la = lpp - cur
        if log_u < la:
            h, cur = hp, lpp
        if it < n_burn:  # burn-in-only Robbins-Monro nudge, after the accept test
            log_step = log_step + rate * (np.exp(min(la, 0.0)) - target)
        if it >= n_burn:
            draws.append(h)
            steps.append(log_step)
    np.testing.assert_allclose(np.asarray(out["h"][0]), np.asarray(draws), rtol=1e-4)
    np.testing.assert_allclose(float(out["log_step"][0]), steps[-1], rtol=1e-5)


def test_fused_rw_truncated_interpret(interpret):
    """Truncated-proposal path of the RW engine: draws and the asymmetric density
    correction must match a numpy mirror built from the SAME prng helper functions
    evaluated on host with the interpreter's zero bit-stream."""
    import jax.numpy as jnp

    from openmcmc_tpu.fused import run_fused_rw
    from openmcmc_tpu.fused import prng

    def zero_bits(shape):
        return jnp.zeros(shape, jnp.uint32)

    y = np.array([150.0, 155.0, 190.0, 160.0, 173.0])
    mu, tau, lam, step, h0 = 160.0, 1.0 / 200.0, 1.0 / 100.0, 8.0, 175.0
    lo_b, hi_b = 120.0, 185.0
    n_burn, n_iter = 3, 6
    out = run_fused_rw(9, y, n_burn=n_burn, n_iter=n_iter, n_chains=64,
                       mu=mu, tau=tau, lam=lam, step=step, h0=h0,
                       domain=(np.array([lo_b]), np.array([hi_b])))

    n, s1, s2 = len(y), y.sum(), (y**2).sum()
    const = 0.5 * (n * np.log(tau) - n * np.log(2 * np.pi)) + 0.5 * (np.log(lam) - np.log(2 * np.pi))

    def lp(h):
        return const - 0.5 * tau * (s2 - 2 * h * s1 + n * h * h) - 0.5 * lam * (h - mu) ** 2

    log_u = np.log(U_HALF)
    h, cur = h0, lp(h0)
    draws = []
    for it in range(n_burn + n_iter):
        hp = float(prng.truncnorm_draw(h, step, lo_b, hi_b, (1,), bit_source=zero_bits)[0])
        corr = float(prng.truncnorm_logpdf(h, hp, step, lo_b, hi_b)) - float(
            prng.truncnorm_logpdf(hp, h, step, lo_b, hi_b)
        )
        lpp = lp(hp)
        if log_u < lpp - cur + corr:
            h, cur = hp, lpp
        if it >= n_burn:
            draws.append(h)
    assert lo_b <= min(draws) and max(draws) <= hi_b
    np.testing.assert_allclose(np.asarray(out["h"][0]), np.asarray(draws), rtol=1e-4)


def test_fused_mmala_interpret(interpret, rng):
    """Whole-run mMALA engine executes end-to-end; deterministic draws finite."""
    from openmcmc_tpu.fused import run_fused_mmala

    N, d = 20, 3
    X = rng.normal(size=(N, d))
    y = X @ rng.normal(size=d) + 0.1 * rng.normal(size=N)
    out = run_fused_mmala(5, X, y, n_burn=3, n_iter=5, n_chains=32,
                          tau=1.0, lam=1.0, step=1.0)
    assert out["beta"].shape == (32, 5, 3)
    for name in ("beta", "log_post", "accept"):
        assert bool(np.isfinite(np.asarray(out[name])).all()), name


def test_fused_rw_vector_step_interpret(interpret):
    """Per-dimension proposal steps: a p=2 chain with distinct steps and a joint
    accept must match the coupled numpy recursion exactly."""
    from openmcmc_tpu.fused import run_fused_rw

    y = np.array([[1.0, 2.0, 0.5], [5.0, 4.0, 6.0]])
    mu = np.array([0.0, 5.0])
    tau = np.array([1.0, 0.5])
    lam = np.array([0.1, 0.2])
    steps = np.array([0.7, 2.5])
    h0 = np.array([0.0, 3.0])
    n_burn, n_iter = 2, 5
    out = run_fused_rw(4, y, n_burn=n_burn, n_iter=n_iter, n_chains=64,
                       mu=mu, tau=tau, lam=lam, step=steps, h0=h0)
    assert out["h"].shape == (64, n_iter, 2)

    n = y.shape[1]
    s1, s2 = y.sum(1), (y**2).sum(1)
    const = sum(0.5 * (n * np.log(tau[i]) - n * np.log(2 * np.pi))
                + 0.5 * (np.log(lam[i]) - np.log(2 * np.pi)) for i in range(2))

    def lp(h):
        return const - sum(
            0.5 * tau[i] * (s2[i] - 2 * h[i] * s1[i] + n * h[i] ** 2)
            + 0.5 * lam[i] * (h[i] - mu[i]) ** 2
            for i in range(2)
        )

    # every element's stubbed uniform is U_HALF, so both rows draw the same
    # inverse-CDF value
    z0 = np.full(2, _icdf(U_HALF))
    log_u = np.log(U_HALF)
    h, cur = h0.copy(), lp(h0)
    draws = []
    for it in range(n_burn + n_iter):
        hp = h + steps * z0
        lpp = lp(hp)
        if log_u < lpp - cur:
            h, cur = hp.copy(), lpp
        if it >= n_burn:
            draws.append(h.copy())
    np.testing.assert_allclose(np.asarray(out["h"][0]), np.asarray(draws), rtol=1e-4)


def test_fused_mmala_adapt_interpret(interpret, rng):
    """mMALA adaptation: with adapt_rate=0 the adapted kernel must reproduce the
    non-adapted chain exactly (the log-step carry is then inert), and with a
    positive rate the deterministic nudges move log_step by the exact
    Robbins-Monro increment sum."""
    from openmcmc_tpu.fused import run_fused_mmala

    N, d = 20, 3
    X = rng.normal(size=(N, d))
    y = X @ rng.normal(size=d) + 0.1 * rng.normal(size=N)
    base = run_fused_mmala(5, X, y, n_burn=3, n_iter=5, n_chains=32, step=0.8)
    frozen = run_fused_mmala(5, X, y, n_burn=3, n_iter=5, n_chains=32, step=0.8,
                             adapt_step=True, adapt_rate=0.0)
    # adapted path computes exp(log(step)) per iteration: identical up to one ulp
    np.testing.assert_allclose(np.asarray(base["beta"]), np.asarray(frozen["beta"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(frozen["log_step"]), np.log(0.8), rtol=1e-6)

    adapted = run_fused_mmala(5, X, y, n_burn=3, n_iter=5, n_chains=32, step=0.8,
                              adapt_step=True, target_accept=0.574, adapt_rate=0.1)
    # deterministic pipeline: each burn iteration nudges by 0.1*(alpha - 0.574)
    # with alpha = exp(min(log_accept, 0)) in [0, 1] -> bounded total drift
    ls = float(np.asarray(adapted["log_step"])[0])
    assert abs(ls - np.log(0.8)) <= 0.1 * 3 + 1e-6
    assert np.isfinite(np.asarray(adapted["beta"])).all()
