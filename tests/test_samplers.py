"""Integrator tests against an exactly-solvable linear-Gaussian diffusion.

For data ~ N(mu, s^2 I), the optimal eps-predictor has the closed form
    eps*(x, t) = sqrt(1-ac_t) * (x - sqrt(ac_t) mu) / (ac_t s^2 + 1 - ac_t)
and the probability-flow ODE maps x_T to
    x_0 = mu + s * (x_T - sqrt(ac_T) mu) / sqrt(ac_T s^2 + 1 - ac_T)
(quantile preservation of a Gaussian under the PF-ODE).  Every deterministic
integrator of the same ODE must converge to this map: DDIM (eta=0) and
DPM-Solver++(2M) are checked against the analytic solution and against each
other, with 2M converging in far fewer steps.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from echoscene_tpu.core import schedules as S
from echoscene_tpu.diffusion.samplers import ddim_chain, dpmpp_chain
from echoscene_tpu.diffusion.ddpm import LayoutDiffusion

MU, SIGMA = 1.7, 0.6


def _tables(T=1000):
    return S.make_diffusion_tables(S.ddpm_linear_betas(1e-4, 0.02, T))


def _eps_star(tables):
    ac = jnp.asarray(tables.alphas_cumprod)

    def eps(x, t_vec):
        a = ac[t_vec].reshape(-1, *([1] * (x.ndim - 1)))
        return jnp.sqrt(1 - a) * (x - jnp.sqrt(a) * MU) / (a * SIGMA**2 + 1 - a)

    return eps


def _analytic_x0(x_T, tables):
    aT = float(tables.alphas_cumprod[-1])
    return MU + SIGMA * (x_T - np.sqrt(aT) * MU) / np.sqrt(
        aT * SIGMA**2 + 1 - aT)


@pytest.fixture(scope="module")
def setup():
    tables = _tables()
    x_T = jax.random.normal(jax.random.PRNGKey(0), (16, 4))
    return tables, _eps_star(tables), x_T


def test_ddim_matches_analytic_ode_map(setup):
    tables, eps, x_T = setup
    sub = S.ddim_tables(tables.alphas_cumprod,
                        S.ddim_timesteps(200, 1000), eta=0.0)
    x0 = ddim_chain(eps, x_T.shape, jax.random.PRNGKey(1), sub, x_T=x_T)
    ref = _analytic_x0(np.asarray(x_T), tables)
    np.testing.assert_allclose(np.asarray(x0), ref, atol=2e-2)


def test_dpmpp_matches_analytic_with_few_steps(setup):
    """20-step DPM++(2M) on the lambda-uniform grid ~ 200-step DDIM."""
    tables, eps, x_T = setup
    sub = S.ddim_tables(
        tables.alphas_cumprod,
        S.lambda_uniform_timesteps(20, tables.alphas_cumprod), eta=0.0)
    x0 = dpmpp_chain(eps, x_T.shape, jax.random.PRNGKey(1), sub, x_T=x_T)
    ref = _analytic_x0(np.asarray(x_T), tables)
    np.testing.assert_allclose(np.asarray(x0), ref, atol=3e-2)


def test_dpmpp_beats_ddim_at_equal_steps(setup):
    """Second order converges faster: at 10 lambda-spaced steps, 2M error
    is well under the DDIM error on the same grid."""
    tables, eps, x_T = setup
    sub = S.ddim_tables(
        tables.alphas_cumprod,
        S.lambda_uniform_timesteps(10, tables.alphas_cumprod), eta=0.0)
    ref = _analytic_x0(np.asarray(x_T), tables)
    e_ddim = np.abs(np.asarray(
        ddim_chain(eps, x_T.shape, jax.random.PRNGKey(1), sub, x_T=x_T)) - ref).mean()
    e_2m = np.abs(np.asarray(
        dpmpp_chain(eps, x_T.shape, jax.random.PRNGKey(1), sub, x_T=x_T)) - ref).mean()
    assert e_2m < 0.5 * e_ddim, (e_2m, e_ddim)


def test_layout_fast_chain_dispatch(setup):
    """LayoutDiffusion.sample_chain_fast runs both methods over its own
    DDPM schedule and reproduces the analytic ODE map."""
    tables, eps, x_T = setup
    ld = LayoutDiffusion(tables)
    ref = _analytic_x0(np.asarray(x_T), tables)
    for method, steps, atol in (("ddim", 100, 7e-2), ("dpmpp", 25, 2e-2)):
        sub = (ld.make_ddim_tables(steps) if method == "ddim"
               else ld.make_dpmpp_tables(steps))
        # x_T is drawn inside; drive via a fixed key then check distribution
        # against the analytic map of THAT draw: reproduce the internal draw.
        rng = jax.random.PRNGKey(3)
        _, init_rng = jax.random.split(rng)
        x_T_int = jax.random.normal(init_rng, x_T.shape)
        out = ld.sample_chain_fast(eps, x_T.shape, rng, sub, method=method)
        ref_int = _analytic_x0(np.asarray(x_T_int), tables)
        np.testing.assert_allclose(np.asarray(out), ref_int, atol=atol)


def test_bpd_perfect_denoiser_on_delta_distribution():
    """For data concentrated at a point mu, the exact eps-predictor recovers
    x0 = mu, so every per-step KL term vanishes and total_bpd == prior_bpd
    (diffusion_ddpm.py:521-548 semantics)."""
    T = 50
    tables = S.make_diffusion_tables(S.ddpm_linear_betas(1e-4, 0.02, T))
    ld = LayoutDiffusion(tables)
    mu = 0.3
    ac = jnp.asarray(tables.alphas_cumprod)

    def eps_star(x, t):
        a = ac[t].reshape(-1, *([1] * (x.ndim - 1)))
        return (x - jnp.sqrt(a) * mu) / jnp.sqrt(1 - a)

    x0 = jnp.full((4, 8), mu)
    out = ld.calc_bpd(eps_star, x0, jax.random.PRNGKey(0),
                      clip_denoised=True)
    assert out["vb_terms"].shape == (T, 4)
    np.testing.assert_allclose(float(out["mse_mean"]), 0.0, atol=1e-8)
    # exclude the t=0 row (scan order is T-1..0): the posterior variance is
    # exactly 0 there, so its clipped log-variance (-46) amplifies f32
    # rounding in the means by e^46 — the reference shares this quirk
    # (posterior_log_variance_clipped, diffusion_ddpm.py:147-151)
    vb_wo_t0 = np.asarray(out["vb_terms"])[:-1]
    np.testing.assert_allclose(vb_wo_t0, 0.0, atol=1e-5)
    assert float(out["prior_bpd"]) > 0
    assert np.isfinite(float(out["total_bpd"]))


def test_lambda_uniform_grid_exact_count_no_t0():
    """Regression: the nearest-index pick used to collapse duplicates
    (requesting 100 gave 94) and always included t=0, making the final
    transition degenerate (a_t == a_prev -> one wasted denoiser call)."""
    tables = _tables()
    for n in (10, 20, 50, 100):
        steps = S.lambda_uniform_timesteps(n, tables.alphas_cumprod)
        assert len(steps) == n, (n, len(steps))
        assert steps[0] >= 1
        assert (np.diff(steps) > 0).all()
        sub = S.ddim_tables(tables.alphas_cumprod, steps, 0.0)
        assert (np.asarray(sub.alphas) != np.asarray(sub.alphas_prev)).all()


def test_normal_kl_closed_form():
    from echoscene_tpu.diffusion.ddpm import normal_kl
    # KL(N(1, e^0) || N(0, e^0)) = 0.5
    assert abs(float(normal_kl(1.0, 0.0, 0.0, 0.0)) - 0.5) < 1e-6
    # identical distributions -> 0
    assert abs(float(normal_kl(0.7, -1.3, 0.7, -1.3))) < 1e-9


def test_discretized_gaussian_loglik_matches_reference_math():
    """Literal parity with diffusion_ddpm.py:96-116 (interior = CDF delta over
    +-0.5, boundaries one-sided at x<0.001 / x>0.999)."""
    from echoscene_tpu.diffusion.ddpm import discretized_gaussian_log_likelihood
    from scipy.stats import norm

    x = jnp.asarray([0.0, 0.5, 1.0])
    means = jnp.asarray([0.1, 0.4, 0.9])
    log_scales = jnp.asarray([0.0, -1.0, 0.5])
    lp = np.asarray(discretized_gaussian_log_likelihood(
        x, means=means, log_scales=log_scales))

    inv = np.exp(-np.asarray(log_scales))
    c = np.asarray(x) - np.asarray(means)
    cdf_p = norm.cdf(inv * (c + 0.5))
    cdf_m = norm.cdf(inv * (c - 0.5))
    expect = np.array([
        np.log(max(cdf_p[0], 1e-12)),                 # x=0 -> boundary low
        np.log(max(cdf_p[1] - cdf_m[1], 1e-12)),      # interior
        np.log(max(1.0 - cdf_m[2], 1e-12)),           # x=1 -> boundary high
    ])
    np.testing.assert_allclose(lp, expect, rtol=1e-5)


def test_ddim_chain_eta_noise_is_seeded(setup):
    """eta>0 path stays finite and is deterministic under the same key."""
    tables, eps, x_T = setup
    sub = S.ddim_tables(tables.alphas_cumprod,
                        S.ddim_timesteps(50, 1000), eta=1.0)
    a = ddim_chain(eps, x_T.shape, jax.random.PRNGKey(2), sub, x_T=x_T)
    b = ddim_chain(eps, x_T.shape, jax.random.PRNGKey(2), sub, x_T=x_T)
    assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
