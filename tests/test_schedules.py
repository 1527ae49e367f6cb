"""Golden tests for schedule math against independent NumPy re-derivations."""
import numpy as np

from echoscene_tpu.core import schedules as S


def test_ddpm_linear_betas_endpoints():
    b = S.ddpm_linear_betas(1e-4, 0.02, 1000)
    assert b.dtype == np.float64
    assert np.isclose(b[0], 1e-4) and np.isclose(b[-1], 0.02)
    assert b.shape == (1000,)


def test_ldm_linear_betas_matches_sqrt_space():
    b = S.ldm_linear_betas(0.00085, 0.012, 1000)
    # endpoints are exact squares of the sqrt-space endpoints
    assert np.isclose(b[0], 0.00085)
    assert np.isclose(b[-1], 0.012)
    # strictly increasing, convex in sqrt space
    assert (np.diff(np.sqrt(b)) > 0).all()
    steps = np.diff(np.sqrt(b))
    assert np.allclose(steps, steps[0])


def test_warmup_betas():
    b = S.ddpm_warmup_betas(1e-4, 0.02, 100, 0.5)
    assert np.isclose(b[49], 0.02)  # end of warmup
    assert (b[50:] == 0.02).all()
    assert np.isclose(b[0], 1e-4)


def test_diffusion_tables_identities():
    betas = S.ddpm_linear_betas(1e-4, 0.02, 1000)
    t = S.make_diffusion_tables(betas)
    ac = np.cumprod(1 - betas)
    assert np.allclose(t.alphas_cumprod, ac.astype(np.float32))
    assert np.allclose(t.sqrt_alphas_cumprod ** 2 + t.sqrt_one_minus_alphas_cumprod ** 2,
                       1.0, atol=1e-5)
    # posterior variance identity: beta_t * (1 - abar_{t-1}) / (1 - abar_t)
    pv = betas * (1 - np.append(1.0, ac[:-1])) / (1 - ac)
    assert np.allclose(t.posterior_variance, pv.astype(np.float32), rtol=1e-5)
    # coef1 + coef2 scaled consistency: mu_post(x0=x, xt=x at t=0) ~ x
    assert np.isclose(t.posterior_mean_coef1[0] + t.posterior_mean_coef2[0], 1.0, atol=1e-5)
    # lvlb weight[0] patched to weight[1] (echo2shape.py:224)
    assert t.lvlb_weights[0] == t.lvlb_weights[1]
    assert np.isfinite(t.lvlb_weights).all()


def test_ddim_timesteps_uniform():
    steps = S.ddim_timesteps(100, 1000)
    assert steps.shape == (100,)
    assert steps[0] == 1 and steps[-1] == 991  # +1 shift (ldm_diffusion_util.py:79)
    assert (np.diff(steps) == 10).all()


def test_ddim_tables_eta0_sigma_zero():
    betas = S.ldm_linear_betas(0.00085, 0.012, 1000)
    tab = S.make_diffusion_tables(betas)
    steps = S.ddim_timesteps(100, 1000)
    d = S.ddim_tables(tab.alphas_cumprod, steps, eta=0.0)
    assert (d.sigmas == 0).all()
    assert d.alphas_prev[0] == tab.alphas_cumprod[0]
    assert np.allclose(d.alphas, tab.alphas_cumprod[steps])
    # eta=1 gives the DDPM posterior sigma at those steps
    d1 = S.ddim_tables(tab.alphas_cumprod, steps, eta=1.0)
    expect = np.sqrt((1 - d1.alphas_prev) / (1 - d1.alphas)
                     * (1 - d1.alphas / d1.alphas_prev))
    assert np.allclose(d1.sigmas, expect, rtol=1e-5)


def test_get_betas_dispatch():
    assert np.allclose(S.get_betas("linear", 1e-4, 0.02, 10),
                       np.linspace(1e-4, 0.02, 10))
    w = S.get_betas("warm0.2", 1e-4, 0.02, 100)
    assert (w[20:] == 0.02).all()
    c = S.get_betas("cosine", 0, 0, 100)
    assert c.shape == (100,) and (c > 0).all() and (c <= 0.999).all()
