"""Distribution-op oracle tests: log-probs, entropies and KLs against
closed forms and scipy/torch-free numpy oracles (the numerical layer every
policy-gradient loss sits on; reference relies on torch.distributions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu.ops.dist import (
    categorical_entropy,
    categorical_log_prob,
    categorical_sample,
    kl_categorical,
    kl_normal,
    normal_entropy,
    normal_log_prob,
    normal_sample,
    tanh_log_prob_correction,
    tanh_normal_sample_and_log_prob,
)


def test_normal_log_prob_matches_closed_form():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 4))
    mu = rng.normal(size=(16, 4))
    sigma = np.exp(rng.normal(size=(16, 4)) * 0.3)
    got = np.asarray(normal_log_prob(jnp.asarray(x), jnp.asarray(mu), jnp.asarray(sigma)))
    # Independent(Normal, 1): per-dim log-probs summed over the action axis
    want = (
        -0.5 * np.log(2 * np.pi) - np.log(sigma) - 0.5 * ((x - mu) / sigma) ** 2
    ).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_normal_entropy_matches_closed_form():
    sigma = np.asarray([[0.1], [1.0], [3.7]])
    got = np.asarray(normal_entropy(jnp.asarray(sigma)))
    want = (0.5 * np.log(2 * np.pi * np.e * sigma**2)).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_normal_sample_moments():
    key = jax.random.key(0)
    mu, sigma = jnp.asarray(2.0), jnp.asarray(0.5)
    xs = normal_sample(key, jnp.full((20000,), mu), jnp.full((20000,), sigma))
    assert abs(float(xs.mean()) - 2.0) < 0.02
    assert abs(float(xs.std()) - 0.5) < 0.02


def test_tanh_normal_log_prob_change_of_variables():
    """log p(a) = log N(u) - sum log(1 - tanh(u)^2), a = tanh(u) — verify
    against numerically-stable direct evaluation and finite differences."""
    key = jax.random.key(3)
    mu = jnp.asarray([[0.3, -1.0]])
    sigma = jnp.asarray([[0.7, 0.4]])
    a, logp = tanh_normal_sample_and_log_prob(key, mu, sigma)
    assert a.shape == (1, 2) and float(jnp.abs(a).max()) < 1.0
    u = np.arctanh(np.clip(np.asarray(a), -1 + 1e-7, 1 - 1e-7))
    base = (
        -0.5 * np.log(2 * np.pi)
        - np.log(np.asarray(sigma))
        - 0.5 * ((u - np.asarray(mu)) / np.asarray(sigma)) ** 2
    )
    corr = np.log1p(-np.tanh(u) ** 2 + 1e-12)
    want = (base - corr).sum(-1)
    np.testing.assert_allclose(np.asarray(logp), want, rtol=1e-3, atol=1e-4)


def test_tanh_correction_is_stable_for_large_pre_tanh():
    """The naive log(1 - tanh(u)^2) underflows for |u| > ~9; the stable
    form 2*(log2 - u - softplus(-2u)) must stay finite."""
    u = jnp.asarray([0.0, 5.0, 20.0, 50.0, -50.0])[:, None]
    corr = tanh_log_prob_correction(u)  # sums the trailing action axis
    assert bool(jnp.isfinite(corr).all())
    # closed form at u=0: log(1 - 0) = 0
    assert abs(float(corr[0])) < 1e-6
    # asymptotic: log(1 - tanh(u)^2) ~ 2*log2 - 2|u|
    np.testing.assert_allclose(
        float(corr[3]), 2 * np.log(2) - 100.0, rtol=1e-5
    )


def test_categorical_log_prob_and_entropy():
    logits = jnp.asarray([[1.0, 2.0, 0.5], [0.0, 0.0, 0.0]])
    p = np.exp(np.asarray(logits))
    p /= p.sum(-1, keepdims=True)
    got = np.asarray(categorical_log_prob(jnp.asarray([1, 2]), logits))
    np.testing.assert_allclose(got, np.log(p[[0, 1], [1, 2]]), rtol=1e-5)
    ent = np.asarray(categorical_entropy(logits))
    want = -(p * np.log(p)).sum(-1)
    np.testing.assert_allclose(ent, want, rtol=1e-5)


def test_categorical_sample_frequencies():
    logits = jnp.log(jnp.asarray([0.7, 0.2, 0.1]))
    xs = categorical_sample(
        jax.random.key(0), jnp.broadcast_to(logits, (20000, 3))
    )
    freq = np.bincount(np.asarray(xs), minlength=3) / 20000
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.02)


def test_kl_normal_closed_form_and_zero():
    mu_p, s_p = jnp.asarray([0.5]), jnp.asarray([1.2])
    mu_q, s_q = jnp.asarray([-0.3]), jnp.asarray([0.8])
    got = float(kl_normal(mu_p, s_p, mu_q, s_q).sum())
    # KL(N(mu_p, s_p) || N(mu_q, s_q))
    want = (
        np.log(0.8 / 1.2)
        + (1.2**2 + (0.5 - (-0.3)) ** 2) / (2 * 0.8**2)
        - 0.5
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert abs(float(kl_normal(mu_p, s_p, mu_p, s_p).sum())) < 1e-6


def test_kl_categorical_properties():
    lp = jnp.asarray([[2.0, 0.0, -1.0]])
    lq = jnp.asarray([[0.0, 0.5, 0.5]])
    kl = float(kl_categorical(lp, lq)[0])
    p = np.exp(np.asarray(lp[0])); p /= p.sum()
    q = np.exp(np.asarray(lq[0])); q /= q.sum()
    np.testing.assert_allclose(kl, (p * np.log(p / q)).sum(), rtol=1e-5)
    assert float(kl_categorical(lp, lp)[0]) == pytest.approx(0.0, abs=1e-6)
    assert kl >= 0.0
