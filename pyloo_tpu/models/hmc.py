"""Adaptive Hamiltonian Monte Carlo in JAX (vmapped chains, scanned steps).

TPU-native replacement for the reference's dependence on ``pm.sample``
(reference ``pyloo/wrapper/pymc/pymc.py:383-457``): chains are a batch
dimension (vmap), the step loop is a ``lax.scan``, and the whole sampler jits
into one XLA program.  Warmup follows the Stan scheme: dual-averaging step
size (Nesterov 2009; Hoffman & Gelman 2014 §3.2) targeting 0.8 acceptance and
a diagonal mass matrix estimated over an expanding window.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sample_hmc"]


class _DAState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_avg: jnp.ndarray
    h_sum: jnp.ndarray
    mu: jnp.ndarray
    count: jnp.ndarray


def _leapfrog(grad_fn, q, p, eps, inv_mass, n_steps):
    """n_steps of leapfrog integration with diagonal mass matrix."""

    def step(carry, _):
        q, p = carry
        p = p - 0.5 * eps * grad_fn(q)
        q = q + eps * inv_mass * p
        p = p - 0.5 * eps * grad_fn(q)
        return (q, p), None

    (q, p), _ = jax.lax.scan(step, (q, p), None, length=n_steps)
    return q, p


@partial(
    jax.jit,
    static_argnames=("potential_fn", "num_warmup", "num_samples", "num_leapfrog"),
)
def _run_chains(
    potential_fn,
    init_q,
    key,
    num_warmup: int,
    num_samples: int,
    num_leapfrog: int,
    target_accept: float,
):
    """Run all chains: init_q (C, D) -> draws (C, num_samples, D)."""
    C, D = init_q.shape
    grad_fn = jax.grad(potential_fn)
    total = num_warmup + num_samples
    adapt_end = num_warmup
    # mass-matrix estimation window: central slice of warmup
    mm_lo, mm_hi = int(num_warmup * 0.25), int(num_warmup * 0.85)

    def one_chain(q0, chain_key):
        def find_reasonable_eps(q):
            # crude init: eps giving a non-degenerate single step
            return jnp.asarray(0.1, dtype=q.dtype)

        eps0 = find_reasonable_eps(q0)
        da0 = _DAState(
            log_eps=jnp.log(eps0),
            log_eps_avg=jnp.log(eps0),
            h_sum=jnp.asarray(0.0),
            mu=jnp.log(10.0 * eps0),
            count=jnp.asarray(0.0),
        )
        welford0 = (jnp.zeros(D), jnp.zeros(D), jnp.asarray(0.0))  # mean, M2, n

        def step(carry, inputs):
            q, da, welford, inv_mass = carry
            t, step_key = inputs
            k_mom, k_jit, k_acc = jax.random.split(step_key, 3)

            in_adapt = t < adapt_end
            eps = jnp.where(in_adapt, jnp.exp(da.log_eps), jnp.exp(da.log_eps_avg))
            # jitter the step size to decorrelate trajectory lengths
            eps = eps * (0.9 + 0.2 * jax.random.uniform(k_jit))

            p = jax.random.normal(k_mom, (D,)) / jnp.sqrt(inv_mass)
            h0 = potential_fn(q) + 0.5 * jnp.sum(inv_mass * p**2)
            q_new, p_new = _leapfrog(grad_fn, q, p, eps, inv_mass, num_leapfrog)
            h1 = potential_fn(q_new) + 0.5 * jnp.sum(inv_mass * p_new**2)
            log_accept = jnp.where(jnp.isfinite(h1), h0 - h1, -jnp.inf)
            accept_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(log_accept, 0.0)))
            accept = jax.random.uniform(k_acc) < accept_prob
            q = jnp.where(accept, q_new, q)

            # dual averaging (only during warmup)
            gamma, t0, kappa = 0.05, 10.0, 0.75
            count = da.count + 1.0
            h_sum = da.h_sum + (target_accept - accept_prob)
            log_eps = da.mu - jnp.sqrt(count) / gamma * h_sum / (count + t0)
            w = count ** (-kappa)
            log_eps_avg = w * log_eps + (1.0 - w) * da.log_eps_avg
            da_new = _DAState(log_eps, log_eps_avg, h_sum, da.mu, count)
            da = jax.tree.map(
                lambda new, old: jnp.where(in_adapt, new, old), da_new, da
            )

            # Welford accumulation of posterior variance for the mass matrix
            in_mm = (t >= mm_lo) & (t < mm_hi)
            mean, m2, n = welford
            n1 = n + 1.0
            delta = q - mean
            mean1 = mean + delta / n1
            m21 = m2 + delta * (q - mean1)
            welford = (
                jnp.where(in_mm, mean1, mean),
                jnp.where(in_mm, m21, m2),
                jnp.where(in_mm, n1, n),
            )
            # adopt the estimated mass at the end of the window
            mean_f, m2_f, n_f = welford
            var = m2_f / jnp.maximum(n_f - 1.0, 1.0)
            var = jnp.where(n_f > 2.0, var, jnp.ones(D))
            inv_mass = jnp.where(t == mm_hi, var, inv_mass)

            return (q, da, welford, inv_mass), (q, accept_prob)

        keys = jax.random.split(chain_key, total)
        ts = jnp.arange(total)
        (_, _, _, _), (qs, accs) = jax.lax.scan(
            step, (q0, da0, welford0, jnp.ones(D)), (ts, keys)
        )
        return qs[num_warmup:], accs[num_warmup:]

    chain_keys = jax.random.split(key, C)
    draws, accs = jax.vmap(one_chain)(init_q, chain_keys)
    return draws, accs


def sample_hmc(
    logp_fn: Callable,
    init: np.ndarray,
    *,
    num_warmup: int = 1000,
    num_samples: int = 1000,
    num_chains: int = 4,
    num_leapfrog: int = 32,
    target_accept: float = 0.8,
    seed: int = 0,
):
    """Sample from ``exp(logp_fn(q))`` with adaptive HMC.

    Parameters
    ----------
    logp_fn : callable
        Unnormalized log density of a flat parameter vector ``q`` (D,).
    init : (D,) or (num_chains, D) array
        Initial position(s); a single vector is jittered per chain.

    Returns
    -------
    draws : (num_chains, num_samples, D) ndarray
    accept_rate : float
        Mean post-warmup acceptance probability (sanity diagnostic).
    """
    init = np.asarray(init, dtype=np.float64)
    key = jax.random.PRNGKey(seed)
    if init.ndim == 1:
        k_init, key = jax.random.split(key)
        jitter = jax.random.normal(k_init, (num_chains, init.size)) * 0.5
        init_q = jnp.asarray(init)[None, :] + jitter
    else:
        init_q = jnp.asarray(init)
        num_chains = init_q.shape[0]

    def potential(q):
        return -logp_fn(q)

    draws, accs = _run_chains(
        potential, init_q, key, num_warmup, num_samples, num_leapfrog,
        target_accept,
    )
    return np.asarray(draws), float(np.mean(np.asarray(accs)))
