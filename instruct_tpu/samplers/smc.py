"""Tempered sequential Monte Carlo with systematic resampling.

Particles are a leading vmapped axis (the framework's "particle parallel"
row, survey §2.2), shardable over the mesh's "chain" axis; resampling is a
single `jnp.searchsorted` gather after an (all-)gathered weight normalize —
with sharded particles XLA turns the weight reductions into psums.

Anneals the marginalized posterior p(theta)^beta from prior (beta=0) to
posterior (beta=1) on a fixed geometric ladder, mutating with a few
random-walk MH steps per temperature (HMC mutation would also slot in).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class SmcConfig:
    n_particles: int = 128
    n_temps: int = 20
    n_mh_steps: int = 5
    rw_scale: float = 0.02


def _systematic_resample(key, log_w, n):
    """Systematic resampling: one uniform, stratified positions, inverse-CDF
    via searchsorted — deterministic given (key, weights)."""
    w = jax.nn.softmax(log_w)
    cum = jnp.cumsum(w)
    u = (jax.random.uniform(key) + jnp.arange(n)) / n
    return jnp.clip(jnp.searchsorted(cum, u), 0, n - 1)


def run_smc(log_joint: Callable, log_prior: Callable, init_particles,
            key, config: SmcConfig):
    """init_particles: pytree with leading axis n_particles (drawn from the
    prior).  Returns (final particles, log marginal-likelihood estimate,
    effective sample sizes per temperature)."""
    n = config.n_particles
    betas = jnp.linspace(0.0, 1.0, config.n_temps + 1)[1:]

    def log_like(theta):
        return log_joint(theta) - log_prior(theta)

    v_loglike = jax.vmap(log_like)
    v_logprior = jax.vmap(log_prior)

    def mutate(key, particles, beta):
        """Random-walk MH targeting prior * like^beta."""
        def one_step(carry, i):
            particles, = carry
            kk = jax.random.fold_in(key, i)
            kp, ka = jax.random.split(kk)
            leaves, treedef = jax.tree.flatten(particles)
            keys = jax.random.split(kp, len(leaves))
            prop = jax.tree.unflatten(
                treedef,
                [x + config.rw_scale * jax.random.normal(k2, x.shape)
                 for k2, x in zip(keys, leaves)])
            lp_cur = v_logprior(particles) + beta * v_loglike(particles)
            lp_prop = v_logprior(prop) + beta * v_loglike(prop)
            acc = (jnp.log(jax.random.uniform(ka, (n,), minval=1e-30))
                   < lp_prop - lp_cur)
            particles = jax.tree.map(
                lambda pr, cu: jnp.where(
                    acc.reshape((-1,) + (1,) * (pr.ndim - 1)), pr, cu),
                prop, particles)
            return (particles,), None

        (particles,), _ = jax.lax.scan(
            one_step, (particles,),
            jnp.arange(config.n_mh_steps, dtype=jnp.int32))
        return particles

    def temp_step(carry, inp):
        particles, logz = carry
        i, beta, prev_beta = inp
        kk = jax.random.fold_in(key, i)
        kr, km = jax.random.split(kk)
        incr = (beta - prev_beta) * v_loglike(particles)
        logz = logz + jax.nn.logsumexp(incr) - jnp.log(float(n))
        log_w = incr - jax.nn.logsumexp(incr)
        ess = jnp.exp(-jax.nn.logsumexp(2.0 * log_w))
        idx = _systematic_resample(kr, log_w, n)
        particles = jax.tree.map(lambda x: x[idx], particles)
        particles = mutate(km, particles, beta)
        return (particles, logz), ess

    prev = jnp.concatenate([jnp.zeros(1), betas[:-1]])
    (particles, logz), esses = jax.lax.scan(
        temp_step, (init_particles, jnp.zeros(())),
        (jnp.arange(config.n_temps, dtype=jnp.int32), betas, prev))
    return particles, logz, esses
