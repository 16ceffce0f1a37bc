"""Iterative NUTS (No-U-Turn Sampler) with multinomial trajectory sampling.

The classic recursive formulation (Hoffman & Gelman 2014) is not
XLA-friendly; this is the iterative variant (Phan et al. 2019, as in
numpyro/blackjax): the trajectory doubles up to a static ``max_depth``,
each new subtree is built one leapfrog step at a time inside a bounded
`lax.while_loop`, within-subtree U-turns are detected with checkpoint
stacks of size max_depth, and the proposal is drawn by progressive
biased-multinomial sampling across subtrees.  Everything is fixed-shape.

Checkpoint scheme (derived from the balanced-subtree structure): a leaf
with even index ``i`` is the start of every balanced interval closing
later, and is stored at slot ``popcount(i >> 1)``; at an odd leaf ``b``,
``ctz(b+1)`` intervals close, occupying the contiguous slot range
``[idx_max - ctz(b+1) + 1, idx_max]`` with
``idx_max = popcount((b-1) >> 1)``.  For each the segment momentum sum is
``msum_now - msum_ckpt + mom_ckpt`` and Betancourt's generalized U-turn
criterion is applied.

This generalizes the reference's fixed random-walk proposals (mcmc.c) and
the fixed-length HMC in samplers/hmc.py: trajectory lengths adapt per
draw.  New capability over the reference (BASELINE.json: "NUTS/HMC over
continuous blocks").
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

_MAX_DELTA_ENERGY = 1000.0  # divergence threshold (Stan's default)


def _tmap(f, *trees):
    return jax.tree.map(f, *trees)


def _dot(a, b):
    return sum(jnp.vdot(x, y) for x, y in
               zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def _randn_like(key, tree):
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(
        treedef, [jax.random.normal(k, x.shape, x.dtype)
                  for k, x in zip(keys, leaves)])


def _stack_zeros(tree, depth):
    return _tmap(lambda x: jnp.zeros((depth,) + x.shape, x.dtype), tree)


def _stack_read(stack, idx):
    return _tmap(lambda s: s[idx], stack)


def _stack_write(stack, idx, val):
    return _tmap(lambda s, v: s.at[idx].set(v), stack, val)


def _popcount(x):
    return jax.lax.population_count(x)


def _ctz(x):
    """Count of trailing zeros of x > 0."""
    return _popcount((x & -x) - 1)


class _Traj(NamedTuple):
    """Trajectory endpoints + progressive-sampling state."""

    pos_l: object
    mom_l: object
    pos_r: object
    mom_r: object
    proposal: object         # current multinomial sample over the trajectory
    log_w: jnp.ndarray       # logsumexp of -(H - H0) over the trajectory
    sum_mom: object          # sum of momenta over the trajectory
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray  # sum of min(1, exp(H0-H)) for adaptation
    n_states: jnp.ndarray


def _is_turning(inv_mass, mom_sum, mom_first, mom_last):
    """Generalized U-turn criterion (Betancourt 2017): the metric
    projection of the segment momentum sum on both end momenta must stay
    positive."""
    v = _tmap(lambda im, m: im * m, inv_mass, mom_sum)
    return (_dot(v, mom_first) <= 0) | (_dot(v, mom_last) <= 0)


def _leapfrog(potential_grad, inv_mass, step, pos, mom, direction):
    eps = step * direction
    _, g = potential_grad(pos)
    mom = _tmap(lambda m, gg: m - 0.5 * eps * gg, mom, g)
    pos = _tmap(lambda p, m, im: p + eps * im * m, pos, mom, inv_mass)
    u, g = potential_grad(pos)
    mom = _tmap(lambda m, gg: m - 0.5 * eps * gg, mom, g)
    return pos, mom, u


def _kinetic(inv_mass, mom):
    return 0.5 * sum(jnp.vdot(m * im, m) for m, im in
                     zip(jax.tree.leaves(mom), jax.tree.leaves(inv_mass)))


def nuts_transition(potential_grad, inv_mass, step, max_depth,
                    position, key):
    """One NUTS draw.  Returns (new_position, mean_accept_prob)."""
    k_mom, k_dir = jax.random.split(key)
    sqrt_mass = _tmap(lambda im: 1.0 / jnp.sqrt(im), inv_mass)
    mom0 = _tmap(lambda r, sm: r * sm, _randn_like(k_mom, position),
                 sqrt_mass)
    u0, _ = potential_grad(position)
    h0 = u0 + _kinetic(inv_mass, mom0)

    traj = _Traj(pos_l=position, mom_l=mom0, pos_r=position, mom_r=mom0,
                 proposal=position, log_w=jnp.zeros(()),
                 sum_mom=mom0, turning=jnp.asarray(False),
                 diverging=jnp.asarray(False),
                 sum_accept=jnp.zeros(()), n_states=jnp.ones((), jnp.int32))

    def build_subtree(depth_j, traj, direction, key):
        """Extend the trajectory end by a subtree of 2^depth_j steps in
        `direction`; returns the subtree summary (not yet merged)."""
        n_steps = jnp.int32(2) ** depth_j
        pos0 = _tmap(lambda a, b: jnp.where(direction > 0, b, a),
                     traj.pos_l, traj.pos_r)
        mom_start = _tmap(lambda a, b: jnp.where(direction > 0, b, a),
                          traj.mom_l, traj.mom_r)

        ck_mom = _stack_zeros(mom_start, max_depth + 1)
        ck_msum = _stack_zeros(mom_start, max_depth + 1)

        sub = _Traj(pos_l=pos0, mom_l=mom_start, pos_r=pos0,
                    mom_r=mom_start, proposal=pos0, log_w=-jnp.inf,
                    sum_mom=_tmap(jnp.zeros_like, mom_start),
                    turning=jnp.asarray(False),
                    diverging=jnp.asarray(False),
                    sum_accept=jnp.zeros(()),
                    n_states=jnp.zeros((), jnp.int32))

        def cond(carry):
            i, sub, *_ = carry
            return (i < n_steps) & ~sub.turning & ~sub.diverging

        def body(carry):
            i, sub, pos, mom, ck_mom, ck_msum = carry
            pos, mom, u = _leapfrog(potential_grad, inv_mass, step, pos,
                                    mom, direction)
            h = u + _kinetic(inv_mass, mom)
            delta = h - h0
            diverging = ~jnp.isfinite(delta) | (delta > _MAX_DELTA_ENERGY)
            log_w_state = jnp.where(diverging, -jnp.inf, -delta)
            accept_p = jnp.where(diverging, 0.0,
                                 jnp.minimum(1.0, jnp.exp(-delta)))

            new_log_w = jnp.logaddexp(sub.log_w, log_w_state)
            take = (jnp.log(jax.random.uniform(
                jax.random.fold_in(key, i), minval=1e-37))
                    < log_w_state - new_log_w)
            proposal = _tmap(lambda new, old: jnp.where(take, new, old),
                             pos, sub.proposal)
            sum_mom = _tmap(lambda s, m: s + m, sub.sum_mom, mom)

            even = (i % 2) == 0
            slot = _popcount(i >> 1)
            ck_mom = _tmap(
                lambda s, v: jnp.where(even, s.at[slot].set(v), s),
                ck_mom, mom)
            ck_msum = _tmap(
                lambda s, v: jnp.where(even, s.at[slot].set(v), s),
                ck_msum, sum_mom)

            # odd leaf b = i: ctz(b+1) intervals close at slots
            # [idx_max - ctz(b+1) + 1, idx_max]
            idx_max = _popcount(jnp.maximum(i - 1, 0) >> 1)
            n_close = _ctz(i + 1)
            idx_min = idx_max - n_close + 1
            turning = sub.turning
            for kk in range(max_depth + 1):
                active = (~even) & (idx_min <= kk) & (kk <= idx_max)
                m_ck = _stack_read(ck_mom, kk)
                ms_ck = _stack_read(ck_msum, kk)
                seg = _tmap(lambda s, s0, m0: s - s0 + m0,
                            sum_mom, ms_ck, m_ck)
                turning = turning | (active
                                     & _is_turning(inv_mass, seg, m_ck,
                                                   mom))

            sub2 = _Traj(pos_l=sub.pos_l, mom_l=sub.mom_l, pos_r=sub.pos_r,
                         mom_r=sub.mom_r, proposal=proposal,
                         log_w=new_log_w, sum_mom=sum_mom,
                         turning=turning,
                         diverging=sub.diverging | diverging,
                         sum_accept=sub.sum_accept + accept_p,
                         n_states=sub.n_states + 1)
            # both subtree "endpoints" track the newest state; the merged
            # trajectory keeps the old far end on the other side
            sub2 = sub2._replace(
                pos_l=_tmap(lambda old, new:
                            jnp.where(direction < 0, new, old),
                            sub2.pos_l, pos),
                mom_l=_tmap(lambda old, new:
                            jnp.where(direction < 0, new, old),
                            sub2.mom_l, mom),
                pos_r=_tmap(lambda old, new:
                            jnp.where(direction > 0, new, old),
                            sub2.pos_r, pos),
                mom_r=_tmap(lambda old, new:
                            jnp.where(direction > 0, new, old),
                            sub2.mom_r, mom))
            return (i + 1, sub2, pos, mom, ck_mom, ck_msum)

        out = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), sub, pos0, mom_start,
                         ck_mom, ck_msum))
        return out[1]

    def doubling_cond(carry):
        j, traj, _key = carry
        return (j < max_depth) & ~traj.turning & ~traj.diverging

    def doubling_body(carry):
        j, traj, key = carry
        kd, ks, kn = jax.random.split(jax.random.fold_in(key, j), 3)
        direction = jnp.where(jax.random.bernoulli(kd), 1.0, -1.0)
        sub = build_subtree(j, traj, direction, kn)

        # biased progressive sampling between old trajectory and subtree
        take = (jnp.log(jax.random.uniform(ks, minval=1e-37))
                < jnp.minimum(0.0, sub.log_w - traj.log_w))
        take = take & ~sub.turning & ~sub.diverging
        proposal = _tmap(lambda new, old: jnp.where(take, new, old),
                         sub.proposal, traj.proposal)

        pos_l = _tmap(lambda old, new: jnp.where(direction < 0, new, old),
                      traj.pos_l, sub.pos_l)
        mom_l = _tmap(lambda old, new: jnp.where(direction < 0, new, old),
                      traj.mom_l, sub.mom_l)
        pos_r = _tmap(lambda old, new: jnp.where(direction > 0, new, old),
                      traj.pos_r, sub.pos_r)
        mom_r = _tmap(lambda old, new: jnp.where(direction > 0, new, old),
                      traj.mom_r, sub.mom_r)
        sum_mom = _tmap(lambda a, b: a + b, traj.sum_mom, sub.sum_mom)
        turning = (sub.turning
                   | _is_turning(inv_mass, sum_mom, mom_l, mom_r))
        new = _Traj(pos_l=pos_l, mom_l=mom_l, pos_r=pos_r, mom_r=mom_r,
                    proposal=proposal,
                    log_w=jnp.logaddexp(traj.log_w, sub.log_w),
                    sum_mom=sum_mom, turning=turning,
                    diverging=traj.diverging | sub.diverging,
                    sum_accept=traj.sum_accept + sub.sum_accept,
                    n_states=traj.n_states + sub.n_states)
        return (j + 1, new, key)

    _, traj, _ = jax.lax.while_loop(
        doubling_cond, doubling_body,
        (jnp.zeros((), jnp.int32), traj, k_dir))
    mean_accept = traj.sum_accept / jnp.maximum(
        traj.n_states.astype(jnp.float32) - 1.0, 1.0)
    return traj.proposal, jnp.clip(mean_accept, 0.0, 1.0)


@dataclasses.dataclass
class NutsConfig:
    n_warmup: int = 300
    n_samples: int = 300
    max_depth: int = 8
    target_accept: float = 0.8
    init_step: float = 0.05


def run_nuts(potential: Callable, init_position, key, config: NutsConfig,
             collect: Callable = lambda p: p):
    """Single-chain NUTS with Stan-style windowed warmup (dual-averaging
    step size, then diagonal-mass re-estimation and step re-adaptation,
    as in samplers/hmc.py).  vmap over chains at the call site.
    Returns (samples, mean_accept, final_position)."""
    potential_grad = jax.value_and_grad(potential)
    zeros = jax.tree.map(jnp.zeros_like, init_position)
    ones = jax.tree.map(jnp.ones_like, init_position)

    def warmup_phase(position, inv_mass, log_eps0, key, n):
        mu = jnp.log(10.0) + log_eps0

        def body(carry, i):
            pos, log_eps, h, logeps_bar, wmean, wm2 = carry
            step = jnp.exp(log_eps)
            pos, pa = nuts_transition(potential_grad, inv_mass, step,
                                      config.max_depth, pos,
                                      jax.random.fold_in(key, i))
            cnt = i.astype(jnp.float32) + 1.0
            h = ((1.0 - 1.0 / (cnt + 10.0)) * h
                 + (config.target_accept - pa) / (cnt + 10.0))
            log_eps = mu - jnp.sqrt(cnt) / 0.05 * h
            eta = cnt ** -0.75
            logeps_bar = eta * log_eps + (1 - eta) * logeps_bar
            delta = jax.tree.map(lambda p, m: p - m, pos, wmean)
            wmean = jax.tree.map(lambda m, d: m + d / cnt, wmean, delta)
            delta2 = jax.tree.map(lambda p, m: p - m, pos, wmean)
            wm2 = jax.tree.map(lambda m2, d, d2: m2 + d * d2, wm2, delta,
                               delta2)
            return (pos, log_eps, h, logeps_bar, wmean, wm2), None

        carry = (position, log_eps0, jnp.zeros(()), log_eps0, zeros, zeros)
        (pos, _, _, logeps_bar, _wmean, wm2), _ = jax.lax.scan(
            body, carry, jnp.arange(n, dtype=jnp.int32))
        var = jax.tree.map(lambda m2: m2 / jnp.maximum(n - 1.0, 1.0), wm2)
        return pos, logeps_bar, var

    k1, k2, k3 = jax.random.split(key, 3)
    n1 = config.n_warmup // 2
    log_eps0 = jnp.log(jnp.asarray(config.init_step))
    pos, logeps_bar, var = warmup_phase(init_position, ones, log_eps0,
                                        k1, n1)
    inv_mass = jax.tree.map(lambda v: jnp.maximum(v, 1e-6), var)
    pos, logeps_bar, _ = warmup_phase(pos, inv_mass, logeps_bar, k2,
                                      config.n_warmup - n1)
    step = jnp.exp(logeps_bar)

    def samp_body(pos, i):
        pos, pa = nuts_transition(potential_grad, inv_mass, step,
                                  config.max_depth, pos,
                                  jax.random.fold_in(k3, i))
        return pos, (collect(pos), pa)

    pos, (samples, pas) = jax.lax.scan(
        samp_body, pos, jnp.arange(config.n_samples, dtype=jnp.int32))
    return samples, pas.mean(), pos
