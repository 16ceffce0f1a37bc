"""Stochastic variational inference (ADVI) over the marginalized model.

Mean-field Gaussian in unconstrained space; reparameterized ELBO gradients
with optax Adam.  The whole update is one jitted step; multi-sample ELBO
uses a vmapped leading axis.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass
class SviConfig:
    n_steps: int = 500
    n_elbo_samples: int = 4
    learning_rate: float = 0.02


def run_svi(log_joint: Callable, init_position, key, config: SviConfig):
    """Returns (variational mean pytree, log-std pytree, elbo trace)."""
    mu = jax.tree.map(jnp.asarray, init_position)
    log_sigma = jax.tree.map(lambda x: jnp.full_like(x, -3.0), mu)
    params = (mu, log_sigma)
    opt = optax.adam(config.learning_rate)
    opt_state = opt.init(params)

    def sample_one(params, key):
        mu, log_sigma = params
        leaves, treedef = jax.tree.flatten(mu)
        keys = jax.random.split(key, len(leaves))
        eps = jax.tree.unflatten(
            treedef, [jax.random.normal(k, x.shape) for k, x in
                      zip(keys, leaves)])
        z = jax.tree.map(lambda m, ls, e: m + jnp.exp(ls) * e, mu,
                         log_sigma, eps)
        # entropy of the Gaussian: sum(log_sigma) + const
        ent = sum(ls.sum() for ls in jax.tree.leaves(log_sigma))
        return log_joint(z) + ent

    def neg_elbo(params, key):
        keys = jax.random.split(key, config.n_elbo_samples)
        return -jnp.mean(jax.vmap(lambda k: sample_one(params, k))(keys))

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(neg_elbo)(params, key)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    def body(carry, i):
        params, opt_state = carry
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.fold_in(key, i))
        return (params, opt_state), loss

    (params, _), trace = jax.lax.scan(
        body, (params, opt_state),
        jnp.arange(config.n_steps, dtype=jnp.int32))
    mu, log_sigma = params
    return mu, log_sigma, -trace
