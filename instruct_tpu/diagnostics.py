"""Convergence and efficiency diagnostics.

* :func:`gelman_rubin` — the PSRF exactly as GelmanRubin()
  (check_converg.c:100-153) computes it: R = V/W with
  V = W (n-1)/n + B/n, pass threshold 1.1 (check_converg.c:52).
* :func:`effective_sample_size` — initial-positive-sequence ESS estimator
  (new capability; the reference has none), used as the numerator of the
  framework's north-star metric (effective samples / sec / chip).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

GR_THRESHOLD = 1.1  # check_converg.c:52


def gelman_rubin(traces) -> jnp.ndarray:
    """PSRF over per-chain traces [n_chains, n_samples] (check_converg.c:
    100-153).  Returns V/W; > 1.1 means "has not converged"."""
    traces = jnp.asarray(traces)
    m, n = traces.shape
    chain_means = traces.mean(axis=1)
    grand = chain_means.mean()
    w = traces.var(axis=1, ddof=1).mean()
    b = n * ((chain_means - grand) ** 2).sum() / (m - 1)
    v = w * (n - 1) / n + b / n
    return v / w


def effective_sample_size_batch(traces) -> jnp.ndarray:
    """Batched on-device Geyer ESS: traces [..., n] -> ESS [...].

    One rfft/irfft over the whole batch computes every autocovariance at
    once; the initial-positive-sequence truncation (stop at the first
    non-positive pair sum rho[2t-1] + rho[2t]) becomes a running
    cumulative-positivity mask instead of a per-parameter Python loop —
    the "diagnostics via on-device vectorized passes" half of the survey's
    L4 mapping (the moments were already streamed on-device)."""
    x = jnp.asarray(traces, jnp.float64 if jnp.array(0.0).dtype
                    == jnp.float64 else jnp.float32)
    n = x.shape[-1]
    if n < 4:
        return jnp.full(x.shape[:-1], float(n))
    x = x - x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1)
    nfft = 1 << (2 * n - 1).bit_length()
    f = jnp.fft.rfft(x, nfft, axis=-1)
    acov = jnp.fft.irfft(f * jnp.conj(f), nfft, axis=-1)[..., :n] / n
    rho = acov / jnp.maximum(acov[..., :1], 1e-30)
    # pair sums P_j = rho[2j+1] + rho[2j+2], j = 0 .. (n-4)//2
    n_pairs = max((n - 2) // 2, 1)
    idx = 1 + 2 * jnp.arange(n_pairs)
    pairs = jnp.take(rho, idx, axis=-1) + jnp.take(rho, idx + 1, axis=-1)
    keep = jnp.cumprod(pairs > 0, axis=-1)
    s = (pairs * keep).sum(axis=-1)
    ess = n / (1.0 + 2.0 * s)
    ess = jnp.minimum(ess, float(n))
    return jnp.where(var == 0, float(n), ess)


def effective_sample_size(trace: np.ndarray) -> float:
    """ESS of a single scalar chain via the initial positive sequence
    (Geyer 1992): ESS = n / (1 + 2 sum rho_t) truncated at the first
    non-positive pair sum.  Thin wrapper over the batched estimator."""
    x = np.asarray(trace)
    if x.size < 4:
        return float(x.size)
    return float(effective_sample_size_batch(x[None])[0])


def ess_per_param(traces: np.ndarray) -> np.ndarray:
    """ESS for each column of [n_samples, n_params] draws (one batched
    on-device pass), summed over chains by the caller."""
    traces = np.atleast_2d(traces)
    return np.asarray(effective_sample_size_batch(traces.T))
