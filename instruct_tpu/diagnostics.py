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


def effective_sample_size(trace: np.ndarray, max_lag: int | None = None
                          ) -> float:
    """ESS of a single scalar chain via the initial positive sequence
    (Geyer 1992): ESS = n / (1 + 2 sum rho_t) truncated at the first
    non-positive pair sum."""
    x = np.asarray(trace, dtype=np.float64)
    n = x.size
    if n < 4:
        return float(n)
    x = x - x.mean()
    var = x.var()
    if var == 0:
        return float(n)
    if max_lag is None:
        max_lag = n - 2
    # FFT autocovariance
    nfft = 1 << (2 * n - 1).bit_length()
    f = np.fft.rfft(x, nfft)
    acov = np.fft.irfft(f * np.conj(f), nfft)[: n] / n
    rho = acov / acov[0]
    # Geyer initial positive sequence over pairs (rho[2t-1] + rho[2t])
    s = 0.0
    t = 1
    while t + 1 <= max_lag:
        pair = rho[t] + rho[t + 1]
        if pair <= 0:
            break
        s += pair
        t += 2
    ess = n / (1.0 + 2.0 * s)
    return float(min(ess, n))


def ess_per_param(traces: np.ndarray) -> np.ndarray:
    """ESS for each column of [n_samples, n_params] draws, summed over
    chains by the caller."""
    traces = np.atleast_2d(traces)
    return np.array([effective_sample_size(traces[:, j])
                     for j in range(traces.shape[1])])
