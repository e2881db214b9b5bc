"""SDE library: VP / sub-VP / VE SDEs and the Grad-TTS SpeechSDE.

Behavioral parity targets: /root/reference/n_best/likelihood/sde_lib.py —
SDE/RSDE (:7-109), VPSDE (:112-164), subVPSDE (:167-204), VESDE (:207-254),
SPEECHSDE with text-conditional mean drift 0.5*beta*(mu - x) (:256-297).

Pure-jnp redesign: each SDE is a frozen dataclass of scalars (+ the speech
conditioning arrays); all methods are jit-safe. The reverse (probability
flow) drift is a function, not a subclass factory.

Array layout: time-major mels [B, T, F] (the reference uses [B, F, T]; the
math is elementwise / reduced over all non-batch axes, so only prior_logp's
constant N term depends on shape — identical either way).
"""

import math
from dataclasses import dataclass, field
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VPSDE:
    beta_min: float = 0.1
    beta_max: float = 20.0
    N: int = 1000

    @property
    def T(self):
        return 1.0

    def beta(self, t):
        return self.beta_min + t * (self.beta_max - self.beta_min)

    def sde(self, x, t):
        beta_t = self.beta(t)
        drift = -0.5 * _bcast(beta_t, x) * x
        diffusion = jnp.sqrt(beta_t)
        return drift, diffusion

    def marginal_prob(self, x, t):
        lmc = -0.25 * t ** 2 * (self.beta_max - self.beta_min) \
            - 0.5 * t * self.beta_min
        mean = _bcast(jnp.exp(lmc), x) * x
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * lmc))
        return mean, std

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape)

    def prior_logp(self, z):
        n = _event_size(z)
        return -n / 2.0 * math.log(2 * math.pi) - _event_sum(z ** 2) / 2.0

    def discretize(self, x, t):
        """Euler-Maruyama discretization (parity: sde_lib.py:52-68)."""
        dt = 1.0 / self.N
        drift, diffusion = self.sde(x, t)
        return drift * dt, diffusion * math.sqrt(dt)


@dataclass(frozen=True)
class SubVPSDE(VPSDE):
    def sde(self, x, t):
        beta_t = self.beta(t)
        drift = -0.5 * _bcast(beta_t, x) * x
        discount = 1.0 - jnp.exp(-2 * self.beta_min * t
                                 - (self.beta_max - self.beta_min) * t ** 2)
        diffusion = jnp.sqrt(beta_t * discount)
        return drift, diffusion

    def marginal_prob(self, x, t):
        lmc = -0.25 * t ** 2 * (self.beta_max - self.beta_min) \
            - 0.5 * t * self.beta_min
        mean = _bcast(jnp.exp(lmc), x) * x
        std = 1.0 - jnp.exp(2.0 * lmc)
        return mean, std


@dataclass(frozen=True)
class VESDE:
    sigma_min: float = 0.01
    sigma_max: float = 50.0
    N: int = 1000

    @property
    def T(self):
        return 1.0

    def sde(self, x, t):
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        drift = jnp.zeros_like(x)
        diffusion = sigma * math.sqrt(
            2 * (math.log(self.sigma_max) - math.log(self.sigma_min)))
        return drift, diffusion

    def marginal_prob(self, x, t):
        std = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        return x, std

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape) * self.sigma_max

    def prior_logp(self, z):
        n = _event_size(z)
        return (-n / 2.0 * math.log(2 * math.pi * self.sigma_max ** 2)
                - _event_sum(z ** 2) / (2 * self.sigma_max ** 2))


@dataclass(frozen=True)
class SpeechSDE(VPSDE):
    """VP-SDE with text-conditional mean: dx = 0.5*beta*(mu - x)dt + sqrt(beta)dW
    (parity: sde_lib.py:256-297). ``mu``/``mask`` are [B, T, F] / [B, T, 1]."""
    mu: jnp.ndarray = None
    mask: jnp.ndarray = None
    spk: Optional[jnp.ndarray] = None

    def sde(self, x, t):
        beta_t = self.beta(t)
        drift = 0.5 * _bcast(beta_t, x) * (self.mu - x)
        diffusion = jnp.sqrt(beta_t)
        return drift, diffusion

    def marginal_prob(self, x, t):
        lmc = -0.25 * t ** 2 * (self.beta_max - self.beta_min) \
            - 0.5 * t * self.beta_min
        decay = _bcast(jnp.exp(lmc), x)
        mean = decay * x + (1.0 - decay) * self.mu
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * lmc))
        return mean, std

    def prior_sampling(self, key, shape=None):
        return self.mu + jax.random.normal(key, self.mu.shape)

    def prior_logp(self, z):
        # constant uses the full (padded) event size, matching the reference
        n = _event_size(z)
        return (-n / 2.0 * math.log(2 * math.pi)
                - _event_sum((z - self.mu) ** 2) / 2.0)


def reverse_drift_fn(sde, score_fn: Callable, probability_flow: bool = True):
    """Drift of the reverse-time SDE/ODE (parity: sde_lib.py:70-109).
    score_fn(x, t) -> score with the model's own sigma-normalization
    (utils_sde.py:160: 'assume grad-tts score model already does this')."""
    mult = 0.5 if probability_flow else 1.0

    def drift(x, t):
        f, g = sde.sde(x, t)
        score = score_fn(x, t)
        return f - _bcast(g ** 2, x) * score * mult

    return drift


def _bcast(t, x):
    """Broadcast per-batch scalar t over the event dims of x."""
    t = jnp.asarray(t)
    if t.ndim == 0:
        return t
    return t.reshape(t.shape + (1,) * (x.ndim - t.ndim))


def _event_size(z):
    n = 1
    for s in z.shape[1:]:
        n *= s
    return n


def _event_sum(z):
    return jnp.sum(z, axis=tuple(range(1, z.ndim)))
