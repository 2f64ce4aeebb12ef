"""DDPM/DDIM schedules and timestep embeddings (numpy, precomputed).

Ports the *math* of the reference's diffusion hyperparameters
(`pointcept/models/default.py:75-226`, `pointcept/utils/comm.py:21-39`):
beta schedules (linear / cosine / sigmoid / laplace), cumulative alphas,
posterior sigmas, SNR, the q_sample forward-noising rule, the DDIM reverse
step, and the sinusoidal timestep embedding.

Quirk preserved intentionally: the reference's "cosine" schedule evaluates
``t = linspace(start, stop, T+1) / T`` with (start, stop) taken from the
*beta* config values — CDSegNet configs use beta_start=0, beta_end=1000 so t
spans [0, 1] (`configs/scannet/CDSegNet.py:25-27`, `default.py:139-149`).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


def get_betas(schedule: str, start: float, stop: float, T: int) -> np.ndarray:
    if schedule == "linear":
        scale = 1000.0 / T
        return np.linspace(scale * start, scale * stop, T, dtype=np.float64)
    if schedule == "cosine":
        s = 0.008
        t = np.linspace(start, stop, T + 1, dtype=np.float64) / T
        ac = np.cos((t + s) / (1 + s) * math.pi * 0.5) ** 2
        ac = ac / ac[0]
        betas = 1.0 - ac[1:] / ac[:-1]
        return np.clip(betas, 0.0, 0.999)
    if schedule == "sigmoid":
        lo, hi, tau = -3.0, 3.0, 1.0
        t = np.linspace(0, T, T + 1, dtype=np.float64) / T
        sig = lambda x: 1.0 / (1.0 + np.exp(-x))
        v_start, v_end = sig(lo / tau), sig(hi / tau)
        ac = (-sig((t * (hi - lo) + lo) / tau) + v_end) / (v_end - v_start)
        ac = ac / ac[0]
        betas = 1.0 - ac[1:] / ac[:-1]
        return np.clip(betas, 0.0, 0.999)
    if schedule == "laplace":
        mu, b = 0.0, 0.5
        t = np.linspace(0, 1, 1002, dtype=np.float64)[1:-1]
        lmb = mu - b * np.sign(0.5 - t) * np.log(1 - 2 * np.abs(0.5 - t))
        snr = np.exp(lmb)
        ac = snr / (1 + snr)
        ac = ac / ac[0]
        betas = 1.0 - ac[1:] / ac[:-1]
        return np.clip(betas, 0.0, 0.999)
    raise NotImplementedError(schedule)


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed tables, all shape (T,), float32."""

    T: int
    betas: np.ndarray
    alphas: np.ndarray
    alpha_bar: np.ndarray
    sigma: np.ndarray
    snr: np.ndarray

    @classmethod
    def create(
        cls,
        schedule: str = "cosine",
        beta_start: float = 0.0,
        beta_end: float = 1000.0,
        T: int = 1000,
        min_snr: float | None = None,
    ) -> "DiffusionSchedule":
        betas = get_betas(schedule, beta_start, beta_end, T)
        alphas = 1.0 - betas
        alpha_bar = np.cumprod(alphas)
        prev = np.concatenate([[1.0], alpha_bar[:-1]])
        beta_tilde = betas * (1 - prev) / (1 - alpha_bar)
        sigma = np.sqrt(beta_tilde)
        sigma[0] = 0.0
        snr = alpha_bar / (1 - alpha_bar)
        if min_snr is not None:
            snr = np.clip(snr, None, min_snr)
        f32 = lambda x: x.astype(np.float32)
        return cls(T, f32(betas), f32(alphas), f32(alpha_bar), f32(sigma), f32(snr))

    def q_sample(self, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray):
        """x_t = sqrt(ab_t) x0 + sqrt(1-ab_t) eps (reference `:216-222`)."""
        ab = jnp.asarray(self.alpha_bar)[t]
        ab = ab.reshape(ab.shape + (1,) * (x0.ndim - ab.ndim))
        return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * noise

    def ddim_step(
        self,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        model_out: jnp.ndarray,
        target: str = "noise",
    ) -> jnp.ndarray:
        """Deterministic DDIM reverse step (reference `:192-214`).

        ``t`` is a per-point (or scalar) integer step; t == 0 returns x0.
        """
        ab = jnp.asarray(self.alpha_bar)
        ab_t = ab[t]
        ab_t = ab_t.reshape(ab_t.shape + (1,) * (x_t.ndim - ab_t.ndim))
        if target == "noise":
            noise = model_out
            x0 = (x_t - jnp.sqrt(1.0 - ab_t) * noise) / jnp.sqrt(ab_t)
        elif target == "x0":
            x0 = model_out
            noise = (x_t - jnp.sqrt(ab_t) * x0) / jnp.sqrt(1.0 - ab_t)
        else:
            raise ValueError(target)
        t_prev = jnp.maximum(t - 1, 0)
        ab_p = ab[t_prev]
        ab_p = ab_p.reshape(ab_p.shape + (1,) * (x_t.ndim - ab_p.ndim))
        x_prev = jnp.sqrt(ab_p) * x0 + jnp.sqrt(1.0 - ab_p) * noise
        is_zero = (t == 0).reshape((-1,) + (1,) * (x_t.ndim - 1))
        return jnp.where(is_zero, x0, x_prev)


def time_schedule(T: int = 1000, step: int = 5) -> np.ndarray:
    """DDIM sampling schedule: `linspace(-1, T-1, step+1)` reversed
    (reference `:224-226`)."""
    return np.linspace(-1, T - 1, num=step + 1, dtype=int)[::-1].copy()


def calc_t_emb(ts: jnp.ndarray, t_emb_dim: int) -> jnp.ndarray:
    """Sinusoidal timestep embedding (reference `comm.py:21-39`).

    ts: (B,) or (B, 1) integer steps -> (B, t_emb_dim) float32.
    """
    assert t_emb_dim % 2 == 0
    if ts.ndim == 1:
        ts = ts[:, None]
    half = t_emb_dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1))
    )
    ang = ts.astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)
