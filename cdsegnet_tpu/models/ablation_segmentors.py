"""NCF ablation segmentors — the paper's framework matrix beyond CNF.

Reference `pointcept/models/default.py`:
- ③ `ContinuousDMSegmentor` (CN + GD, `:497-947`): Gaussian diffusion on the
  *semantic* branch — labels enter as log-one-hot, are q-sampled, and the
  n-branch predicts the noise; the c-branch is the clean conditional input.
  (Reference quirk preserved: the timestep embedding is computed but never
  consumed, because only c-branch blocks own a `t_mlp` and the embedding is
  attached to the n side.)
- ④ `CCDMSegmentor` (GD + GD, `:952-1363`): both branches diffused — features
  on the c side, log-one-hot labels on the n side.
- ⑤ `DiscreteDMSegmentor` (CN + CD, `:1366-1993`): D3PM categorical
  diffusion with a uniform transition matrix — labels are resampled through
  q(x_t|x_0) = a_bar_t * onehot + (1 - a_bar_t)/K, the branch receives the
  noised one-hot and is trained to recover x_0 (CE), the semantic branch
  reads segmentation as usual.
- ⑥ `CDDMSegmentor` (GD + CD, `:1996-2670`): Gaussian diffusion on features
  + categorical diffusion on labels.
- `DMSegmentor` (`:2673-3269`): single-branch D3PM variant.

Multi-step inference for these families goes through the same DDIM /
posterior-resampling loops as the reference; SSI applies where the semantic
branch stays clean (③⑤ read it directly, like CNF).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cdsegnet_tpu.models.diffusion import DiffusionSchedule, calc_t_emb
from cdsegnet_tpu.models.structure import PointBatch

EPS = 1e-6


def labels_to_log_onehot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """log(one_hot(y) + eps) — the reference's continuous label embedding
    (`default.py:912`). Ignore-index rows produce the all-eps row."""
    oh = jax.nn.one_hot(jnp.clip(labels, 0, num_classes - 1), num_classes)
    oh = jnp.where((labels >= 0)[:, None], oh, 0.0)
    return jnp.log(oh + EPS)


class _DiffusionBase(nn.Module):
    backbone: nn.Module
    num_classes: int = 20
    T: int = 1000
    beta_start: float = 0.0
    beta_end: float = 1000.0
    noise_schedule: str = "cosine"
    t_dim: int = 128
    dm: bool = True
    dm_input: str = "xt"
    dm_target: str = "noise"
    dm_min_snr: Optional[float] = None
    condition: bool = True
    c_in_channels: int = 6

    def setup(self):
        if self.dm:
            self.schedule = DiffusionSchedule.create(
                self.noise_schedule, self.beta_start, self.beta_end, self.T,
                self.dm_min_snr,
            )

    def _sample_ts(self, point: PointBatch):
        key = self.make_rng("diffusion")
        k_t, k_n = jax.random.split(key)
        ts_scene = jax.random.randint(
            k_t, (point.num_scenes,), 0, self.T, dtype=jnp.int32
        )
        ts_pt = jnp.take(ts_scene, jnp.clip(point.batch, 0, point.num_scenes - 1))
        return ts_scene, ts_pt, k_n

    def _t_emb(self, ts_scene, batch):
        emb = calc_t_emb(ts_scene, self.t_dim)
        return jnp.take(emb, jnp.clip(batch, 0, ts_scene.shape[0] - 1), axis=0)

    def _c_x0(self, point: PointBatch) -> jnp.ndarray:
        if point.feat.shape[-1] == self.c_in_channels:
            return point.feat
        return point.coord


class ContinuousDMSegmentor(_DiffusionBase):
    """③ CN + GD: Gaussian diffusion on *labels* (as log-one-hot).

    Branch mapping in this rebuild: the diffused label signal rides the
    c-branch (whose blocks carry t_mlps and whose head width equals
    ``c_in_channels = num_classes``); the clean features ride the n-branch
    and produce segmentation logits. (The reference attaches the timestep
    embedding to a branch without t_mlps, silently discarding it — here the
    embedding is actually consumed.)
    """

    def __call__(self, point: PointBatch, train: bool = True) -> Dict[str, Any]:
        seg_valid = point.mask & (point.segment >= 0)
        out: Dict[str, Any] = {}
        x0 = labels_to_log_onehot(point.segment, self.num_classes)
        target = x0
        feat_t = x0
        t_emb = None
        if self.dm:
            ts_scene, ts_pt, k_n = self._sample_ts(point)
            noise = jax.random.normal(k_n, x0.shape, jnp.float32)
            feat_t = self.schedule.q_sample(x0, ts_pt, noise)
            if self.dm_target == "noise":
                target = noise
            if self.t_dim != -1:
                t_emb = self._t_emb(ts_scene, point.batch)
            if self.dm_min_snr is not None:
                out["snr_loss_weight"] = jnp.asarray(self.schedule.snr)[ts_pt]
        c_point = point.replace(feat=feat_t)
        c_out, n_out = self.backbone(point, c_point, t_emb=t_emb, train=train)
        out.update(
            c_pred=c_out.feat,
            c_target=target,
            n_pred=n_out.feat,
            n_target=point.segment,
            seg_valid=seg_valid,
        )
        return out

    def inference(self, point: PointBatch, noise=None) -> Dict[str, Any]:
        """SSI-style: label branch from noise at t=T-1, read CN logits."""
        if noise is None:
            noise = jax.random.normal(
                self.make_rng("diffusion"),
                (point.num_points, self.num_classes), jnp.float32,
            )
        ts_scene = jnp.full((point.num_scenes,), self.T - 1, jnp.int32)
        t_emb = self._t_emb(ts_scene, point.batch) if self.t_dim != -1 else None
        c_point = point.replace(feat=noise)
        _, n_out = self.backbone(point, c_point, t_emb=t_emb, train=False)
        return dict(
            seg_logits=n_out.feat,
            seg_valid=point.mask & (point.segment >= 0)
            if point.segment is not None else point.mask,
        )

    def denoise_step(self, point: PointBatch, state: jnp.ndarray, t: jnp.ndarray):
        """Gaussian DDIM on the label-space state (reference
        `default.py:730-810`); clean features condition every step."""
        ts_scene = jnp.full((point.num_scenes,), t, jnp.int32)
        t_emb = self._t_emb(ts_scene, point.batch) if self.t_dim != -1 else None
        c_out, n_out = self.backbone(
            point, point.replace(feat=state), t_emb=t_emb, train=False
        )
        ts_pt = jnp.full((point.num_points,), t, jnp.int32)
        x_prev = self.schedule.ddim_step(
            state, ts_pt, c_out.feat, target=self.dm_target
        )
        return dict(state=x_prev, n_logits=n_out.feat, x0_logits=x_prev)


class CCDMSegmentor(_DiffusionBase):
    """④ GD + GD: both branches diffused (features + log-one-hot labels)."""

    def __call__(self, point: PointBatch, train: bool = True) -> Dict[str, Any]:
        seg_valid = point.mask & (point.segment >= 0)
        out: Dict[str, Any] = {}
        c_x0 = self._c_x0(point)
        n_x0 = labels_to_log_onehot(point.segment, self.num_classes)
        ts_scene, ts_pt, k_n = self._sample_ts(point)
        k1, k2 = jax.random.split(k_n)
        c_noise = jax.random.normal(k1, c_x0.shape, jnp.float32)
        n_noise = jax.random.normal(k2, n_x0.shape, jnp.float32)
        c_point = point.replace(feat=self.schedule.q_sample(c_x0, ts_pt, c_noise))
        n_point = point.replace(feat=self.schedule.q_sample(n_x0, ts_pt, n_noise))
        t_emb = self._t_emb(ts_scene, point.batch) if self.t_dim != -1 else None
        c_out, n_out = self.backbone(n_point, c_point, t_emb=t_emb, train=train)
        out.update(
            c_pred=c_out.feat,
            c_target=c_noise if self.dm_target == "noise" else c_x0,
            n_pred=n_out.feat,
            n_target=point.segment,
            seg_valid=seg_valid,
        )
        return out

    def inference(self, point: PointBatch, noise=None) -> Dict[str, Any]:
        key = self.make_rng("diffusion")
        k1, k2 = jax.random.split(key)
        c_noise = jax.random.normal(
            k1, (point.num_points, self.c_in_channels), jnp.float32
        )
        n_noise = jax.random.normal(
            k2, (point.num_points, self.num_classes), jnp.float32
        )
        ts_scene = jnp.full((point.num_scenes,), self.T - 1, jnp.int32)
        t_emb = self._t_emb(ts_scene, point.batch) if self.t_dim != -1 else None
        _, n_out = self.backbone(
            point.replace(feat=n_noise), point.replace(feat=c_noise),
            t_emb=t_emb, train=False,
        )
        return dict(
            seg_logits=n_out.feat,
            seg_valid=point.mask & (point.segment >= 0)
            if point.segment is not None else point.mask,
        )

    def denoise_step(self, point: PointBatch, state, t: jnp.ndarray):
        """④: Gaussian DDIM on both branches (reference `default.py:1185-1276`).

        ``state = (c_feat, n_feat)`` — features and log-one-hot labels. The
        feature branch steps through the configured ``dm_target``; the label
        branch's x0 estimate is taken in log-prob space from the semantic
        logits (our n head predicts logits, not noise — conscious deviation,
        documented in the class docstring)."""
        c_feat, n_feat = state
        ts_scene = jnp.full((point.num_scenes,), t, jnp.int32)
        t_emb = self._t_emb(ts_scene, point.batch) if self.t_dim != -1 else None
        c_out, n_out = self.backbone(
            point.replace(feat=n_feat), point.replace(feat=c_feat),
            t_emb=t_emb, train=False,
        )
        ts_pt = jnp.full((point.num_points,), t, jnp.int32)
        c_prev = self.schedule.ddim_step(
            c_feat, ts_pt, c_out.feat, target=self.dm_target
        )
        n_x0 = jnp.log(jax.nn.softmax(n_out.feat, axis=-1) + EPS)
        n_prev = self.schedule.ddim_step(n_feat, ts_pt, n_x0, target="x0")
        return dict(
            state=(c_prev, n_prev), n_logits=n_out.feat, x0_logits=n_out.feat
        )


class _D3PMMixin:
    """Uniform-transition D3PM (Austin et al. 2021): closed-form cumulative
    transitions, no K x K matrix chains (reference builds explicit transition
    matrices, `default.py:1416-1570`)."""

    def _alpha_bar(self):
        return jnp.asarray(self.schedule.alpha_bar)

    def d3pm_q_sample(self, labels: jnp.ndarray, ts_pt: jnp.ndarray, key):
        """Sample x_t ~ q(x_t | x_0): keep with prob a_bar_t, else uniform."""
        ab = self._alpha_bar()[ts_pt]
        k_keep, k_unif = jax.random.split(key)
        keep = jax.random.bernoulli(k_keep, jnp.clip(ab, 0.0, 1.0))
        unif = jax.random.randint(
            k_unif, labels.shape, 0, self.num_classes, dtype=labels.dtype
        )
        safe = jnp.clip(labels, 0, self.num_classes - 1)
        return jnp.where(keep, safe, unif)

    def d3pm_posterior_logits(self, x0_logits, x_t, ts_pt):
        """log q(x_{t-1} | x_t, x0_hat) with uniform transitions
        (reference `q_posterior_logits`)."""
        k = self.num_classes
        ab = self._alpha_bar()
        a_t = jnp.asarray(self.schedule.alphas)[ts_pt][:, None]
        ab_prev = ab[jnp.maximum(ts_pt - 1, 0)][:, None]
        x0_prob = jax.nn.softmax(x0_logits, axis=-1)
        xt_oh = jax.nn.one_hot(x_t, k)
        # fact1: x_t transition row; fact2: x0 cumulative to t-1
        fact1 = a_t * xt_oh + (1 - a_t) / k
        fact2 = ab_prev * x0_prob + (1 - ab_prev) / k
        logits = jnp.log(fact1 * fact2 + EPS)
        t0 = (ts_pt == 0)[:, None]
        return jnp.where(t0, jnp.log(x0_prob + EPS), logits)

    def d3pm_posterior_pair(self, x0_logits, labels, x_t, ts_pt):
        """(true, predicted) posterior logits for the KL training term
        (reference `default.py:1966-1991`): the true posterior conditions on
        the clean labels as a (near-)delta distribution."""
        true_q = self.d3pm_posterior_logits(
            labels_to_log_onehot(labels, self.num_classes), x_t, ts_pt
        )
        pred_q = self.d3pm_posterior_logits(x0_logits, x_t, ts_pt)
        return true_q, pred_q

    def d3pm_ddim_sample(self, x0_logits, t, key):
        """x_{t-1} ~ softmax(x0_hat) @ Qbar_{t-1}, Gumbel-argmax sampled
        (reference `discrete_p_ddim_sample`, `default.py:1754-1784`); with
        uniform transitions the matrix product is the closed form
        ``ab_{t-1} * p(x0) + (1 - ab_{t-1}) / K``. ``t`` is a scalar step;
        t == 0 returns argmax(x0_hat)."""
        k = self.num_classes
        ab_prev = self._alpha_bar()[jnp.maximum(t - 1, 0)]
        probs = ab_prev * jax.nn.softmax(x0_logits, axis=-1) + (1.0 - ab_prev) / k
        u = jnp.clip(jax.random.uniform(key, x0_logits.shape), EPS, 1.0)
        gumbel = -jnp.log(-jnp.log(u))
        not_first = (t != 0).astype(jnp.float32)
        sample = jnp.argmax(
            jnp.log(probs + EPS) + gumbel * not_first, axis=-1
        ).astype(jnp.int32)
        return jnp.where(t == 0, jnp.argmax(x0_logits, axis=-1).astype(jnp.int32), sample)


class DiscreteDMSegmentor(_DiffusionBase, _D3PMMixin):
    """⑤ CN + CD: categorical (D3PM) diffusion on the label branch.

    The noised one-hot labels ride the c-branch (head width num_classes ->
    x0 logits supervised by CE against clean labels through
    ``d3pm_logits``); the clean features ride the n-branch as usual.
    """

    def __call__(self, point: PointBatch, train: bool = True) -> Dict[str, Any]:
        seg_valid = point.mask & (point.segment >= 0)
        ts_scene, ts_pt, k_n = self._sample_ts(point)
        x_t = self.d3pm_q_sample(point.segment, ts_pt, k_n)
        c_point = point.replace(
            feat=jax.nn.one_hot(x_t, self.num_classes, dtype=jnp.float32)
        )
        t_emb = self._t_emb(ts_scene, point.batch) if self.t_dim != -1 else None
        c_out, n_out = self.backbone(point, c_point, t_emb=t_emb, train=train)
        # diffusion branch predicts x0 logits; supervised through the D3PM
        # posterior KL (`D3PMKLLoss` on d3pm_{pred,true}_q) and/or CE on
        # d3pm_logits; semantic branch supervised as usual.
        true_q, pred_q = self.d3pm_posterior_pair(
            c_out.feat, point.segment, x_t, ts_pt
        )
        return dict(
            d3pm_logits=c_out.feat,
            d3pm_true_q=true_q,
            d3pm_pred_q=pred_q,
            n_pred=n_out.feat,
            n_target=point.segment,
            seg_valid=seg_valid,
        )

    def denoise_step(self, point: PointBatch, x_t: jnp.ndarray, t: jnp.ndarray):
        """One posterior-resampling step (reference `default.py:1806-1898`):
        x_t rides the label branch as one-hot, x0_hat logits come from its
        head, x_{t-1} is Gumbel-resampled."""
        c_point = point.replace(
            feat=jax.nn.one_hot(x_t, self.num_classes, dtype=jnp.float32)
        )
        ts_scene = jnp.full((point.num_scenes,), t, jnp.int32)
        t_emb = self._t_emb(ts_scene, point.batch) if self.t_dim != -1 else None
        c_out, n_out = self.backbone(point, c_point, t_emb=t_emb, train=False)
        x_prev = self.d3pm_ddim_sample(
            c_out.feat, t, self.make_rng("diffusion")
        )
        return dict(state=x_prev, n_logits=n_out.feat, x0_logits=c_out.feat)

    def inference(self, point: PointBatch, noise=None) -> Dict[str, Any]:
        key = self.make_rng("diffusion")
        x_t = jax.random.randint(
            key, (point.num_points,), 0, self.num_classes, dtype=jnp.int32
        )
        c_point = point.replace(
            feat=jax.nn.one_hot(x_t, self.num_classes, dtype=jnp.float32)
        )
        ts_scene = jnp.full((point.num_scenes,), self.T - 1, jnp.int32)
        t_emb = self._t_emb(ts_scene, point.batch) if self.t_dim != -1 else None
        _, n_out = self.backbone(point, c_point, t_emb=t_emb, train=False)
        return dict(
            seg_logits=n_out.feat,
            seg_valid=point.mask & (point.segment >= 0)
            if point.segment is not None else point.mask,
        )


class CDDMSegmentor(DiscreteDMSegmentor):
    """⑥ GD + CD: Gaussian diffusion on features (c) + D3PM on labels (n)."""

    def __call__(self, point: PointBatch, train: bool = True) -> Dict[str, Any]:
        seg_valid = point.mask & (point.segment >= 0)
        out: Dict[str, Any] = {}
        ts_scene, ts_pt, k_n = self._sample_ts(point)
        k1, k2 = jax.random.split(k_n)
        c_x0 = self._c_x0(point)
        c_noise = jax.random.normal(k1, c_x0.shape, jnp.float32)
        c_point = point.replace(feat=self.schedule.q_sample(c_x0, ts_pt, c_noise))
        x_t = self.d3pm_q_sample(point.segment, ts_pt, k2)
        n_point = point.replace(
            feat=jax.nn.one_hot(x_t, self.num_classes, dtype=jnp.float32)
        )
        t_emb = self._t_emb(ts_scene, point.batch) if self.t_dim != -1 else None
        c_out, n_out = self.backbone(n_point, c_point, t_emb=t_emb, train=train)
        true_q, pred_q = self.d3pm_posterior_pair(
            n_out.feat, point.segment, x_t, ts_pt
        )
        out.update(
            c_pred=c_out.feat,
            c_target=c_noise if self.dm_target == "noise" else c_x0,
            d3pm_logits=n_out.feat,
            d3pm_true_q=true_q,
            d3pm_pred_q=pred_q,
            n_pred=n_out.feat,
            n_target=point.segment,
            seg_valid=seg_valid,
        )
        return out

    def inference(self, point: PointBatch, noise=None) -> Dict[str, Any]:
        key = self.make_rng("diffusion")
        k1, k2 = jax.random.split(key)
        c_noise = jax.random.normal(
            k1, (point.num_points, self.c_in_channels), jnp.float32
        )
        x_t = jax.random.randint(
            k2, (point.num_points,), 0, self.num_classes, dtype=jnp.int32
        )
        n_point = point.replace(
            feat=jax.nn.one_hot(x_t, self.num_classes, dtype=jnp.float32)
        )
        ts_scene = jnp.full((point.num_scenes,), self.T - 1, jnp.int32)
        t_emb = self._t_emb(ts_scene, point.batch) if self.t_dim != -1 else None
        _, n_out = self.backbone(
            n_point, point.replace(feat=c_noise), t_emb=t_emb, train=False
        )
        return dict(
            seg_logits=n_out.feat,
            seg_valid=point.mask & (point.segment >= 0)
            if point.segment is not None else point.mask,
        )

    def denoise_step(self, point: PointBatch, state, t: jnp.ndarray):
        """⑥: Gaussian DDIM on the feature branch + D3PM resampling on the
        label branch, jointly (reference `default.py:2468-2570`).

        ``state = (c_feat, x_t)``."""
        c_feat, x_t = state
        n_point = point.replace(
            feat=jax.nn.one_hot(x_t, self.num_classes, dtype=jnp.float32)
        )
        ts_scene = jnp.full((point.num_scenes,), t, jnp.int32)
        t_emb = self._t_emb(ts_scene, point.batch) if self.t_dim != -1 else None
        c_out, n_out = self.backbone(
            n_point, point.replace(feat=c_feat), t_emb=t_emb, train=False
        )
        ts_pt = jnp.full((point.num_points,), t, jnp.int32)
        c_prev = self.schedule.ddim_step(
            c_feat, ts_pt, c_out.feat, target=self.dm_target
        )
        x_prev = self.d3pm_ddim_sample(n_out.feat, t, self.make_rng("diffusion"))
        return dict(
            state=(c_prev, x_prev), n_logits=n_out.feat, x0_logits=n_out.feat
        )


class DMSegmentor(_DiffusionBase, _D3PMMixin):
    """Transition-matrix D3PM on a single semantic branch
    (reference `default.py:2673-3269`)."""

    def __call__(self, point: PointBatch, train: bool = True) -> Dict[str, Any]:
        seg_valid = point.mask & (point.segment >= 0)
        ts_scene, ts_pt, k_n = self._sample_ts(point)
        x_t = self.d3pm_q_sample(point.segment, ts_pt, k_n)
        n_point = point.replace(
            feat=jax.nn.one_hot(x_t, self.num_classes, dtype=jnp.float32)
        )
        n_out = self.backbone(n_point, train=train)
        true_q, pred_q = self.d3pm_posterior_pair(
            n_out.feat, point.segment, x_t, ts_pt
        )
        return dict(
            d3pm_logits=n_out.feat,
            d3pm_true_q=true_q,
            d3pm_pred_q=pred_q,
            n_pred=n_out.feat, n_target=point.segment, seg_valid=seg_valid
        )

    def inference(self, point: PointBatch, noise=None) -> Dict[str, Any]:
        key = self.make_rng("diffusion")
        x_t = jax.random.randint(
            key, (point.num_points,), 0, self.num_classes, dtype=jnp.int32
        )
        n_out = self.backbone(
            point.replace(
                feat=jax.nn.one_hot(x_t, self.num_classes, dtype=jnp.float32)
            ),
            train=False,
        )
        return dict(
            seg_logits=n_out.feat,
            seg_valid=point.mask & (point.segment >= 0)
            if point.segment is not None else point.mask,
        )

    def denoise_step(self, point: PointBatch, x_t: jnp.ndarray, t: jnp.ndarray):
        """Single-branch posterior resampling (reference `default.py:3077-3146`)."""
        n_out = self.backbone(
            point.replace(
                feat=jax.nn.one_hot(x_t, self.num_classes, dtype=jnp.float32)
            ),
            train=False,
        )
        x_prev = self.d3pm_ddim_sample(n_out.feat, t, self.make_rng("diffusion"))
        return dict(state=x_prev, n_logits=n_out.feat, x0_logits=n_out.feat)


def init_multistep_state(model, point: PointBatch, rng: jax.Array):
    """Initial reverse-process state at t = T-1 for each ablation family."""
    n = point.num_points
    if isinstance(model, ContinuousDMSegmentor):
        return jax.random.normal(rng, (n, model.num_classes), jnp.float32)
    if isinstance(model, CCDMSegmentor):
        k1, k2 = jax.random.split(rng)
        return (
            jax.random.normal(k1, (n, model.c_in_channels), jnp.float32),
            jax.random.normal(k2, (n, model.num_classes), jnp.float32),
        )
    if isinstance(model, CDDMSegmentor):
        k1, k2 = jax.random.split(rng)
        return (
            jax.random.normal(k1, (n, model.c_in_channels), jnp.float32),
            jax.random.randint(k2, (n,), 0, model.num_classes, dtype=jnp.int32),
        )
    if isinstance(model, (DiscreteDMSegmentor, DMSegmentor)):
        return jax.random.randint(rng, (n,), 0, model.num_classes, dtype=jnp.int32)
    raise TypeError(type(model))


def inference_multistep(
    model,
    variables,
    point: PointBatch,
    rng: jax.Array,
    step: int = 5,
    mode: str = "avg",
    jit_step=None,
) -> jnp.ndarray:
    """Multi-step reverse-process inference for the NCF ablation families
    (reference per-family `inference_ddim` loops, `default.py:730-810,
    1185-1276, 1806-1898, 2468-2570, 3077-3146`): DDIM for the Gaussian
    states, posterior Gumbel resampling for the categorical ones.

    ``mode``: "avg" (MSAI) averages semantic logits over steps, "final"
    (MSFI) keeps the last step's.
    """
    from cdsegnet_tpu.models.diffusion import time_schedule

    sched = time_schedule(model.T, step)
    k_init, rng = jax.random.split(rng)
    state = init_multistep_state(model, point, k_init)
    if jit_step is None:
        jit_step = jax.jit(
            lambda v, p, s, t, k: model.apply(
                v, p, s, t, method=type(model).denoise_step,
                rngs=dict(diffusion=k),
            )
        )
    n_pred = jnp.zeros((point.num_points, model.num_classes), jnp.float32)
    for t in sched:
        rng, k = jax.random.split(rng)
        res = jit_step(
            variables, point, state, jnp.asarray(max(int(t), 0), jnp.int32), k
        )
        n_pred = n_pred + res["n_logits"] if mode == "avg" else res["n_logits"]
        state = res["state"]
        if t <= 0:
            break
    if mode == "avg":
        n_pred = n_pred / float(len(sched))
    return n_pred


class DefaultClassifier(nn.Module):
    """Shape classification head over pooled backbone features
    (reference `default.py:3329-3367`)."""

    backbone: nn.Module
    num_classes: int = 40
    backbone_embed_dim: int = 512

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False) -> Dict[str, Any]:
        n_out = self.backbone(point, train=train)
        feat = n_out.feat
        m = n_out.mask[:, None].astype(feat.dtype)
        # masked mean-pool per scene
        num_scenes = point.num_scenes
        seg_ids = jnp.clip(n_out.batch, 0, num_scenes - 1)
        sums = jax.ops.segment_sum(feat * m, seg_ids, num_scenes)
        cnts = jax.ops.segment_sum(m, seg_ids, num_scenes)
        pooled = sums / jnp.maximum(cnts, 1.0)
        x = nn.Dense(256, name="cls_fc1")(pooled)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(128, name="cls_fc2")(x)
        x = nn.gelu(x, approximate=False)
        logits = nn.Dense(self.num_classes, name="cls_head")(x)
        out: Dict[str, Any] = dict(cls_pred=logits)
        if point.segment is not None:
            # per-scene category from the per-point labels (ModelNet-style
            # datasets fill `segment` with the shape label; reference trains
            # on input_dict["category"], `default.py:3358-3360`); scenes that
            # are pure padding get -1 and drop out of the loss
            valid = n_out.mask
            tgt = jax.ops.segment_max(
                jnp.where(valid, point.segment, -1), seg_ids, num_scenes
            )
            out.update(
                n_pred=logits, n_target=tgt, seg_valid=tgt >= 0,
                cls_target=tgt,
            )
        return out
