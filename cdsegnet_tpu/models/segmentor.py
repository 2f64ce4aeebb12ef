"""Segmentor wrappers: plain PTv3 and the CNF (CDSegNet) diffusion wrapper.

Rebuilds `DefaultSegmentor` / `DefaultSegmentorV2` (reference
`pointcept/models/default.py:14-493,3270-3367`): the wrapper owns the
diffusion schedules, per-scene timestep sampling, q_sample noising of the
noise-network input, the timestep embedding, and the inference rules:

- SSI (single-step inference): feed the c-branch N(0,1) at t = T-1, one
  forward pass, read the n-branch logits (`default.py:371-422`);
- MSAI / MSFI: DDIM loop over a time schedule, averaging or taking the final
  n logits (`default.py:278-369`) — the loop lives in
  :func:`inference_ddim`, each step reusing the jitted `denoise_step`.

Predictions are returned as a dict; losses are computed by
`cdsegnet_tpu.models.losses.Criteria` outside the module so the training
step composes cleanly with jax transforms.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cdsegnet_tpu.models.diffusion import DiffusionSchedule, calc_t_emb, time_schedule
from cdsegnet_tpu.models.structure import PointBatch


class PlainSegmentor(nn.Module):
    """Single-branch PTv3 segmentor (reference `DefaultSegmentor`,
    `default.py:3270-3327`)."""

    backbone: nn.Module

    def __call__(self, point: PointBatch, train: bool = False) -> Dict[str, Any]:
        n_out = self.backbone(point, train=train)
        return dict(
            n_pred=n_out.feat,
            n_target=point.segment,
            seg_valid=point.mask & (point.segment >= 0),
        )


class CNFSegmentor(nn.Module):
    """CNF/CDSegNet segmentor (reference `DefaultSegmentorV2`)."""

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
    # per-scene random MSE subsampling (reference MSELoss
    # `batch_sample_point=8192`, `losses/misc.py:56-72`); <=0 disables
    batch_sample_point: int = 8192

    def setup(self):
        if self.dm:
            self.schedule = DiffusionSchedule.create(
                self.noise_schedule, self.beta_start, self.beta_end, self.T,
                self.dm_min_snr,
            )

    def _c_x0(self, point: PointBatch) -> jnp.ndarray:
        # reference `default.py:441-444`: use feat if channel count matches,
        # else fall back to coords.
        if point.feat.shape[-1] == self.c_in_channels:
            return point.feat
        return point.coord

    def _scene_t_emb(self, ts_scene: jnp.ndarray, batch: jnp.ndarray):
        """Broadcast per-scene step embeddings to points (pads clipped)."""
        emb = calc_t_emb(ts_scene, self.t_dim)
        idx = jnp.clip(batch, 0, ts_scene.shape[0] - 1)
        return jnp.take(emb, idx, axis=0)

    def __call__(self, point: PointBatch, train: bool = True) -> Dict[str, Any]:
        """Training forward (reference `default.py:424-493`)."""
        out: Dict[str, Any] = {}
        seg_valid = point.mask & (point.segment >= 0)
        if not self.condition:
            n_out = self.backbone(point, train=train)
            return dict(
                n_pred=n_out.feat, n_target=point.segment, seg_valid=seg_valid
            )

        c_x0 = self._c_x0(point)
        c_target = c_x0
        t_emb_pt = None
        c_feat = c_x0
        if train and self.batch_sample_point > 0:
            from cdsegnet_tpu.models.losses import subsample_valid

            out["mse_valid"] = subsample_valid(
                seg_valid, point.batch, point.num_scenes,
                self.batch_sample_point, self.make_rng("diffusion"),
            )
        if self.dm:
            key = self.make_rng("diffusion")
            k_t, k_n = jax.random.split(key)
            ts_scene = jax.random.randint(
                k_t, (point.num_scenes,), 0, self.T, dtype=jnp.int32
            )
            ts_pt = jnp.take(
                ts_scene, jnp.clip(point.batch, 0, point.num_scenes - 1)
            )
            if self.t_dim != -1:
                t_emb_pt = self._scene_t_emb(ts_scene, point.batch)
            noise = jax.random.normal(k_n, c_x0.shape, jnp.float32)
            c_feat = self.schedule.q_sample(c_x0, ts_pt, noise)
            if self.dm_target == "noise":
                c_target = noise
            if self.dm_min_snr is not None:
                out["snr_loss_weight"] = jnp.asarray(self.schedule.snr)[ts_pt]

        c_point = point.replace(feat=c_feat)
        c_out, n_out = self.backbone(
            point, c_point, t_emb=t_emb_pt, train=train
        )
        out.update(
            c_pred=c_out.feat,
            c_target=c_target,
            n_pred=n_out.feat,
            n_target=point.segment,
            seg_valid=seg_valid,
        )
        return out

    def inference(
        self, point: PointBatch, noise: Optional[jnp.ndarray] = None,
        geometry=None,
    ) -> Dict[str, Any]:
        """SSI: one pass with the c-branch fed pure noise at t = T-1
        (reference `default.py:371-422`). ``geometry`` optionally supplies
        the precomputed pyramid (see
        `PointTransformerV3.precompute_geometry`)."""
        seg_valid = point.mask & (
            (point.segment >= 0) if point.segment is not None else point.mask
        )
        if not self.condition:
            n_out = self.backbone(point, train=False)
            return dict(seg_logits=n_out.feat, seg_valid=seg_valid)

        c_x0 = self._c_x0(point)
        t = 0
        c_feat = c_x0
        if self.dm and self.dm_input == "xt":
            if noise is None:
                noise = jax.random.normal(
                    self.make_rng("diffusion"), c_x0.shape, jnp.float32
                )
            c_feat = noise
            t = self.T - 1
        ts_scene = jnp.full((point.num_scenes,), t, jnp.int32)
        t_emb_pt = (
            self._scene_t_emb(ts_scene, point.batch) if self.t_dim != -1 else None
        )
        c_point = point.replace(feat=c_feat)
        _, n_out = self.backbone(
            point, c_point, t_emb=t_emb_pt, train=False, geometry=geometry
        )
        return dict(seg_logits=n_out.feat, seg_valid=seg_valid)

    def denoise_step(
        self, point: PointBatch, c_feat: jnp.ndarray, t: jnp.ndarray,
        geometry=None,
    ) -> Dict[str, Any]:
        """One DDIM step: predict (c_eps, n_logits) and the next c state.

        ``t`` is a scalar int32 step (same for all scenes, like the
        reference's per-fragment loop `default.py:306-349`).
        """
        ts_scene = jnp.full((point.num_scenes,), t, jnp.int32)
        t_emb_pt = (
            self._scene_t_emb(ts_scene, point.batch) if self.t_dim != -1 else None
        )
        c_point = point.replace(feat=c_feat)
        c_out, n_out = self.backbone(
            point, c_point, t_emb=t_emb_pt, train=False, geometry=geometry
        )
        ts_pt = jnp.full((point.num_points,), t, jnp.int32)
        c_next = self.schedule.ddim_step(
            c_feat, ts_pt, c_out.feat, target=self.dm_target
        )
        return dict(c_next=c_next, n_logits=n_out.feat)


def inference_ddim(
    model: CNFSegmentor,
    variables,
    point: PointBatch,
    rng: jax.Array,
    step: int = 5,
    mode: str = "avg",
    jit_step=None,
    geometry=None,
) -> jnp.ndarray:
    """MSAI ("avg") / MSFI ("final") multi-step inference driver
    (reference `default.py:278-369`; always starts from pure noise).

    The geometry pyramid is a pure function of the point coordinates, so it
    is computed ONCE and shared by every denoise step (the reference
    re-serializes inside each forward)."""
    sched = time_schedule(model.T, step)
    c_feat = jax.random.normal(
        rng, (point.num_points, model.c_in_channels), jnp.float32
    )
    if geometry is None and hasattr(model.backbone, "precompute_geometry"):
        geometry = jax.jit(model.backbone.precompute_geometry)(point)
    if jit_step is None:
        jit_step = jax.jit(
            lambda v, p, cf, t, g: model.apply(
                v, p, cf, t, g, method=CNFSegmentor.denoise_step
            )
        )
    n_pred = jnp.zeros((point.num_points, model.num_classes), jnp.float32)
    count = 0
    for t in sched:
        res = jit_step(
            variables, point, c_feat, jnp.asarray(max(t, 0), jnp.int32),
            geometry,
        )
        if mode == "avg":
            n_pred = n_pred + res["n_logits"]
        else:
            n_pred = res["n_logits"]
        c_feat = res["c_next"]
        count += 1
        if t <= 0:
            break
    if mode == "avg":
        # matches the reference divisor exactly (`default.py:353`):
        # len(time_schedule) = step+1 forwards are accumulated (the t=-1
        # slot included — reference runs the backbone there too before its
        # `if t <= 0: break`) and averaged by the same count.
        n_pred = n_pred / float(len(sched))
    return n_pred
