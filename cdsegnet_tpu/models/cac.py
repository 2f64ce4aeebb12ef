"""Context-Aware Classifier segmentor (TPU-native).

Counterpart of
`pointcept/models/context_aware_classifier/context_aware_classifier_v1m1_base.py`
(CAC-v1m1, 270 LoC). The linear seg head's weight rows act as class
prototypes; two refinement paths re-classify features by cosine similarity
against *contextualized* prototypes:

- ``post_refine`` (`:97-149`): per-scene soft prototypes — softmax-weighted
  feature means per class — concatenated with the global prototypes and
  projected; the reference's per-sample ``offset`` Python loop becomes a
  static loop over the bucket's ``num_scenes`` (one [cls,n]@[n,c] MXU matmul
  per scene, results selected by scene id);
- ``adaptive_perspective`` (`:72-95`): ground-truth class means (training
  only), computed batch-globally like the reference, via a one-hot matmul
  instead of a per-class loop.

Division of labor differs from the reference by design: the reference
builds its criteria *inside* the model and returns ``loss``; here the model
returns the three logit sets (``n_pred`` = refined, ``pre_pred`` = raw head,
``cac_pred`` = adaptive-perspective) and the loss weights live in the config
criteria — three ``CrossEntropyLoss`` entries with ``pred=`` overrides plus
a ``CACDistillLoss`` (see `models/losses.cac_distill_loss`), matching
`main/pre/pre_self/kl_weight` in the reference ``forward`` (`:200-244`).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from cdsegnet_tpu.models.builder import MODELS, build_model
from cdsegnet_tpu.models.modules import MaskedBatchNorm
from cdsegnet_tpu.models.structure import PointBatch


def _cosine(x: jnp.ndarray, proto: jnp.ndarray) -> jnp.ndarray:
    """Cosine-similarity logits [n, cls] (reference ``get_pred``, `:64-70`)."""
    x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
    proto = proto / (jnp.linalg.norm(proto, axis=-1, keepdims=True) + 1e-12)
    return x @ proto.T


class CACSegmentor(nn.Module):
    backbone: nn.Module
    num_classes: int = 20
    backbone_out_channels: int = 96
    cos_temp: float = 15.0
    conf_thresh: float = 0.0
    detach_pre_logits: bool = False

    def _proj_mlp(self, name: str):
        c = self.backbone_out_channels
        return nn.Sequential(
            [nn.Dense(2 * c, use_bias=False, dtype=jnp.float32,
                      name=f"{name}_0"),
             nn.relu,
             nn.Dense(c, dtype=jnp.float32, name=f"{name}_1")],
            name=name,
        )

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False) -> Dict[str, Any]:
        c = self.backbone_out_channels
        feat = self.backbone(point, train=train).feat.astype(jnp.float32)
        w = self.param(
            "seg_head_kernel", nn.initializers.lecun_normal(),
            (c, self.num_classes), jnp.float32,
        )
        b = self.param(
            "seg_head_bias", nn.initializers.zeros, (self.num_classes,),
            jnp.float32,
        )
        logits = feat @ w + b
        proto = w.T  # [cls, c] — head weights are the class prototypes

        proj = self._proj_mlp("proj")
        apd_proj = self._proj_mlp("apd_proj")

        # feat_proj_layer (`:55-60`): Linear(no bias) + BN + ReLU + Linear,
        # shared by both refinement paths
        fx = nn.Dense(c, use_bias=False, dtype=jnp.float32,
                      name="feat_proj_0")(feat)
        fx = MaskedBatchNorm(c, name="feat_proj_bn")(
            fx, point.mask, use_running_average=not train
        )
        fx = nn.relu(fx)
        fx = nn.Dense(c, dtype=jnp.float32, name="feat_proj_1")(fx)

        # --- post_refine: per-scene softmax-weighted prototypes ---
        p = logits
        if self.detach_pre_logits:
            p = jax.lax.stop_gradient(p)
        p = jax.nn.softmax(p, axis=-1) * point.mask[:, None]
        if self.conf_thresh > 0:
            p = p * (jnp.max(p, axis=-1, keepdims=True) >= self.conf_thresh)
        refine = jnp.zeros_like(logits)
        for s in range(point.num_scenes):
            ws = p * (point.batch == s)[:, None]  # [n, cls]
            denom = jnp.sum(ws, axis=0)[:, None]  # [cls, 1]
            proto_s = (ws.T @ feat) / (denom + 1e-7)  # [cls, c]
            proto_s = proj(jnp.concatenate([proto_s, proto], axis=-1))
            refine = jnp.where(
                (point.batch == s)[:, None], _cosine(fx, proto_s), refine
            )
        out: Dict[str, Any] = dict(
            n_pred=refine * self.cos_temp,
            pre_pred=logits,
            n_target=point.segment,
            seg_valid=point.mask & (point.segment >= 0),
        )

        # --- adaptive perspective: ground-truth class means. Computed
        # unconditionally so flax creates apd_proj's params at init (classes
        # absent from the batch fall back to the detached head prototypes);
        # exposed only in train, matching the reference's training-only use.
        valid = out["seg_valid"].astype(jnp.float32)
        oh = jax.nn.one_hot(
            jnp.clip(point.segment, 0, self.num_classes - 1),
            self.num_classes,
        ) * valid[:, None]
        cnt = jnp.sum(oh, axis=0)  # [cls]
        gt_proto = (oh.T @ feat) / (cnt[:, None] + 1e-4)
        new_proto = jnp.where(
            (cnt > 0)[:, None], gt_proto, jax.lax.stop_gradient(proto)
        )
        new_proto = apd_proj(jnp.concatenate([new_proto, proto], axis=-1))
        if train:
            out["cac_pred"] = _cosine(fx, new_proto) * self.cos_temp
        return out


def _register():
    def factory(backbone, **cfg):
        keep = {
            "num_classes", "backbone_out_channels", "cos_temp", "conf_thresh",
            "detach_pre_logits",
        }
        return CACSegmentor(
            backbone=build_model(backbone),
            **{k: v for k, v in cfg.items() if k in keep},
        )

    MODELS.register_module("CAC-v1m1", factory)


_register()
