"""Point Prompt Training: multi-dataset joint training wrappers (TPU-native).

Counterparts of `pointcept/models/point_prompt_training/`:

- ``PPT-v1m1`` (`point_prompt_training_v1m1_language_guided.py:125-588`,
  CDSegNet's extended copy): data-driven context (a learned per-dataset
  embedding, fed to PDNorm backbones) + language-driven categorical
  alignment — point features are cosine-matched against CLIP text
  embeddings of a shared class-name vocabulary, with each dataset reading
  only its ``valid_index`` rows. Includes the CDSegNet additions: the
  optional dual-branch CNF backbone with Gaussian feature diffusion on the
  c-branch (`:494-557`).
- ``PPT-v1m2`` (`point_prompt_training_v1m2_decoupled.py`): decoupled
  per-dataset linear seg heads instead of the language head.

TPU redesign notes:
- the dataset ``condition`` is a *static* Python index: each dataset gets
  its own jit specialization (its head width differs anyway), selected
  host-side by ``MultiDatasetTrainer`` per batch; PDNorm params live in
  stacked ``[num_conditions, C]`` arrays (see
  `models/modules.PDMaskedBatchNorm`), so parameters/checkpoints are
  identical across specializations;
- the reference encodes class names with CLIP at construction time; this
  image has no CLIP weights or egress, so the text embeddings load from
  ``class_embedding_path`` (a ``.npy`` exported offline with
  ``clip.encode_text``, frozen like the reference's buffer) and fall back
  to a *learned* normally-initialized table — a documented deviation that
  keeps the categorical-alignment mechanics testable;
- losses flow through the engine ``Criteria`` (our wrapper contract):
  ``n_pred``/``n_target``/``seg_valid`` (+ ``c_pred``/``c_target``/
  ``snr_loss_weight`` when diffusion is on).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cdsegnet_tpu.models.builder import MODELS, build_model
from cdsegnet_tpu.models.diffusion import DiffusionSchedule, calc_t_emb
from cdsegnet_tpu.models.structure import PointBatch

# reference defaults (`point_prompt_training_v1m1_language_guided.py:141-153`)
DEFAULT_CLASS_NAMES = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "bookcase", "picture", "counter", "desk",
    "shelves", "curtain", "dresser", "pillow", "mirror", "ceiling",
    "refrigerator", "television", "shower curtain", "nightstand", "toilet",
    "sink", "lamp", "bathtub", "garbagebin", "board", "beam", "column",
    "clutter", "otherstructure", "otherfurniture", "otherprop",
)
DEFAULT_VALID_INDEX = (
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21, 23,
     25, 26, 33, 34, 35),
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 12, 13, 15, 20, 22, 24, 25, 27, 34),
    (0, 1, 4, 5, 6, 7, 8, 10, 19, 29, 30, 31, 32),
)


def _backbone_takes_condition(backbone) -> bool:
    import inspect

    try:
        params = inspect.signature(type(backbone).__call__).parameters
    except (TypeError, ValueError):
        return False
    return "condition" in params


class PointPromptTraining(nn.Module):
    """PPT-v1m1: language-guided categorical alignment (+ optional CNF
    diffusion on a dual-branch backbone, the CDSegNet extension)."""

    backbone: nn.Module
    backbone_out_channels: int = 96
    context_channels: int = 256
    conditions: Tuple[str, ...] = ("Structured3D", "ScanNet", "S3DIS")
    valid_index: Tuple[Tuple[int, ...], ...] = DEFAULT_VALID_INDEX
    num_class_names: int = len(DEFAULT_CLASS_NAMES)
    clip_embed_dim: int = 512
    class_embedding_path: Optional[str] = None
    backbone_mode: bool = False
    # CDSegNet dual-branch diffusion extension (`:494-557`)
    dual_branch: bool = False  # reference kwarg `condition`
    dm: bool = False
    T: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    noise_schedule: str = "linear"
    t_dim: int = 128
    dm_input: str = "xt"
    dm_target: str = "noise"
    dm_min_snr: Optional[float] = None
    c_in_channels: int = 6

    def setup(self):
        if self.dm:
            self.schedule = DiffusionSchedule.create(
                self.noise_schedule, self.beta_start, self.beta_end, self.T,
                self.dm_min_snr,
            )

    def _class_embedding(self) -> jnp.ndarray:
        if self.class_embedding_path is not None:
            emb = np.load(self.class_embedding_path).astype(np.float32)
            assert emb.shape == (self.num_class_names, self.clip_embed_dim)
            return jnp.asarray(emb)  # frozen, like the reference buffer
        return self.param(
            "class_embedding", nn.initializers.normal(0.02),
            (self.num_class_names, self.clip_embed_dim), jnp.float32,
        )

    def _context(self, condition: int) -> jnp.ndarray:
        table = self.param(
            "embedding_table", nn.initializers.normal(1.0),
            (len(self.conditions), self.context_channels), jnp.float32,
        )
        return table[condition][None, :]

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False,
                 condition: int = 0) -> Dict[str, Any]:
        context = self._context(condition)
        out: Dict[str, Any] = {}

        if self.dual_branch:
            # CDSegNet extension: c-branch carries (diffused) features
            c_x0 = (
                point.coord if self.c_in_channels == 3 else point.feat
            )
            c_target, feat_t, t_emb = c_x0, c_x0, None
            if self.dm:
                key = self.make_rng("diffusion")
                k_t, k_n = jax.random.split(key)
                noise = jax.random.normal(k_n, c_x0.shape, jnp.float32)
                if train:
                    ts_scene = jax.random.randint(
                        k_t, (point.num_scenes,), 0, self.T, dtype=jnp.int32
                    )
                    ts = jnp.take(
                        ts_scene,
                        jnp.clip(point.batch, 0, point.num_scenes - 1),
                    )
                    feat_t = self.schedule.q_sample(c_x0, ts, noise)
                    if self.dm_target == "noise":
                        c_target = noise
                    if self.dm_min_snr is not None:
                        out["snr_loss_weight"] = (
                            jnp.asarray(self.schedule.snr)[ts]
                        )
                else:
                    # SSI: feed N(0,1) at t = T-1 when dm_input="xt", the
                    # clean signal otherwise (reference `inference`,
                    # `point_prompt_training_v1m1_...py:428-432`)
                    ts_scene = jnp.full(
                        (point.num_scenes,), self.T - 1, jnp.int32
                    )
                    feat_t = noise if self.dm_input == "xt" else c_x0
                if self.t_dim != -1:
                    emb = calc_t_emb(ts_scene, self.t_dim)
                    t_emb = jnp.take(
                        emb, jnp.clip(point.batch, 0, point.num_scenes - 1),
                        axis=0,
                    )
            c_point = point.replace(feat=feat_t)
            c_out, n_out = self.backbone(
                point, c_point, t_emb=t_emb, train=train
            )
            out["c_pred"] = c_out.feat
            out["c_target"] = c_target
        elif _backbone_takes_condition(self.backbone):
            n_out = self.backbone(
                point, train=train, condition=condition, context=context
            )
        else:
            n_out = self.backbone(point, train=train)

        feat = n_out.feat
        if self.backbone_mode:
            out["feat"] = feat
            return out
        feat = feat.astype(jnp.float32)
        if feat.shape[-1] != self.clip_embed_dim:
            # commented-out reference variant's proj_head (`:79-81`); the
            # active code requires backbone_out == text dim instead
            feat = nn.Dense(self.clip_embed_dim, dtype=jnp.float32,
                            name="proj_head")(feat)
        emb = self._class_embedding()
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)
        valid = np.asarray(self.valid_index[condition], np.int32)
        feat = feat / (jnp.linalg.norm(feat, axis=-1, keepdims=True) + 1e-12)
        # CLIP-style learned temperature, init ln(1/0.07)
        logit_scale = self.param(
            "logit_scale",
            lambda *_: jnp.asarray(np.log(1.0 / 0.07), jnp.float32), (),
        )
        out["n_pred"] = (feat @ emb[valid].T) * jnp.exp(logit_scale)
        out["n_target"] = point.segment
        out["seg_valid"] = point.mask & (point.segment >= 0)
        return out


class PointPromptTrainingDecoupled(nn.Module):
    """PPT-v1m2: per-dataset linear seg heads."""

    backbone: nn.Module
    backbone_out_channels: int = 96
    context_channels: int = 256
    conditions: Tuple[str, ...] = ("Structured3D", "ScanNet", "S3DIS")
    num_classes: Tuple[int, ...] = (25, 20, 13)
    backbone_mode: bool = False

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False,
                 condition: int = 0) -> Dict[str, Any]:
        table = self.param(
            "embedding_table", nn.initializers.normal(1.0),
            (len(self.conditions), self.context_channels), jnp.float32,
        )
        context = table[condition][None, :]
        if _backbone_takes_condition(self.backbone):
            n_out = self.backbone(
                point, train=train, condition=condition, context=context
            )
        else:
            n_out = self.backbone(point, train=train)
        feat = n_out.feat
        if self.backbone_mode:
            return dict(feat=feat)
        # all heads are created every trace (params must not depend on the
        # specialization); only the active one contributes
        logits = None
        for i, ncls in enumerate(self.num_classes):
            head = nn.Dense(ncls, dtype=jnp.float32, name=f"seg_head{i}")
            li = head(feat.astype(jnp.float32))
            if i == condition:
                logits = li
        return dict(
            n_pred=logits,
            n_target=point.segment,
            seg_valid=point.mask & (point.segment >= 0),
        )


def _register():
    common = {
        "backbone_out_channels", "context_channels", "conditions",
        "backbone_mode",
    }

    def v1m1(backbone, **cfg):
        keep = common | {
            "valid_index", "num_class_names", "clip_embed_dim",
            "class_embedding_path", "dm", "T", "beta_start", "beta_end",
            "noise_schedule", "dm_input", "dm_target", "dm_min_snr",
            "c_in_channels",
        }
        kwargs = {k: _tupled(v) for k, v in cfg.items() if k in keep}
        # reference kwarg names: `condition` gates the dual branch, `T_dim`
        kwargs["dual_branch"] = bool(cfg.get("condition", False))
        kwargs["t_dim"] = cfg.get("T_dim", 128)
        return PointPromptTraining(backbone=build_model(backbone), **kwargs)

    def v1m2(backbone, **cfg):
        keep = common | {"num_classes"}
        kwargs = {k: _tupled(v) for k, v in cfg.items() if k in keep}
        return PointPromptTrainingDecoupled(
            backbone=build_model(backbone), **kwargs
        )

    MODELS.register_module("PPT-v1m1", v1m1)
    MODELS.register_module("PPT-v1m2", v1m2)


def _tupled(v):
    if isinstance(v, list):
        return tuple(_tupled(x) for x in v)
    return v


_register()
