"""MaskedSceneContrast: self-supervised cross-view pretraining (TPU-native).

Counterpart of
`pointcept/models/masked_scene_contrast/masked_scene_contrast_v1m1_base.py`
(~320 LoC over pointops + torch_geometric). Two augmented views of the same
scene get complementary grid-patch masks; masked features are replaced by a
learned token; the backbone embeds both views; an InfoNCE loss pulls matched
cross-view point pairs together, plus masked color/normal reconstruction.

TPU redesign (static shapes):
- cross masks (`generate_cross_masks`, `:70-142`): instead of building the
  union cloud + voxel_grid + permutation, every mask-grid cell is hashed to
  a deterministic uniform in [0, 1) from the step's PRNG seed; cells with
  u < mask_rate mask view1, rate <= u < 2*rate mask view2 — iid Bernoulli
  per patch instead of an exact-count permutation (conscious deviation),
  identical cross-complementarity because both views share the cell
  keyspace;
- pair matching (`match_contrastive_pair`, `:144-172`): 1-NN within
  `matching_max_radius` over origin coordinates, subsampled to a STATIC
  `matching_max_pair` table by top-k of random scores, with a validity
  column (the reference picks a random neighbor among <=8 and a random
  subset);
- InfoNCE over the static pair table with invalid rows/columns masked.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cdsegnet_tpu.models.builder import MODELS, build_model
from cdsegnet_tpu.models.structure import PointBatch
from cdsegnet_tpu.ops.pointops import knn


def _cell_uniform(grid_cell: jnp.ndarray, batch: jnp.ndarray, seed: jnp.ndarray):
    """Deterministic uniform in [0,1) per (cell, scene, seed) — a stateless
    splitmix-style integer hash."""
    h = (
        grid_cell[:, 0].astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        ^ grid_cell[:, 1].astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
        ^ grid_cell[:, 2].astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D)
        ^ batch.astype(jnp.uint32) * jnp.uint32(0x27D4EB2F)
        ^ seed.astype(jnp.uint32)
    )
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x2C1B3C6D)
    h = h ^ (h >> 12)
    h = h * jnp.uint32(0x297A2D39)
    h = h ^ (h >> 15)
    return h.astype(jnp.float32) / jnp.float32(2**32)


class MaskedSceneContrast(nn.Module):
    backbone: nn.Module
    backbone_in_channels: int = 6
    backbone_out_channels: int = 96
    mask_grid_size: float = 0.1
    mask_rate: float = 0.4
    matching_max_radius: float = 0.03
    matching_max_pair: int = 8192
    nce_t: float = 0.4
    contrast_weight: float = 1.0
    reconstruct_weight: float = 1.0
    reconstruct_color: bool = True
    reconstruct_normal: bool = True

    def cross_masks(self, v1: PointBatch, v2: PointBatch, v1_origin, v2_origin,
                    seed):
        assert self.mask_rate <= 0.5
        def u_of(pt, origin):
            cell = jnp.floor(origin / self.mask_grid_size).astype(jnp.int32)
            return _cell_uniform(cell, pt.batch, seed)

        u1 = u_of(v1, v1_origin)
        u2 = u_of(v2, v2_origin)
        m1 = (u1 < self.mask_rate) & v1.mask
        m2 = (u2 >= self.mask_rate) & (u2 < 2 * self.mask_rate) & v2.mask
        return m1, m2

    def match_pairs(self, v1: PointBatch, v2: PointBatch, v1_origin, v2_origin,
                    key):
        """Static (P, 2) cross-view index pairs + validity."""
        idx, d2 = knn(v1_origin, v2_origin, 1, v1.mask, v2.mask)
        valid = (
            (d2[:, 0] < self.matching_max_radius ** 2)
            & v1.mask
            & (idx[:, 0] < v2.num_points)
        )
        # same-scene guard (1-NN could cross scenes in a packed bucket)
        j = jnp.clip(idx[:, 0], 0, v2.num_points - 1)
        valid = valid & (v1.batch == jnp.take(v2.batch, j))
        score = jnp.where(valid, jax.random.uniform(key, valid.shape), -1.0)
        p = min(self.matching_max_pair, v1.num_points)
        top, rows = jax.lax.top_k(score, p)
        pairs = jnp.stack([rows.astype(jnp.int32),
                           jnp.take(j, rows).astype(jnp.int32)], axis=1)
        return pairs, top >= 0.0

    def info_nce(self, f1, f2, pairs, pair_valid):
        a = jnp.take(f1, pairs[:, 0], axis=0)
        b = jnp.take(f2, pairs[:, 1], axis=0)
        a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-7)
        b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-7)
        sim = (a @ b.T).astype(jnp.float32)
        p = sim.shape[0]
        col_ok = pair_valid[None, :] | jnp.eye(p, dtype=bool)
        logits = jnp.where(col_ok, sim / self.nce_t, -jnp.inf)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.diagonal(logp)
        v = pair_valid.astype(jnp.float32)
        loss = jnp.sum(nll * v) / jnp.maximum(jnp.sum(v), 1.0)
        pos = jnp.sum(jnp.diagonal(sim) * v) / jnp.maximum(jnp.sum(v), 1.0)
        neg = jnp.sum(
            sim * v[:, None] * v[None, :] * (1 - jnp.eye(p))
        ) / jnp.maximum(jnp.sum(v) ** 2 - jnp.sum(v), 1.0)
        return loss, pos, neg

    @nn.compact
    def __call__(
        self,
        view1: PointBatch,
        view2: PointBatch,
        view1_origin_coord: jnp.ndarray,
        view2_origin_coord: jnp.ndarray,
        view1_target: Optional[Dict[str, jnp.ndarray]] = None,
        view2_target: Optional[Dict[str, jnp.ndarray]] = None,
        train: bool = True,
    ) -> Dict[str, Any]:
        key = self.make_rng("diffusion") if self.has_rng("diffusion") else jax.random.PRNGKey(0)
        k_seed, k_pair = jax.random.split(key)
        seed = jax.random.randint(k_seed, (), 0, jnp.iinfo(jnp.int32).max)
        m1, m2 = self.cross_masks(
            view1, view2, view1_origin_coord, view2_origin_coord, seed
        )
        token = self.param(
            "mask_token", nn.initializers.truncated_normal(0.02),
            (1, self.backbone_in_channels), jnp.float32,
        )
        f1 = jnp.where(m1[:, None], token.astype(view1.feat.dtype), view1.feat)
        f2 = jnp.where(m2[:, None], token.astype(view2.feat.dtype), view2.feat)
        out1 = self.backbone(view1.replace(feat=f1), train=train).feat
        out2 = self.backbone(view2.replace(feat=f2), train=train).feat

        pairs, pair_valid = self.match_pairs(
            view1, view2, view1_origin_coord, view2_origin_coord, k_pair
        )
        nce, pos, neg = self.info_nce(out1, out2, pairs, pair_valid)
        loss = nce * self.contrast_weight
        result: Dict[str, Any] = dict(nce_loss=nce, pos_sim=pos, neg_sim=neg)

        def masked_mse(pred, target, m):
            err = jnp.sum(
                jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)),
                axis=-1,
            )
            return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)

        if self.reconstruct_color and view1_target and "color" in view1_target:
            head = nn.Dense(3, dtype=jnp.float32, name="color_head")
            closs = 0.5 * (
                masked_mse(head(out1.astype(jnp.float32)),
                           view1_target["color"], m1.astype(jnp.float32))
                + masked_mse(head(out2.astype(jnp.float32)),
                             view2_target["color"], m2.astype(jnp.float32))
            )
            loss = loss + closs * self.reconstruct_weight
            result["color_loss"] = closs
        if self.reconstruct_normal and view1_target and "normal" in view1_target:
            head = nn.Dense(3, dtype=jnp.float32, name="normal_head")

            def nrm(x):
                x = head(x.astype(jnp.float32))
                return x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-10)

            nloss = 0.5 * (
                masked_mse(nrm(out1), view1_target["normal"],
                           m1.astype(jnp.float32))
                + masked_mse(nrm(out2), view2_target["normal"],
                             m2.astype(jnp.float32))
            )
            loss = loss + nloss * self.reconstruct_weight
            result["normal_loss"] = nloss
        result["loss"] = loss
        result["view1_mask"] = m1
        result["view2_mask"] = m2
        return result


def _register():
    def factory(backbone, **cfg):
        keep = {
            "backbone_in_channels", "backbone_out_channels", "mask_grid_size",
            "mask_rate", "matching_max_radius", "matching_max_pair", "nce_t",
            "contrast_weight", "reconstruct_weight", "reconstruct_color",
            "reconstruct_normal",
        }
        return MaskedSceneContrast(
            backbone=build_model(backbone),
            **{k: v for k, v in cfg.items() if k in keep},
        )

    MODELS.register_module("MSC", factory)
    MODELS.register_module("MSC-v1m1", factory)


_register()
