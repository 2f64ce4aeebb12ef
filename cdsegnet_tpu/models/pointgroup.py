"""PointGroup instance segmentation (TPU-native).

Counterpart of `pointcept/models/point_group/` + the `libs/pointgroup_ops`
CUDA extension (batched ball query with retry-on-overflow + BFS
connected-component clustering, reference `src/bfs_cluster*`,
`functions/functions.py:6-60`).

TPU redesign:
- the ball-query neighbor graph comes from `ops/pointops.ball_query`
  (MXU distance tiles, static `nsample`);
- BFS clustering becomes *pointer-jumping label propagation*: every point
  starts as its own cluster id, each iteration takes the min id over its
  ball neighbors, and `log2(N)` iterations converge to connected components
  — a classic parallel-connectivity formulation that maps to gathers +
  elementwise mins instead of a serial frontier queue.

The segmentor head follows the reference: semantic logits + per-point
center-offset vectors; clustering runs on (coord + offset) for points whose
semantic class is an instance class.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cdsegnet_tpu.models.builder import MODELS, build_model
from cdsegnet_tpu.models.structure import PointBatch
from cdsegnet_tpu.ops.pointops import ball_query


def connected_components(
    coord: jnp.ndarray,
    valid: jnp.ndarray,
    radius: float = 0.03,
    nsample: int = 16,
    num_iters: Optional[int] = None,
) -> jnp.ndarray:
    """Cluster ids via pointer-jumping over the ball-query graph.

    Returns (N,) int32 cluster ids (min point index per component); invalid
    points get id N.
    """
    n = coord.shape[0]
    idx, _ = ball_query(coord, coord, radius, nsample, valid, valid)
    idx = jnp.where(valid[:, None], idx, n)
    labels = jnp.where(valid, jnp.arange(n, dtype=jnp.int32), n)
    iters = num_iters or max(n.bit_length(), 1)

    def body(_, lab):
        # min label over neighbors (guard index n -> own label)
        neigh = jnp.take(lab, idx, axis=0, mode="fill", fill_value=n)
        lab2 = jnp.minimum(lab, jnp.min(neigh, axis=1))
        # pointer jumping: adopt the label of your label
        lab3 = jnp.take(lab2, jnp.clip(lab2, 0, n - 1), mode="clip")
        return jnp.where(valid, jnp.minimum(lab2, lab3), n)

    return jax.lax.fori_loop(0, iters, body, labels)


class PointGroup(nn.Module):
    """Instance segmentor: backbone -> (semantic logits, center offsets);
    inference clusters shifted coordinates per semantic class."""

    backbone: nn.Module
    num_classes: int = 20
    backbone_out_channels: int = 64
    instance_ignore: Tuple[int, ...] = (0, 1)  # wall/floor: no instances
    cluster_radius: float = 0.03
    cluster_nsample: int = 16

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False):
        n_out = self.backbone(point, train=train)
        feat = n_out.feat
        sem = nn.Dense(self.num_classes, dtype=jnp.float32, name="seg_head")(
            feat.astype(jnp.float32)
        )
        offset = nn.Dense(3, dtype=jnp.float32, name="offset_head")(
            nn.gelu(
                nn.Dense(feat.shape[-1], dtype=jnp.float32, name="offset_fc")(
                    feat.astype(jnp.float32)
                ),
                approximate=False,
            )
        )
        out = dict(
            n_pred=sem,
            offset_pred=offset,
            n_target=point.segment,
            seg_valid=point.mask & (point.segment >= 0),
        )
        if point.instance is not None and point.instance_centroid is not None:
            # offset regression targets (reference `point_group_v1m1_base.py:
            # 76-88`): bias to the instance centroid, masked to points that
            # belong to an instance
            out["offset_target"] = point.instance_centroid - point.coord
            out["instance_valid"] = point.mask & (point.instance >= 0)
        return out

    def cluster(self, point: PointBatch, sem_pred: jnp.ndarray,
                offset_pred: jnp.ndarray) -> jnp.ndarray:
        """Proposal generation: shift coords by predicted offsets, cluster
        per-class connected components (reference bfs_cluster)."""
        shifted = point.coord + offset_pred
        ignore = jnp.zeros_like(sem_pred, dtype=bool)
        for c in self.instance_ignore:
            ignore = ignore | (sem_pred == c)
        valid = point.mask & ~ignore
        # separate classes by offsetting coordinates per class so different
        # classes can never connect
        span = (
            jnp.max(jnp.where(point.mask[:, None], shifted, 0.0))
            - jnp.min(jnp.where(point.mask[:, None], shifted, 0.0))
            + 10.0
        )
        keyed = shifted.at[:, 0].add(sem_pred.astype(jnp.float32) * span)
        return connected_components(
            keyed, valid, self.cluster_radius, self.cluster_nsample
        )


def _register():
    def factory(backbone, **cfg):
        keep = {"num_classes", "backbone_out_channels", "cluster_radius",
                "cluster_nsample"}
        return PointGroup(
            backbone=build_model(backbone),
            **{k: v for k, v in cfg.items() if k in keep},
        )

    MODELS.register_module("PointGroup", factory)
    MODELS.register_module("PointGroup-v1m1", factory)


_register()
