"""Optimizer + LR schedule builders on optax.

Matches the reference training contract
(`pointcept/utils/{optimizer,scheduler}.py`):

- AdamW/SGD/Adam with per-group LRs selected by parameter-path keyword
  (CDSegNet: keyword "block" -> lr 0.0002, `configs/scannet/CDSegNet.py:152`);
- OneCycleLR (cosine anneal, div_factor/final_div_factor/pct_start) plus
  MultiStep/Poly/Exp/Cosine alternatives;
- per-group schedules scale with the group's max_lr like torch OneCycleLR.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def onecycle_schedule(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> optax.Schedule:
    """torch-style OneCycleLR with cosine annealing."""
    initial = max_lr / div_factor
    final = initial / final_div_factor
    up = max(int(total_steps * pct_start), 1)
    down = max(total_steps - up, 1)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        upf = 0.5 * (1 + jnp.cos(math.pi * (1 - jnp.clip(step / up, 0, 1))))
        lr_up = initial + (max_lr - initial) * upf
        t = jnp.clip((step - up) / down, 0, 1)
        downf = 0.5 * (1 + jnp.cos(math.pi * t))
        lr_down = final + (max_lr - final) * downf
        return jnp.where(step < up, lr_up, lr_down)

    return sched


def build_schedule(cfg: Dict[str, Any], max_lr: float, total_steps: int) -> optax.Schedule:
    kind = cfg["type"]
    if kind == "OneCycleLR":
        return onecycle_schedule(
            max_lr,
            total_steps,
            pct_start=cfg.get("pct_start", 0.3),
            div_factor=cfg.get("div_factor", 25.0),
            final_div_factor=cfg.get("final_div_factor", 1e4),
        )
    if kind in ("MultiStepLR", "MultiStepWithWarmupLR"):
        milestones = [int(m * total_steps) for m in cfg.get("milestones", [])]
        gamma = cfg.get("gamma", 0.1)
        bounds = {m: gamma for m in milestones}
        return optax.piecewise_constant_schedule(max_lr, bounds)
    if kind == "PolyLR":
        power = cfg.get("power", 0.9)
        return lambda step: max_lr * (1 - jnp.minimum(step, total_steps) / total_steps) ** power
    if kind == "ExpLR":
        gamma = cfg.get("gamma", 0.9)
        return lambda step: max_lr * gamma ** (step / total_steps)
    if kind == "CosineAnnealingLR":
        return optax.cosine_decay_schedule(max_lr, total_steps)
    raise NotImplementedError(kind)


def _path_contains(path, keyword: str) -> bool:
    return keyword in jax.tree_util.keystr(path)


def build_optimizer(
    cfg: Dict[str, Any],
    params,
    scheduler_cfg: Optional[Dict[str, Any]] = None,
    total_steps: int = 1,
    param_dicts: Optional[Sequence[Dict[str, Any]]] = None,
) -> optax.GradientTransformation:
    """AdamW/SGD/Adam with keyword param groups and per-group schedules."""
    kind = cfg.get("type", "AdamW")
    base_lr = cfg.get("lr", 1e-3)
    wd = cfg.get("weight_decay", 0.0)
    param_dicts = param_dicts or []

    def make_opt(lr_sched):
        if kind == "AdamW":
            return optax.adamw(
                lr_sched,
                b1=cfg.get("betas", (0.9, 0.999))[0],
                b2=cfg.get("betas", (0.9, 0.999))[1],
                weight_decay=wd,
            )
        if kind == "Adam":
            return optax.adam(lr_sched)
        if kind == "SGD":
            return optax.chain(
                optax.sgd(
                    lr_sched,
                    momentum=cfg.get("momentum", 0.9),
                    nesterov=cfg.get("nesterov", False),
                ),
                optax.add_decayed_weights(wd) if wd else optax.identity(),
            )
        raise NotImplementedError(kind)

    def sched_for(lr):
        if scheduler_cfg is None:
            return lr
        return build_schedule(dict(scheduler_cfg), lr, total_steps)

    if not param_dicts:
        return make_opt(sched_for(base_lr))

    # label each leaf with its group
    def label(path, _):
        for i, g in enumerate(param_dicts):
            if _path_contains(path, g["keyword"]):
                return f"group{i}"
        return "default"

    labels = jax.tree_util.tree_map_with_path(label, params)
    transforms = {"default": make_opt(sched_for(base_lr))}
    for i, g in enumerate(param_dicts):
        transforms[f"group{i}"] = make_opt(sched_for(g.get("lr", base_lr)))
    return optax.multi_transform(transforms, labels)


def clip_by_keyword(keywords: Sequence[str], max_norm: float = 0.1):
    """Selective gradient clipping on parameters whose path matches a keyword
    (reference `Trainer.run_step` clip on `gredient_clip` params,
    `engines/train.py:238-252`)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if not keywords:
            return updates, state
        flat = jax.tree_util.tree_flatten_with_path(updates)[0]
        sq = sum(
            jnp.sum(jnp.square(g))
            for p, g in flat
            if any(k in jax.tree_util.keystr(p) for k in keywords)
        )
        norm = jnp.sqrt(jnp.maximum(sq, 1e-16))
        scale = jnp.minimum(1.0, max_norm / norm)

        def maybe_scale(path, g):
            if any(k in jax.tree_util.keystr(path) for k in keywords):
                return g * scale
            return g

        return jax.tree_util.tree_map_with_path(maybe_scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)
