"""Train state + jitted data-parallel train/eval steps.

The TPU counterpart of `Trainer.run_step`
(reference `pointcept/engines/train.py:216-271`): forward + loss -> grads ->
cross-device `pmean` over the "data" mesh axis -> selective grad clip ->
optimizer update. bfloat16 compute replaces the reference's AMP GradScaler
machinery entirely (bf16 needs no loss scaling).
"""

from __future__ import annotations

import functools
import inspect
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

_SHARD_MAP_PARAMS = frozenset(inspect.signature(jax.shard_map).parameters)


def _shard_map(f, mesh, in_specs, out_specs):
    """shard_map across JAX versions: the replication-check kwarg was renamed
    `check_rep` -> `check_vma`; we disable it either way (outputs are pmean-ed
    to replicated, which the static checker cannot always prove)."""
    kwargs = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    if "check_vma" in _SHARD_MAP_PARAMS:
        kwargs["check_vma"] = False
    elif "check_rep" in _SHARD_MAP_PARAMS:
        kwargs["check_rep"] = False
    return jax.shard_map(f, **kwargs)

from cdsegnet_tpu.models.losses import Criteria
from cdsegnet_tpu.models.structure import PointBatch, make_point_batch
from cdsegnet_tpu.parallel.mesh import DATA_AXIS


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation, rng: jax.Array):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            rng=rng,
        )


def batch_to_point(batch: Dict[str, jnp.ndarray], depth: int, num_scenes: int) -> PointBatch:
    return make_point_batch(
        coord=batch["coord"],
        feat=batch["feat"],
        grid_coord=batch["grid_coord"],
        batch=batch["batch"],
        mask=batch["mask"],
        segment=batch.get("segment"),
        instance=batch.get("instance"),
        instance_centroid=batch.get("instance_centroid"),
        depth=depth,
        num_scenes=num_scenes,
    )


def _build_grad_step(apply_loss, tx, mesh, microbatch=1):
    """Shared grad/update/shard pipeline for every train-step flavor.

    ``apply_loss(state, batch, rngs)`` returns a closure-ready
    ``(loss_fn(params) -> (loss, (out, new_stats)), extra_metrics_fn(out))``
    pair; everything else — per-(step, device) rng folding, value_and_grad,
    gradient/metric pmean over ICI, the optax update, and the shard_map
    wiring — lives here once.

    ``microbatch`` > 1 expects every batch array to carry a leading
    microbatch axis and accumulates gradients over it with `lax.scan`
    (each iteration's forward+backward residuals are freed before the
    next starts — the recipe-scale bucket trains the fast unrolled
    no-remat layout in HBM slices the whole bucket could not fit).
    Morally the reference's bs2/GPU recipe with sequential scenes
    (`configs/scannet/CDSegNet.py:4-152`); one optimizer update per call.
    """

    def _grads_single(state, batch, step_rng):
        k_drop, k_shuf, k_diff = jax.random.split(step_rng, 3)
        rngs = dict(dropout=k_drop, shuffle=k_shuf, diffusion=k_diff)
        loss_fn, extra_metrics = apply_loss(state, batch, rngs)
        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return loss, grads, new_stats, extra_metrics(out)

    def _grads_micro(state, batch, step_rng):
        grads0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)

        def body(carry, xs):
            stats, grads_acc = carry
            mb, idx = xs
            mrng = jax.random.fold_in(step_rng, idx)
            loss, grads, new_stats, extras = _grads_single(
                state.replace(batch_stats=stats), mb, mrng
            )
            grads_acc = jax.tree_util.tree_map(
                jnp.add, grads_acc, grads
            )
            return (new_stats, grads_acc), (loss, extras)

        (new_stats, grads), (losses, extras) = jax.lax.scan(
            body,
            (state.batch_stats, grads0),
            (batch, jnp.arange(microbatch, dtype=jnp.int32)),
        )
        grads = jax.tree_util.tree_map(lambda g: g / microbatch, grads)
        # integer diagnostics (valid_points, dropped_l*) sum over the
        # microbatches of one logical step; float metrics average
        extras = {
            k: (
                jnp.sum(v, axis=0)
                if jnp.issubdtype(jnp.asarray(v).dtype, jnp.integer)
                else jnp.mean(v, axis=0)
            )
            for k, v in extras.items()
        }
        return jnp.mean(losses), grads, new_stats, extras

    def local_step(state: TrainState, batch, dev_idx):
        step_rng = jax.random.fold_in(state.rng, state.step)
        step_rng = jax.random.fold_in(step_rng, dev_idx)
        grads_fn = _grads_micro if microbatch > 1 else _grads_single
        loss, grads, new_stats, extras = grads_fn(state, batch, step_rng)
        if mesh is not None:
            grads = jax.lax.pmean(grads, DATA_AXIS)
            loss_avg = jax.lax.pmean(loss, DATA_AXIS)
            new_stats = jax.lax.pmean(new_stats, DATA_AXIS)
        else:
            loss_avg = loss
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(loss=loss_avg)
        for k, v in extras.items():
            metrics[k] = (
                jax.lax.pmean(v, DATA_AXIS)
                if (mesh is not None and jnp.issubdtype(
                    jnp.asarray(v).dtype, jnp.floating))
                else v
            )
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
        )
        return new_state, metrics

    if mesh is None:
        # donate the state: without it the old and new params + optimizer
        # moments (~3x params) are both live across the step — measured as
        # the difference between fitting and OOM for the 104k-point train
        # bucket on a 16G v5e chip
        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_fn(state, batch):
            return local_step(state, batch, jnp.int32(0))

        return step_fn

    def sharded(state, batch):
        dev = jax.lax.axis_index(DATA_AXIS)
        # strip the leading device axis inside the shard
        local_batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        return local_step(state, local_batch, dev)

    smapped = _shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
    )
    return jax.jit(smapped, donate_argnums=(0,))


def _find_sown(tree, name):
    """First sow'd value named ``name`` in a nested intermediates dict
    (sow stores values under the owning submodule's path, as 1-tuples)."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            if k == name:
                return v[0] if isinstance(v, tuple) else v
            found = _find_sown(v, name)
            if found is not None:
                return found
    return None


def make_train_step(
    model,
    criteria: Criteria,
    tx: optax.GradientTransformation,
    depth: int,
    num_scenes: int,
    mesh: Optional[Mesh] = None,
    model_kwargs: Optional[Dict] = None,
    microbatch: int = 1,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict]]:
    """Build the jitted train step.

    With a mesh, the batch dict must carry a leading device axis; shard_map
    runs one bucket per device and averages grads via psum over ICI.
    ``model_kwargs`` are extra *static* arguments forwarded to the model
    (e.g. PPT's per-dataset ``condition`` index — one compiled step per
    dataset, built by ``MultiDatasetTrainer``).
    ``microbatch`` > 1 expects a leading microbatch axis on every batch
    array (innermost of the device axis, when both are present) and
    accumulates gradients sequentially — see `_build_grad_step`.
    """
    model_kwargs = model_kwargs or {}

    def apply_loss(state, batch, rngs):
        point = batch_to_point(batch, depth, num_scenes)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                point,
                train=True,
                rngs=rngs,
                mutable=["batch_stats", "intermediates"],
                **model_kwargs,
            )
            # surface sow'd diagnostics (e.g. the backbone's per-level
            # pyramid overflow counts) as metrics without touching the
            # model's return signature
            drops = _find_sown(mutated.get("intermediates", {}),
                               "pyramid_dropped")
            if drops is not None:
                out = dict(out, pyramid_dropped=drops)
            loss = criteria(out, mode="train")
            return loss, (out, mutated["batch_stats"])

        def extra_metrics(out):
            m = dict(valid_points=jnp.sum(point.mask))
            if "pyramid_dropped" in out:
                drops = out["pyramid_dropped"]
                for i in range(drops.shape[0]):
                    m[f"dropped_l{i + 1}"] = drops[i]
            return m

        return loss_fn, extra_metrics

    return _build_grad_step(apply_loss, tx, mesh, microbatch=microbatch)


def make_msc_train_step(
    model,
    criteria: Criteria,
    tx: optax.GradientTransformation,
    depth: int,
    num_scenes: int,
    mesh: Optional[Mesh] = None,
    feat_keys=("color", "normal"),
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict]]:
    """Two-view contrastive train step for MaskedSceneContrast.

    The batch carries ``view{1,2}_{coord,grid_coord,feat,batch,mask,
    origin_coord,target_*}`` buckets from `collate_pair_scenes`; the model
    returns an in-model ``loss`` (Criteria passes it through)."""

    def view_point(batch, pref):
        sub = {
            k[len(pref):]: v for k, v in batch.items() if k.startswith(pref)
        }
        return batch_to_point(sub, depth, num_scenes), sub

    def apply_loss(state, batch, rngs):
        p1, s1 = view_point(batch, "view1_")
        p2, s2 = view_point(batch, "view2_")
        t1 = {k: s1["target_" + k] for k in feat_keys}
        t2 = {k: s2["target_" + k] for k in feat_keys}

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                p1, p2, s1["origin_coord"], s2["origin_coord"], t1, t2,
                train=True, rngs=rngs, mutable=["batch_stats"],
            )
            return criteria(out, mode="train"), (out, mutated["batch_stats"])

        def extra_metrics(out):
            m = dict(valid_points=jnp.sum(p1.mask))
            for k in ("nce_loss", "pos_sim", "neg_sim"):
                if k in out:
                    m[k] = out[k]
            return m

        return loss_fn, extra_metrics

    return _build_grad_step(apply_loss, tx, mesh)


def make_eval_step(model, criteria: Optional[Criteria], depth: int,
                   num_scenes: int, model_kwargs: Optional[Dict] = None):
    """Jitted SSI inference step returning logits (+ optional eval loss).

    Models exposing an ``inference`` method (the CNF family's SSI) use it;
    everything else evaluates through the plain forward, with ``n_pred``
    exported as ``seg_logits`` for the evaluator.
    """
    model_kwargs = model_kwargs or {}
    has_inference = hasattr(type(model), "inference")

    @jax.jit
    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        point = batch_to_point(batch, depth, num_scenes)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if has_inference:
            return model.apply(
                variables, point, method=type(model).inference,
                rngs=dict(diffusion=rng), **model_kwargs,
            )
        out = model.apply(
            variables, point, train=False, rngs=dict(diffusion=rng),
            **model_kwargs,
        )
        if not isinstance(out, dict):
            out = dict(n_pred=out.feat)
        if "seg_logits" not in out and "n_pred" in out:
            out = dict(out, seg_logits=out["n_pred"])
        return out

    return step_fn
