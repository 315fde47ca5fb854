"""GPipe-style pipeline parallelism over the mesh's ``model`` axis.

Beyond-parity: the reference has no pipeline story (SURVEY.md §2.8 — "PP:
no").  This completes the framework's parallelism matrix (data / tensor /
spatial / ZeRO / pipeline) for deployments where one chip cannot hold the
model + activations and channel (tensor) sharding is a poor fit — e.g.
very deep backbones whose per-layer widths don't divide the mesh.

Design — the idiomatic-JAX pipeline (no hand-written backward):

  * The detector splits at its natural seam (models/detector.py
    ``stage=0/1``): stage 0 = backbone + neck -> (sources, x); stage 1 =
    extras + predictor + heads -> (scores, locs).
  * Inside ``jax.shard_map`` over ``('data', 'model')``, each device runs
    ONLY its stage: ``lax.switch`` on ``lax.axis_index('model')`` compiles
    both stage programs but executes one per core (HLO conditional).
  * Microbatches flow on the pipeline diagonal via a ``lax.scan`` of
    ``M + S - 1`` ticks; neighbor hand-off is a ``lax.ppermute`` of a
    UNIFORM flattened ring buffer ``[B_micro, L]`` (stage boundaries have
    heterogeneous activation shapes — each stage packs its pytree into the
    buffer and the next unpacks it; ``L = max`` over boundaries, f32 so
    bf16/f32 leaves round-trip losslessly).
  * The BACKWARD pipeline is derived by autodiff: the transpose of the
    scan runs the reverse diagonal and the transpose of each ppermute is
    the reversed ppermute — exactly GPipe's backward schedule, with the
    scan stashing per-tick activations (the GPipe memory profile).
  * Bubble ticks compute on zero/stale buffers; their outputs are never
    selected into the result, so their gradient contribution is exactly
    zero.  Bubble fraction: (S-1)/(M+S-1).

Scope: S = the mesh's model-axis size.  S = 2 splits any detector at the
backbone/heads seam; S > 2 additionally splits the M2Det TUM chain into
per-stage segments (models/detector.py ``n_stages`` + MLFPN
``tum_range`` — the natural deep-model fit: 8 TUMs dominate m2det's 69M
params).  The forward runs ``train=False`` — pipeline training is the
frozen-BN / GroupNorm regime (batch statistics cannot be mutated inside a
scanned, staged forward; the engine enforces ``train.frozen_bn`` or
``train.group_norm``).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from single_shot_detection_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

N_STAGES = 2  # default seam count: backbone/neck | extras/predictor/heads


def _per_example_size(shapes) -> int:
    """Total flattened per-example element count of a ShapeDtypeStruct tree
    (leaves carry a leading microbatch axis)."""
    return sum(math.prod(s.shape[1:]) for s in jax.tree_util.tree_leaves(shapes))


def _pack(tree, size: int, dtype) -> jnp.ndarray:
    """Flatten a pytree of [Bm, ...] arrays into one [Bm, size] buffer
    (zero-padded); f32 buffers round-trip bf16/f32 leaves losslessly."""
    leaves = jax.tree_util.tree_leaves(tree)
    flat = jnp.concatenate(
        [l.reshape(l.shape[0], -1).astype(dtype) for l in leaves], axis=1)
    pad = size - flat.shape[1]
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    return flat


def _unpack(buf: jnp.ndarray, shapes):
    """Inverse of :func:`_pack` for a ShapeDtypeStruct tree whose leading
    axis equals ``buf.shape[0]``."""
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    out, offset = [], 0
    for s in leaves:
        n = math.prod(s.shape[1:])
        out.append(buf[:, offset:offset + n]
                   .reshape((buf.shape[0],) + tuple(s.shape[1:]))
                   .astype(s.dtype))
        offset += n
    return jax.tree_util.tree_unflatten(treedef, out)


def _batched(shapes, batch: int):
    """Re-lead a ShapeDtypeStruct tree with a different batch size."""
    return jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct((batch,) + tuple(s.shape[1:]), s.dtype),
        shapes)


def make_pipeline_apply(module, mesh, microbatches: int,
                        apply: Optional[Callable] = None,
                        buf_dtype=jnp.float32) -> Callable:
    """Build an ``apply``-compatible pipelined forward.

    ``apply`` defaults to ``module.apply``; pass a trace-time override
    (e.g. models/norm.group_norm_apply) to compose — stage kwargs are
    forwarded through it.

    Returns ``pipeline_apply(variables, images, train=False)`` producing
    the same ``(scores, locs)`` as the plain forward (pinned by
    tests/test_pipeline.py), with stage k executing on model-axis index k.
    The stage count S is the mesh's model-axis size: 2 = the universal
    backbone | heads seam; > 2 = M2Det TUM-chain segments
    (models/detector.py ``n_stages``).
    """
    apply = apply if apply is not None else module.apply
    S = int(mesh.shape[MODEL_AXIS])
    if S < 2:
        raise ValueError(
            f'pipeline parallelism needs a model axis of >= 2 stages, '
            f'mesh has {S}')
    M = int(microbatches)
    if M < 1:
        raise ValueError(f'microbatches must be >= 1, got {M}')
    n_data = int(mesh.shape[DATA_AXIS])
    perm = [(i, i + 1) for i in range(S - 1)]

    def pipeline_apply(variables, images, train: bool = False, mutable=()):
        if train or mutable:
            raise ValueError(
                'the pipelined forward runs train=False with no mutable '
                'collections (frozen-BN / GroupNorm regime) — batch '
                'statistics cannot update inside a scanned, staged forward')
        batch = images.shape[0]
        if batch % (n_data * M):
            raise ValueError(
                f'global batch {batch} must divide by data axis ({n_data}) '
                f'x microbatches ({M})')
        b_local = batch // n_data
        b_micro = b_local // M

        # trace-time stage boundary layouts (per microbatch): chain
        # eval_shape through the S-1 boundaries, then the final output
        img_m = jax.ShapeDtypeStruct((b_micro,) + images.shape[1:],
                                     images.dtype)
        boundary_shapes = []
        for k in range(S - 1):
            if k == 0:
                cur = jax.eval_shape(
                    lambda v, x: apply(v, x, train=False, stage=0,
                                       n_stages=S), variables, img_m)
            else:
                cur = jax.eval_shape(
                    lambda v, t, _k=k: apply(v, None, train=False, stage=_k,
                                             stage_state=t, n_stages=S),
                    variables, boundary_shapes[-1])
            boundary_shapes.append(cur)
        out_shapes_m = jax.eval_shape(
            lambda v, t: apply(v, None, train=False, stage=S - 1,
                               stage_state=t, n_stages=S),
            variables, boundary_shapes[-1])
        size = max(max(_per_example_size(s) for s in boundary_shapes),
                   _per_example_size(out_shapes_m))

        def body(variables, images):
            stage_idx = jax.lax.axis_index(MODEL_AXIS)
            micro = images.reshape((M, b_micro) + images.shape[1:])

            def make_stage(k):
                if k == 0:
                    def stage_fn(recv, img):
                        del recv
                        out = apply(variables, img, train=False, stage=0,
                                    n_stages=S)
                        return _pack(out, size, buf_dtype)
                else:
                    def stage_fn(recv, img):
                        del img
                        state = _unpack(recv, boundary_shapes[k - 1])
                        out = apply(variables, None, train=False, stage=k,
                                    stage_state=state, n_stages=S)
                        return _pack(out, size, buf_dtype)
                return stage_fn

            branches = tuple(make_stage(k) for k in range(S))

            def tick(carry, t):
                recv, acc = carry
                img = jax.lax.dynamic_index_in_dim(
                    micro, jnp.clip(t, 0, M - 1), 0, keepdims=False)
                out = jax.lax.switch(stage_idx, branches, recv, img)
                send = jax.lax.ppermute(out, MODEL_AXIS, perm)
                # the last stage finishes microbatch m = t - (S-1); bubble
                # ticks (invalid m) write nothing, so garbage never reaches
                # the loss and its gradients are exactly zero
                m_done = t - (S - 1)

                def write(a):
                    return jax.lax.dynamic_update_index_in_dim(
                        a, out, jnp.clip(m_done, 0, M - 1), 0)

                acc = jax.lax.cond((m_done >= 0) & (m_done < M),
                                   write, lambda a: a, acc)
                return (send, acc), None

            recv0 = jnp.zeros((b_micro, size), buf_dtype)
            acc0 = jnp.zeros((M, b_micro, size), buf_dtype)
            (_, acc), _ = jax.lax.scan(tick, (recv0, acc0),
                                       jnp.arange(M + S - 1))

            # results live on the last stage's cores; select-then-psum
            # broadcasts them over the model axis (select, not multiply:
            # a stray inf in a dead buffer must not become 0*inf)
            acc = jnp.where(stage_idx == S - 1, acc, jnp.zeros_like(acc))
            acc = jax.lax.psum(acc, MODEL_AXIS)
            flat = acc.reshape(M * b_micro, size)
            return _unpack(flat, _batched(out_shapes_m, M * b_micro))

        out_shapes = jax.eval_shape(
            lambda v, x: apply(v, x, train=False), variables, images)
        out_specs = jax.tree_util.tree_map(
            lambda s: P(DATA_AXIS, *([None] * (len(s.shape) - 1))),
            out_shapes)
        in_specs = (jax.tree_util.tree_map(lambda _: P(), variables),
                    P(DATA_AXIS, *([None] * (images.ndim - 1))))
        return jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)(
                                 variables, images)

    return pipeline_apply
