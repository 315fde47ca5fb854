"""Checkpoint save / resume.

Functional-parity target: reference ``bf/training/helpers.py:18-84`` —
step-numbered checkpoints in a timestamped directory, latest-checkpoint
resolution, ``--new-checkpoint`` / ``--load-weights`` semantics, and a config
copy next to the checkpoints for reproducibility.

TPU-first: the state is a pytree ({params, batch_stats, opt_state, step,
lr_scale}) serialized with flax msgpack — there is no pickled-model variant
(incompatible with functional JAX; the reference's ``model`` pickle has no
analog here, ``--load-weights`` behavior is the default).
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import re
import shutil
from typing import Optional, Tuple

import jax
from flax import serialization

_CKPT_RE = re.compile(r'^ckpt-([0-9]+)\.msgpack$')


def find_latest(checkpoint_path: str) -> Optional[str]:
    """Resolve a file or the max-numbered ckpt in a directory
    (parity: helpers.py:18-27)."""
    if os.path.isfile(checkpoint_path):
        return checkpoint_path
    if os.path.isdir(checkpoint_path):
        best = None
        for name in os.listdir(checkpoint_path):
            m = _CKPT_RE.match(name)
            if m and (best is None or int(m[1]) > best[1]):
                best = (name, int(m[1]))
        if best:
            return os.path.join(checkpoint_path, best[0])
    return None


def gather_for_save(state):
    """Under multi-host ZeRO sharding (train.zero_sharding) some leaves are
    not fully addressable — ``device_get`` would fail.  Replicate them via
    a jitted identity (an all-gather on the state's own mesh) so every host
    serializes the complete state.  No-op single-host, replicated, or
    single-host-sharded (all fully addressable).

    COLLECTIVE CONTRACT: when any leaf is cross-host sharded this launches
    a global program — EVERY process must call it (the engine does, before
    gating serialization on process 0).  Calling it from one rank alone
    deadlocks the cluster."""
    arrays = [x for x in jax.tree_util.tree_leaves(state)
              if hasattr(x, 'is_fully_addressable')]
    if all(x.is_fully_addressable or x.is_fully_replicated
           for x in arrays):
        return state
    from jax.sharding import NamedSharding, PartitionSpec

    def replicated_like(x):
        return NamedSharding(x.sharding.mesh, PartitionSpec())

    out_shardings = jax.tree_util.tree_map(replicated_like, state)
    return jax.jit(lambda s: s, out_shardings=out_shardings)(state)


def save(checkpoint_dir: str, state, epoch: int) -> str:
    """Write ckpt-{step}.msgpack + sidecar counters
    (parity: callbacks.py:68-73)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    state = gather_for_save(state)
    step = int(jax.device_get(state.step))
    path = os.path.join(checkpoint_dir, f'ckpt-{step}.msgpack')
    # write-then-rename: a crash mid-write (incl. a killed AsyncSaver
    # daemon thread) must never leave a truncated ckpt-N.msgpack that
    # find_latest would prefer over the last good one — .tmp names don't
    # match _CKPT_RE, and rename is atomic on POSIX
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(serialization.to_bytes(state))
    with open(path + '.meta.json.tmp', 'w') as f:
        json.dump({'epoch': epoch, 'global_step': step}, f)
    os.replace(tmp, path)
    os.replace(path + '.meta.json.tmp', path + '.meta.json')
    logging.info(f'>> Saved checkpoint {path}')
    return path


class AsyncSaver:
    """Non-blocking checkpoint writer (``train.async_checkpoint``,
    beyond-parity — the reference's torch.save blocks the epoch loop,
    callbacks.py:68-73).

    ``save`` snapshots the state with an on-device copy (cheap HBM-to-HBM,
    dispatched asynchronously) and hands the device->host transfer +
    msgpack serialization + disk write to a background thread, so the
    train loop keeps dispatching steps while the checkpoint drains.  The
    device copy is what makes this safe under buffer donation: the next
    train step donates the LIVE state's buffers, never the snapshot's.

    One save in flight at a time (a second ``save`` first joins the
    previous — bounds the transient 2x-state HBM footprint); ``wait()``
    joins and re-raises any background failure.  Call ``wait()`` before
    process exit and before any emergency synchronous save.
    """

    def __init__(self):
        self._thread = None
        self._error = None

    def save(self, checkpoint_dir: str, state, epoch: int) -> None:
        import threading

        import jax.numpy as jnp

        self.wait()

        def copy_leaf(x):
            return jnp.copy(x) if hasattr(x, 'dtype') else x

        snapshot = jax.tree_util.tree_map(copy_leaf, state)

        def run():
            try:
                save(checkpoint_dir, snapshot, epoch)
            except BaseException as exc:  # surfaced on the next wait()
                self._error = exc

        self._thread = threading.Thread(target=run, daemon=True,
                                        name='ckpt-async-save')
        self._thread.start()

    def wait(self) -> None:
        """Join the in-flight save (if any); re-raise its failure."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            error, self._error = self._error, None
            raise error


# ---------------------------------------------------------------- migration
# Key-migration rules (parity: detection/utils/model_fixer/rules.py:10-20 —
# the reference rewrites stale checkpoint keys like the 'predictor.' prefix
# or class->score head renames on load).  Each entry is a
# ``(regex, replacement)`` applied with ``re.sub`` to the '/'-joined path of
# every leaf in an incoming checkpoint whose key set no longer matches the
# model; first matching rule wins.  Empty today (no legacy checkpoints exist
# yet) — append an entry here when a refactor renames parameter paths, e.g.
#   (r'^params/features/base_v1/', 'params/features/base/'),
MIGRATION_RULES: list = []


_EMPTY = object()  # marks an empty dict leaf (e.g. optax.EmptyState) so the
                   # flatten/unflatten round trip preserves it


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        if not tree:
            return {prefix: _EMPTY}
        out = {}
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
        return out
    return {prefix: tree}


def _unflatten(flat: dict) -> dict:
    out: dict = {}
    for path, value in flat.items():
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = {} if value is _EMPTY else value
    return out


def migrate_state_dict(raw: dict, template_dict: dict, rules=None) -> dict:
    """Rewrite stale leaf paths of ``raw`` to match ``template_dict``.

    Applies ``rules`` (default: module-level MIGRATION_RULES) only to keys
    absent from the template; keys that match already pass through
    untouched.  Returns the migrated nested dict; logs every rewrite."""
    rules = MIGRATION_RULES if rules is None else rules
    flat = _flatten(raw)
    want = set(_flatten(template_dict))

    def destination(path):
        if path in want or not rules:
            return path
        joined = '/'.join(path)
        for pattern, repl in rules:
            migrated, n = re.subn(pattern, repl, joined)
            if n:
                return tuple(migrated.split('/'))
        return path

    # resolve every key's destination FIRST, then check collisions against
    # the post-migration key set: chain renames (a->b while b->c) and
    # identity rewrites are fine; two sources landing on one destination
    # would silently drop a tensor and must fail loudly
    out = {}
    for path, value in flat.items():
        dest = destination(path)
        if dest in out:
            raise ValueError(
                f'checkpoint migration collision: {"/".join(path)} -> '
                f'{"/".join(dest)} (destination already produced by '
                'another key)')
        if dest != path:
            logging.info(f'>> checkpoint migration: {"/".join(path)} -> '
                         f'{"/".join(dest)}')
        out[dest] = value
    return _unflatten(out)


def _restore_empty_markers(out: dict, want: dict) -> dict:
    """``_flatten`` marks empty dicts with a sentinel; dropping a subtree's
    last leaf must leave the template's empty-dict marker behind, or the
    whole field vanishes from the state dict (flax then fails with
    'Missing field').  Conversely, a raw marker that gained children is
    harmless: markers precede their fills in insertion order, so
    ``_unflatten`` creates the dict first and the children land inside."""
    def has_children(d, k):
        return any(p != k and p[:len(k)] == k for p in d)
    for k, v in want.items():
        if v is _EMPTY and k not in out and not has_children(out, k):
            out[k] = v
    return out


def _reconcile_ema(raw: dict, template_dict: dict) -> dict:
    """EMA shadow params (state.py ``ema_params``) are auxiliary: a
    checkpoint written before EMA existed (or with it disabled) seeds the
    shadow from its own restored params; one written WITH EMA restored
    into an EMA-disabled run drops it.  Everything outside ``ema_params``
    is untouched — real mismatches still fail loudly in
    ``from_state_dict``."""
    flat, want = _flatten(raw), _flatten(template_dict)
    if flat.keys() == want.keys():
        return raw
    out = {k: v for k, v in flat.items()
           if k[0] != 'ema_params' or k in want}
    dropped = sum(1 for k in flat
                  if k[0] == 'ema_params' and k not in want)
    filled = 0
    for k, v in want.items():
        if k not in out and k[0] == 'ema_params':
            if k == ('ema_params',):
                # bare empty-dict marker: the template has EMA disabled
                out[k] = v
                continue
            # seed the shadow from the checkpoint's own weights — as a
            # COPY: params/ema_params aliasing breaks step donation
            src = flat.get(('params',) + k[1:], v)
            out[k] = src.copy() if hasattr(src, 'copy') else src
            filled += 1
    if dropped:
        logging.info(f'>> checkpoint carries EMA but this run disables it: '
                     f'dropped {dropped} ema_params leaves')
    if filled:
        logging.info(f'>> checkpoint predates EMA: seeded {filled} '
                     'ema_params leaves from its params')
    return _unflatten(_restore_empty_markers(out, want))


def _reconcile_qat(raw: dict, template_dict: dict) -> dict:
    """QAT activation-scale stats (``act_amax`` leaves in batch_stats,
    export/quantize.py) are auxiliary: a float checkpoint restored into a
    QAT run gets the template's zeros (the EMA re-seeds on the first
    batch); a QAT checkpoint restored into a float run drops them.  Real
    mismatches outside ``act_amax`` still fail loudly downstream."""
    flat, want = _flatten(raw), _flatten(template_dict)
    if flat.keys() == want.keys():
        return raw
    out = {k: v for k, v in flat.items()
           if k[-1] != 'act_amax' or k in want}
    dropped = len(flat) - len(out)
    filled = 0
    for k, v in want.items():
        if k not in out and k[-1] == 'act_amax':
            out[k] = v  # template zero: uncalibrated -> bypass until EMA
            filled += 1
    if dropped:
        logging.info(f'>> checkpoint carries QAT act_amax but this run '
                     f'disables QAT: dropped {dropped} leaves')
    if filled:
        logging.info(f'>> checkpoint predates QAT: {filled} act_amax '
                     'stats start uncalibrated')
    return _unflatten(_restore_empty_markers(out, want))


def restore(path: str, template_state, rules=None) -> Tuple[object, dict]:
    """Restore a state pytree into the template's structure; returns
    (state, meta) (parity: helpers.py:44-66).  Checkpoints whose parameter
    paths predate a rename are rewritten via ``migrate_state_dict``."""
    with open(path, 'rb') as f:
        raw = serialization.msgpack_restore(f.read())
    template_dict = serialization.to_state_dict(template_state)
    if _flatten(raw).keys() != _flatten(template_dict).keys():
        raw = migrate_state_dict(raw, template_dict, rules)
        raw = _reconcile_ema(raw, template_dict)
        raw = _reconcile_qat(raw, template_dict)
    state = serialization.from_state_dict(template_state, raw)
    meta = {'epoch': 0, 'global_step': int(jax.device_get(state.step))}
    meta_path = path + '.meta.json'
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta.update(json.load(f))
    logging.info(f'>> Restored checkpoint {path} (epoch {meta["epoch"]}, '
                 f'step {meta["global_step"]})')
    return state, meta


def restore_weights_only(path: str, template_state):
    """--load-weights: restore params/batch_stats, keep fresh optimizer
    (parity: helpers.py:56-59).  The EMA shadow (already reconciled to the
    template's structure by ``restore``) comes along too — otherwise an
    EMA-enabled run would eval on the template's random-init shadow."""
    state, _ = restore(path, template_state)
    return template_state.replace(params=state.params,
                                  batch_stats=state.batch_stats,
                                  ema_params=state.ema_params)


def prepare_checkpoint_dir(save_dir: str, checkpoint: Optional[str],
                           config_path: Optional[str], debug: bool,
                           train: bool, new_checkpoint: bool = False) -> str:
    """Pick/create the checkpoint dir + copy the config into it
    (parity: helpers.py:68-84)."""
    if checkpoint and os.path.isdir(checkpoint) and not new_checkpoint:
        checkpoint_dir = checkpoint
    else:
        stamp = f'{datetime.datetime.today():%F-%H%M%S}'
        checkpoint_dir = os.path.join(save_dir, stamp)

    if not debug and train:
        os.makedirs(checkpoint_dir, exist_ok=True)
        logging.info(f'>> Checkpoints will be saved to {checkpoint_dir}')
        if config_path and os.path.exists(config_path):
            dest = os.path.join(checkpoint_dir, 'config.py')
            if not os.path.exists(dest) or not os.path.samefile(config_path, dest):
                shutil.copy(config_path, dest)
    return checkpoint_dir
