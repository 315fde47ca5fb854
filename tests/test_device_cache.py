"""HBM-resident staged dataset (data/device_cache.py).

The cache must be a pure transport change: training with
``train.device_cache`` enabled is BITWISE identical to host streaming —
same loader permutation, same drop_last truncation, same fused chunking.
"""

import os

import jax
import numpy as np

from single_shot_detection_tpu.train.engine import Experiment
from single_shot_detection_tpu.utils.config import load_config

SMOKE = os.path.join(os.path.dirname(__file__), '..', 'samples',
                     'synthetic_smoke.py')


def _run(device_cache, epochs=2, fused_steps=1, num_images=None):
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = epochs
    cfg.config.train['eval_every'] = 99
    cfg.config.train['device_cache'] = device_cache
    if fused_steps > 1:
        cfg.config.train['fused_steps'] = fused_steps
    if num_images is not None:
        cfg.config.dataset['train']['num_images'] = num_images
    exp = Experiment(cfg, phases=['train'], debug=True)
    rows = exp.train()
    return exp, rows


def _assert_params_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_device_cache_bitwise_equivalent():
    exp_off, rows_off = _run(device_cache=False)
    exp_on, rows_on = _run(device_cache=True)
    # the cache filled during epoch 0 and served epoch 1
    assert exp_on._device_cache is not None and exp_on._device_cache.ready
    _assert_params_equal(exp_off.state.params, exp_on.state.params)
    assert rows_off[-1]['train_loss'] == rows_on[-1]['train_loss']


def test_device_cache_tops_up_drop_last_rows():
    """batch 8 over 29 images: drop_last hides up to 5 rows per epoch —
    finalize must stage them directly so later epochs can shuffle ALL
    samples (matching the host loader, which re-rolls the drop each epoch
    from the full index set)."""
    exp_off, _ = _run(device_cache=False, epochs=3, num_images=29)
    exp_on, _ = _run(device_cache=True, epochs=3, num_images=29)
    assert exp_on._device_cache.ready
    assert exp_on._device_cache.n == 29
    _assert_params_equal(exp_off.state.params, exp_on.state.params)


def test_device_cache_fused_steps_equivalent():
    exp_off, _ = _run(device_cache=False, fused_steps=2)
    exp_on, _ = _run(device_cache=True, fused_steps=2)
    _assert_params_equal(exp_off.state.params, exp_on.state.params)


def test_device_cache_over_budget_falls_back():
    from single_shot_detection_tpu.data.device_cache import make_device_cache
    exp, _ = _run(device_cache=False, epochs=0)
    cache = make_device_cache(exp.loaders['train'], {'max_bytes': 1024})
    assert cache is None  # over budget -> disabled, streaming continues


def test_eval_replay_cache_matches_fresh_eval():
    """Under train.device_cache, the first eval's sharded device batches
    replay for later evals (eval batches are identical every epoch) —
    results must be bitwise equal to a fresh no-cache eval."""
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 0
    cfg.config.train['device_cache'] = True
    exp = Experiment(cfg, phases=['train', 'eval'], debug=True)
    assert exp._eval_cache is None
    first = exp.evaluate()
    assert exp._eval_cache, 'eval replay cache did not fill'
    replay = exp.evaluate()  # served from the device-batch replay
    assert first == replay

    cfg2 = load_config(SMOKE)
    cfg2.config.train['epochs'] = 0
    exp2 = Experiment(cfg2, phases=['train', 'eval'], debug=True)
    assert exp2._eval_cache is None
    fresh = exp2.evaluate()
    assert exp2._eval_cache is None  # knob off -> no retention
    assert fresh == first


def test_eval_replay_decoupled_from_train_loader():
    """--phases eval (no train loader) + eval.device_cache hits the replay
    path: recurring evals on a trained checkpoint get the measured 9.6x
    win without a train config knob (round-4 verdict #5)."""
    cfg = load_config(SMOKE, phases=('eval',))
    cfg.config.eval = {'device_cache': True}
    exp = Experiment(cfg, phases=['eval'], debug=True)
    assert 'train' not in exp.loaders
    first = exp.evaluate()
    assert exp._eval_cache, 'eval replay cache did not fill'
    assert first == exp.evaluate()


def test_eval_replay_over_budget_streams():
    """The replay cache must refuse to grow past max_bytes (minus the
    train cache's footprint) and fall back to streaming — an optimization
    must never become an OOM (round-4 verdict #2)."""
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 0
    cfg.config.train['device_cache'] = {'max_bytes': 1 << 10}  # tiny
    exp = Experiment(cfg, phases=['train', 'eval'], debug=True)
    # train cache itself is over budget -> disabled; replay budget = 1 MiB
    assert exp._device_cache is None
    first = exp.evaluate()
    assert exp._eval_cache is None  # over budget -> streamed
    assert exp._eval_replay_cfg is None  # no refill attempt on later evals
    assert exp.evaluate() == first


def test_eval_replay_budget_charges_train_cache():
    """Replay shares the device-cache byte budget WITH the train cache:
    a budget that fits the train cache but not train + eval must stream
    evals while keeping the train cache."""
    from single_shot_detection_tpu.data.device_cache import DeviceDatasetCache
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 1
    cfg.config.train['eval_every'] = 1
    exp_probe = Experiment(cfg, phases=['train'], debug=True)
    train_bytes = DeviceDatasetCache(
        exp_probe.loaders['train']).total_bytes
    cfg2 = load_config(SMOKE)
    cfg2.config.train['epochs'] = 1
    cfg2.config.train['eval_every'] = 1
    # fits the train cache, leaves < one eval batch of headroom
    cfg2.config.train['device_cache'] = {'max_bytes': train_bytes + 1024}
    exp = Experiment(cfg2, phases=['train', 'eval'], debug=True)
    assert exp._device_cache is not None
    exp.train()
    assert exp._device_cache.ready
    assert exp._eval_cache is None  # eval replay over the joint budget


def test_cached_epoch_single_device_sync(monkeypatch):
    """A device-cached epoch must pay exactly ONE host<->device pull
    (the metric_sums pull): the progress-print syncs (a forced first-step
    print from the zero throttle seed + a forced last-step print) were
    measured at +31% e2e at b128 / +153% at b32 through the relay
    (docs/PERF.md round-5 "Per-epoch sync discipline")."""
    exp, _ = _run(device_cache=True, epochs=2)
    assert exp._device_cache.ready

    from single_shot_detection_tpu.train import engine as engine_mod

    class _FrozenTime:
        """time stub: throttled prints can never fire (now - last == 0)."""
        @staticmethod
        def time():
            return 1000.0

    monkeypatch.setattr(engine_mod, 'time', _FrozenTime)
    pulls = []
    real_get = jax.device_get
    monkeypatch.setattr(engine_mod.jax, 'device_get',
                        lambda x: pulls.append(1) or real_get(x))
    loader = exp.loaders['train']
    exp._epoch_batches(loader, len(loader), epoch=2)
    assert sum(pulls) == 1
