"""Persistent XLA compilation cache (utils/compile_cache.py).

Beyond-parity: compiled programs are reused across processes from disk —
on the remote-TPU harness a flagship train-step compile costs minutes and
every re-run of the same config pays it again without this.
"""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from single_shot_detection_tpu.train.engine import Experiment
from single_shot_detection_tpu.utils import compile_cache
from single_shot_detection_tpu.utils.config import load_config

SMOKE = os.path.join(os.path.dirname(__file__), '..', 'samples',
                     'synthetic_smoke.py')


@pytest.fixture
def restore_cache_config():
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    yield
    jax.config.update('jax_compilation_cache_dir', prev_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', prev_min)


def test_enable_populates_cache_dir(tmp_path, restore_cache_config):
    d = compile_cache.enable_compilation_cache(
        str(tmp_path / 'xla'), min_compile_time_secs=0.0)
    assert d == str(tmp_path / 'xla') and os.path.isdir(d)

    @jax.jit
    def f(x):
        return (x * 3.0 + 1.0).sum()

    f(jnp.ones((128, 128))).block_until_ready()
    assert glob.glob(os.path.join(d, '*')), 'no cache entry written'


def test_off_disables(restore_cache_config):
    assert compile_cache.enable_compilation_cache('off') is None
    assert jax.config.jax_compilation_cache_dir is None
    assert compile_cache.enable_compilation_cache(False) is None


def test_default_resolves_to_user_cache_path(restore_cache_config):
    d = compile_cache.enable_compilation_cache(True)
    assert d == compile_cache.DEFAULT_CACHE_DIR


def test_engine_respects_existing_user_cache_dir():
    # conftest.py points JAX at a session tmpdir; an Experiment with no
    # explicit setting must leave the user's choice alone
    before = jax.config.jax_compilation_cache_dir
    assert before, 'conftest should have set a cache dir'
    cfg = load_config(SMOKE)
    Experiment(cfg, phases=['train'], debug=True)
    assert jax.config.jax_compilation_cache_dir == before


def test_engine_config_knob_overrides(tmp_path, restore_cache_config):
    cfg = load_config(SMOKE)
    cfg.config.train['compilation_cache'] = str(tmp_path / 'engine_xla')
    Experiment(cfg, phases=['train'], debug=True)
    assert (jax.config.jax_compilation_cache_dir
            == str(tmp_path / 'engine_xla'))

    cfg2 = load_config(SMOKE)
    cfg2.config.train['compilation_cache'] = False
    Experiment(cfg2, phases=['train'], debug=True)
    assert jax.config.jax_compilation_cache_dir is None
