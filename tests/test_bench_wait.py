"""bench.wait_for_backend: bounded wait for the remote-TPU relay.

The driver runs bench.py unattended at round end; if the relay is mid-outage
the old behavior died on backend init and recorded nothing.  These tests pin
the three wait behaviors with a faked probe (no real backend is touched).
"""

import subprocess
import sys

import pytest


@pytest.fixture()
def bench_mod():
    sys.path.insert(0, '/root/repo')
    import bench
    yield bench
    sys.path.remove('/root/repo')


def _fake_run(returncodes):
    """subprocess.run stub yielding the given probe returncodes in order."""
    seq = iter(returncodes)

    def run(cmd, capture_output, timeout):
        code = next(seq)
        if code == 'hang':
            raise subprocess.TimeoutExpired(cmd, timeout)
        return subprocess.CompletedProcess(cmd, code)

    return run


def test_returns_immediately_when_backend_up(bench_mod, monkeypatch):
    calls = []

    def run(cmd, capture_output, timeout):
        calls.append(cmd)
        return subprocess.CompletedProcess(cmd, 0)

    monkeypatch.setattr(bench_mod.subprocess, 'run', run)
    bench_mod.wait_for_backend(max_wait_s=0)
    assert len(calls) == 1


def test_waits_through_outage_then_proceeds(bench_mod, monkeypatch):
    monkeypatch.setattr(bench_mod.subprocess, 'run', _fake_run([1, 'hang', 0]))
    monkeypatch.setattr(bench_mod.time, 'sleep', lambda s: None)
    bench_mod.wait_for_backend(max_wait_s=3600)  # returns on the third probe


def test_gives_up_after_deadline(bench_mod, monkeypatch):
    monkeypatch.setattr(bench_mod.subprocess, 'run', _fake_run([1] * 50))
    monkeypatch.setattr(bench_mod.time, 'sleep', lambda s: None)
    bench_mod.wait_for_backend(max_wait_s=0)  # single failed probe, no raise


def test_env_override(bench_mod, monkeypatch):
    monkeypatch.setenv('BENCH_BACKEND_WAIT_S', '0')
    monkeypatch.setattr(bench_mod.subprocess, 'run', _fake_run([1]))
    bench_mod.wait_for_backend()  # env window of 0: one probe, give up
