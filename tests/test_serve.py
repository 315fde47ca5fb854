"""tools/serve.py — dynamic-batching HTTP server over a standalone artifact."""

import importlib.util
import io
import json
import os
import threading

import numpy as np
import pytest

from single_shot_detection_tpu.train.engine import Experiment
from single_shot_detection_tpu.utils.config import load_config

SMOKE = os.path.join(os.path.dirname(__file__), '..', 'samples',
                     'synthetic_smoke.py')


def _load_tool():
    tool = os.path.join(os.path.dirname(__file__), '..', 'tools', 'serve.py')
    spec = importlib.util.spec_from_file_location('serve_tool', tool)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _png_bytes(w, h, seed):
    from PIL import Image
    arr = (np.random.RandomState(seed).rand(h, w, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format='PNG')
    return buf.getvalue()


@pytest.fixture(scope='module')
def artifact(tmp_path_factory):
    from single_shot_detection_tpu.export import export_model
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 0
    exp = Experiment(cfg, phases=['train'], debug=True)
    path = export_model(exp, str(tmp_path_factory.mktemp('srv') / 'model'),
                        with_postprocess=True, with_preprocess=True,
                        bake_variables=True, batch_size=4)
    return path


@pytest.fixture(scope='module')
def server(artifact):
    serve = _load_tool()
    # a generous latency budget so the three concurrent test requests
    # always coalesce on the 1-core CI host
    srv, batcher = serve.make_server(artifact, port=0, max_delay_ms=1000.0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        yield srv.server_address, batcher
    finally:
        srv.shutdown()
        batcher.stop()


def _request(addr, method, path, body=None):
    import http.client
    conn = http.client.HTTPConnection(*addr, timeout=60)
    try:
        conn.request(method, path, body=body)
        resp = conn.getresponse()
        return resp.status, json.loads(resp.read().decode())
    finally:
        conn.close()


def test_healthz(server):
    addr, batcher = server
    status, payload = _request(addr, 'GET', '/healthz')
    assert status == 200
    assert payload == {'status': 'ok', 'batch': 4, 'input_hw': [128, 128]}


def test_concurrent_requests_batch_and_rescale(server):
    addr, batcher = server
    before = batcher.stats()
    sizes = [(64, 96), (256, 200), (128, 128)]
    results = [None] * len(sizes)

    def post(i, w, h):
        results[i] = _request(addr, 'POST', '/detect?min_score=0.0',
                              _png_bytes(w, h, seed=i))

    threads = [threading.Thread(target=post, args=(i, w, h))
               for i, (w, h) in enumerate(sizes)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for (w, h), (status, payload) in zip(sizes, results):
        assert status == 200
        assert payload['size'] == [w, h]
        for x1, y1, x2, y2, cls, score in payload['detections']:
            # boxes rescaled to source pixels (decoded boxes are unclipped,
            # parity with the reference — sanity-bound only)
            assert max(abs(x1), abs(x2)) < 8 * w
            assert max(abs(y1), abs(y2)) < 8 * h
            assert cls >= 1 and 0.0 <= score <= 1.0

    after = batcher.stats()
    new_requests = after['requests'] - before['requests']
    new_batches = after['batches'] - before['batches']
    assert new_requests == 3
    # the whole point of the batcher: concurrent requests share device calls
    assert new_batches < new_requests


def test_bad_upload_is_400(server):
    addr, _ = server
    status, payload = _request(addr, 'POST', '/detect', b'not an image')
    assert status == 400
    assert 'bad image' in payload['error']


def test_unknown_path_is_404(server):
    addr, _ = server
    status, _ = _request(addr, 'GET', '/nope')
    assert status == 404


def test_bad_min_score_is_400(server):
    addr, _ = server
    status, payload = _request(addr, 'POST', '/detect?min_score=abc',
                               _png_bytes(32, 32, 0))
    assert status == 400
    assert 'min_score' in payload['error']


def test_failing_device_call_does_not_kill_the_batcher():
    """A transient device error must fail its group (RuntimeError to the
    submitters) and leave the consumer thread alive for later requests."""
    serve = _load_tool()
    calls = {'n': 0}

    def flaky_call(imgs):
        calls['n'] += 1
        if calls['n'] == 1:
            raise ValueError('transient relay error')
        b = imgs.shape[0]
        return (np.zeros((b, 3, 6), np.float32),
                np.zeros((b, 3), bool))

    batcher = serve.DynamicBatcher(flaky_call, batch=2, in_hw=(8, 8),
                                   max_delay_ms=1.0)
    try:
        img = np.zeros((8, 8, 3), np.float32)
        with pytest.raises(RuntimeError, match='transient relay error'):
            batcher.submit(img)
        # consumer survived: the next request is served normally
        dets, valid = batcher.submit(img)
        assert dets.shape == (3, 6) and valid.shape == (3,)
    finally:
        batcher.stop()
