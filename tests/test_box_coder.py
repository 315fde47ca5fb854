import numpy as np
import jax.numpy as jnp

from single_shot_detection_tpu.ops.box_coder import BoxCoder


def test_encode_decode_roundtrip(rng):
    coder = BoxCoder(xy_scale=10.0, wh_scale=5.0)
    priors = rng.rand(50, 4).astype(np.float32) * 100 + 1
    boxes = rng.rand(3, 50, 4).astype(np.float32) * 100 + 1
    codes = coder.encode(jnp.asarray(boxes), jnp.asarray(priors))
    back = coder.decode(codes, jnp.asarray(priors))
    np.testing.assert_allclose(np.asarray(back), boxes, rtol=1e-3, atol=1e-2)


def test_encode_known_values():
    coder = BoxCoder(xy_scale=10.0, wh_scale=5.0, eps=0.0)
    priors = jnp.array([[10.0, 10.0, 4.0, 4.0]])
    boxes = jnp.array([[12.0, 10.0, 8.0, 2.0]])
    codes = np.asarray(coder.encode(boxes, priors))[0]
    np.testing.assert_allclose(codes[0], (12 - 10) / 4 * 10)          # t_x = 5
    np.testing.assert_allclose(codes[1], 0.0)
    np.testing.assert_allclose(codes[2], np.log(8 / 4) * 5, rtol=1e-5)
    np.testing.assert_allclose(codes[3], np.log(2 / 4) * 5, rtol=1e-5)


def test_decode_identity_at_zero_codes():
    coder = BoxCoder(xy_scale=10.0, wh_scale=5.0)
    priors = jnp.array([[10.0, 20.0, 4.0, 6.0], [1.0, 2.0, 3.0, 4.0]])
    codes = jnp.zeros((1, 2, 4))
    out = np.asarray(coder.decode(codes, priors))[0]
    np.testing.assert_allclose(out, np.asarray(priors), rtol=1e-6)
