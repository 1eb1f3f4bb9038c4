import jax.numpy as jnp
import numpy as np

from raytracer_tpu.ops.image import downsample_mean, downsample_parity, quantize


def test_quantize_round_half_away_from_zero():
    """Vec3f::toPixel uses C round() — half away from zero
    (parser.h:88-93). jnp.round would round half-to-even; we must not."""
    x = jnp.array([[0.5, 1.5, 2.5], [254.5, 255.4, 300.0]])
    q = np.asarray(quantize(x))
    assert q.tolist() == [[1, 2, 3], [255, 255, 255]]


def test_quantize_clamps_negative():
    q = np.asarray(quantize(jnp.array([[-5.0, 0.49, 255.0]])))
    assert q.tolist() == [[0, 0, 255]]


def test_downsample_parity_truncates():
    """uint8 sums with truncating integer division (raytracer.cpp:475-477)."""
    img = jnp.array(
        [[[1, 0, 0], [0, 0, 0]], [[0, 0, 0], [2, 0, 0]]], dtype=jnp.uint8
    )
    out = np.asarray(downsample_parity(img, 2))
    assert out.shape == (1, 1, 3)
    assert out[0, 0, 0] == 0  # (1+0+0+2)//4 == 0, NOT round(0.75)


def test_downsample_mean_is_float():
    img = jnp.array(
        [[[1.0, 0, 0], [0, 0, 0]], [[0, 0, 0], [2.0, 0, 0]]], dtype=jnp.float32
    )
    out = np.asarray(downsample_mean(img, 2))
    assert np.isclose(out[0, 0, 0], 0.75)
