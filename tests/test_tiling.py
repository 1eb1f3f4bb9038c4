"""Block tiling: the reshape/transpose fast path must equal the
perm/inv gather permutation exactly (whitted.py switches between them
based on divisibility), and the material select-chain lookup must be
bitwise-identical to direct table indexing."""

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.ops.tiling import (
    block_permutation, divides, from_blocks, to_blocks,
)


def test_to_blocks_equals_perm():
    rng = np.random.default_rng(0)
    for (h, w, bh, bw) in [(32, 48, 8, 16), (16, 16, 8, 16), (24, 32, 8, 8)]:
        assert divides(h, w, bh, bw)
        perm, inv = block_permutation(h, w, bh, bw)
        x = rng.random((h * w, 3)).astype(np.float32)
        np.testing.assert_array_equal(x[perm], to_blocks(x, h, w, bh, bw))
        np.testing.assert_array_equal(
            from_blocks(to_blocks(x, h, w, bh, bw), h, w, bh, bw), x
        )
        x1 = rng.random((h * w,)).astype(np.float32)
        np.testing.assert_array_equal(x1[perm], to_blocks(x1, h, w, bh, bw))


def test_divides_gate():
    assert divides(720, 1440, 8, 16)
    assert not divides(30, 48, 8, 16)
    assert not divides(32, 40, 8, 16)


def test_mat_lookup_bitwise():
    from raytracer_tpu.ops.shade import _mat_lookup

    rng = np.random.default_rng(1)
    m = 13
    amb = jnp.asarray(rng.random((m, 3)), jnp.float32)
    phong = jnp.asarray(rng.random((m,)) * 100, jnp.float32)
    flags = jnp.asarray(rng.random((m,)) > 0.5)
    ids = jnp.asarray(rng.integers(0, m, size=(4096,)), jnp.int32)
    a, p, f = _mat_lookup(ids, amb, phong, flags.astype(jnp.float32))
    idn = np.asarray(ids)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(amb)[idn])
    np.testing.assert_array_equal(np.asarray(p), np.asarray(phong)[idn])
    np.testing.assert_array_equal(
        np.asarray(f), np.asarray(flags)[idn].astype(np.float32)
    )
