"""Hierarchical (two-level) exact mask: kernel vs pure-jnp ground truth.

Above _SUPER_MIN_CPAD cluster columns the TPU mask kernel gates each
128-cluster chunk behind a coarse supercluster test
(ops.cluster_trace._ray_mask_kernel_hier).  Soundness is bitwise by
monotonicity (see the module comment); this pins it empirically by
running the Pallas kernel in interpret mode on synthetic boxes/rays and
comparing against _ray_mask_jnp: hit masks exactly, entry values to
float tolerance (the interpreter's CPU backend contracts the slab FMA
differently from plain XLA:CPU — on real TPU the kernel is pinned
BITWISE against the jnp form, experiments/exp_mask_kernel.py and
exp_hier_mask.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from raytracer_tpu.ops import cluster_trace as ct


def _synthetic(c, r, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-50, 50, (c, 3)).astype(np.float32)
    half = rng.uniform(0.5, 3.0, (c, 3)).astype(np.float32)
    cmin, cmax = centers - half, centers + half
    # a few empty (NaN) clusters like models.clusters emits for padding
    cmin[:: max(c // 7, 1)] = np.nan
    cmax[:: max(c // 7, 1)] = np.nan
    origin = rng.uniform(-60, 60, (r, 3)).astype(np.float32)
    dirs = rng.standard_normal((r, 3)).astype(np.float32)
    dirs[rng.random(r) < 0.05, 0] = 0.0  # zero-component edge case
    active = rng.random(r) > 0.3
    t_hi = rng.uniform(10, 200, (r,)).astype(np.float32)
    return (jnp.asarray(cmin), jnp.asarray(cmax), jnp.asarray(origin),
            jnp.asarray(dirs), jnp.asarray(active), jnp.asarray(t_hi))


@pytest.mark.parametrize("c", [1024, 700])  # > _SUPER_MIN_CPAD: hier engages
def test_hier_kernel_matches_jnp(c):
    r = ct.TILE * ct.TPB * 2
    cmin, cmax, origin, dirs, active, t_hi = _synthetic(c, r)
    assert -(-c // 128) * 128 > ct._SUPER_MIN_CPAD
    hit_k, ent_k = ct._ray_cluster_mask_tpu(
        origin, dirs, active, cmin, cmax, t_hi, ct.TILE, interpret=True)
    hit_j, ent_j = ct._ray_mask_jnp(
        origin, dirs, active, cmin, cmax, t_hi, ct.TILE)
    np.testing.assert_array_equal(np.asarray(hit_k), np.asarray(hit_j))
    np.testing.assert_allclose(np.asarray(ent_k), np.asarray(ent_j),
                               rtol=1e-4)


def test_flat_kernel_matches_jnp():
    """The single-level kernel (bundled-scene path, cpad <= 512) stays
    bitwise-equal too."""
    r = ct.TILE * ct.TPB
    cmin, cmax, origin, dirs, active, t_hi = _synthetic(300, r, seed=1)
    hit_k, ent_k = ct._ray_cluster_mask_tpu(
        origin, dirs, active, cmin, cmax, t_hi, ct.TILE, interpret=True)
    hit_j, ent_j = ct._ray_mask_jnp(
        origin, dirs, active, cmin, cmax, t_hi, ct.TILE)
    np.testing.assert_array_equal(np.asarray(hit_k), np.asarray(hit_j))
    np.testing.assert_allclose(np.asarray(ent_k), np.asarray(ent_j),
                               rtol=1e-4)


def test_super_boxes_contain_members():
    cmin, cmax, *_ = _synthetic(1024, ct.TILE)
    cpad = 1024
    smin, smax = ct._super_boxes(cmin, cmax, cpad)
    smin, smax = np.asarray(smin), np.asarray(smax)
    cmin_n, cmax_n = np.asarray(cmin), np.asarray(cmax)
    for j in range(cpad // ct._SUPER):
        grp = slice(j * ct._SUPER, (j + 1) * ct._SUPER)
        real = ~np.isnan(cmin_n[grp]).any(-1)
        if real.any():
            assert (smin[j] <= cmin_n[grp][real]).all()
            assert (smax[j] >= cmax_n[grp][real]).all()
        else:
            assert np.isnan(smin[j]).all()
