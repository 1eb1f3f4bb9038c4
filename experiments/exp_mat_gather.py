"""Material-table gathers in shade_local/reflection_rays: 8 separate
(R,)-indexed gathers from tiny (M,*) tables per bounce.  Is one packed
(M,16) gather cheaper?  (in-graph scan, 1.04M rays, M=6)"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from raytracer_tpu.utils.compile_cache import enable
enable()

R = 1036800
M = 6
ITERS = 16


def scan_wrap(fn):
    @jax.jit
    def many(idx, tabs):
        def step(acc, i):
            out = fn((idx + i) % M, tabs)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return acc
    return many


def timeit(fn, idx, tabs, blocks=3):
    float(fn(idx, tabs))
    best = np.inf
    for _ in range(blocks):
        t0 = time.perf_counter()
        out = fn(idx, tabs)
        float(out)
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def six_gathers(idx, tabs):
    amb, dif, spec, mir, ph, ism = tabs
    return (amb[idx].sum(1) + dif[idx].sum(1) + spec[idx].sum(1)
            + mir[idx].sum(1) + ph[idx] + ism[idx].astype(jnp.float32))


def packed_gather(idx, tabs):
    amb, dif, spec, mir, ph, ism = tabs
    packed = jnp.concatenate(
        [amb, dif, spec, mir, ph[:, None], ism[:, None].astype(jnp.float32),
         jnp.zeros((M, 2), jnp.float32)], axis=1)  # (M, 16)
    g = packed[idx]
    return (g[:, 0:3].sum(1) + g[:, 3:6].sum(1) + g[:, 6:9].sum(1)
            + g[:, 9:12].sum(1) + g[:, 12] + g[:, 13])


def onehot_matmul(idx, tabs):
    amb, dif, spec, mir, ph, ism = tabs
    packed = jnp.concatenate(
        [amb, dif, spec, mir, ph[:, None], ism[:, None].astype(jnp.float32),
         jnp.zeros((M, 2), jnp.float32)], axis=1)  # (M, 16)
    oh = jax.nn.one_hot(idx, M, dtype=jnp.float32)  # (R, M)
    g = oh @ packed                                  # (R, 16)
    return (g[:, 0:3].sum(1) + g[:, 3:6].sum(1) + g[:, 6:9].sum(1)
            + g[:, 9:12].sum(1) + g[:, 12] + g[:, 13])


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, M, size=(R,)), jnp.int32)
    tabs = (jnp.asarray(rng.random((M, 3)), jnp.float32),
            jnp.asarray(rng.random((M, 3)), jnp.float32),
            jnp.asarray(rng.random((M, 3)), jnp.float32),
            jnp.asarray(rng.random((M, 3)), jnp.float32),
            jnp.asarray(rng.random((M,)), jnp.float32),
            jnp.asarray(rng.random((M,)) > 0.5))
    for name, fn in [("six_gathers", six_gathers),
                     ("packed_gather", packed_gather),
                     ("onehot_matmul", onehot_matmul)]:
        ms = timeit(scan_wrap(fn), idx, tabs) * 1e3
        print(json.dumps({"variant": name, "ms": round(ms, 2)}), flush=True)


main()
