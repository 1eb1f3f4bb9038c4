"""Cost of wavefront reorder primitives on 1.04M rays (in-graph scan):
  sort15 — lax.sort, 1 key + 14 payload operands (whitted's _sort_wave)
  sort2  — lax.sort key + iota only
  argsort_gather — argsort key then gather a packed (R,16) f32 matrix
  scatter — (R,3) .at[pix].set
"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from raytracer_tpu.utils.compile_cache import enable
enable()

R = 1036800 + (-1036800) % 2048
ITERS = 16


def scan_wrap(fn):
    @jax.jit
    def many(key, mat):
        def step(acc, i):
            out = fn(key + i.astype(jnp.int32), mat)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0),
                              jnp.arange(1, ITERS + 1, dtype=jnp.int32))
        return acc
    return many


def timeit(fn, key, mat, blocks=3):
    float(fn(key, mat))
    best = np.inf
    for _ in range(blocks):
        t0 = time.perf_counter()
        out = fn(key, mat)
        float(out)
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def sort15(key, mat):
    ops = (key,) + tuple(mat[:, j] for j in range(14))
    s = jax.lax.sort(ops, num_keys=1, is_stable=True)
    return s[1]


def sort2(key, mat):
    s = jax.lax.sort((key, jnp.arange(R, dtype=jnp.int32)), num_keys=1,
                     is_stable=True)
    return s[1]


def argsort_gather(key, mat):
    idx = jnp.argsort(key)
    return mat[idx].sum(axis=1)


def scatter(key, mat):
    pix = jnp.arange(R, dtype=jnp.int32)[::-1]
    return jnp.zeros((R, 3), jnp.float32).at[pix].set(
        mat[:, :3] + key[:, None].astype(jnp.float32))


def main():
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 32000, size=(R,)), jnp.int32)
    mat = jnp.asarray(rng.standard_normal((R, 14)), jnp.float32)
    for name, fn in [("sort15", sort15), ("sort2", sort2),
                     ("argsort_gather", argsort_gather),
                     ("scatter", scatter)]:
        ms = timeit(scan_wrap(fn), key, mat) * 1e3
        print(json.dumps({"op": name, "ms": round(ms, 2)}), flush=True)


main()
