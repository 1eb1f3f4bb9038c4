"""How slow is the (R,) -> (table, 8) gather really, and what helps?
Variants: plain take, sorted indices, smaller table, split 8x scalar
columns, one-hot matmul over clusters."""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from raytracer_tpu.utils.compile_cache import enable
enable()

R = 2 * 1024 * 1024
TBL = 46 * 1024

def sync(x): return float(jnp.sum(x))

def timeit(fn, *args, n=6):
    o = fn(*args); sync(o)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    s = sum(float(jnp.sum(o)) for o in [outs[-1]])
    t1 = time.perf_counter()
    # chain-sync all for honesty
    for o in outs: o.block_until_ready()
    return (t1 - t0) / n

rng = np.random.default_rng(0)
# semi-coherent indices: tiles of 256 share ~3 clusters of 128 slots
base = rng.integers(0, TBL // 128, (R // 256, 3)) * 128
pick = rng.integers(0, 3, (R // 256, 256))
off = rng.integers(0, 128, (R // 256, 256))
idx = (np.take_along_axis(base, pick, 1)[:, :256] + off).reshape(-1).astype(np.int32)
idx_d = jax.device_put(jnp.asarray(idx))
tbl = jax.device_put(jnp.asarray(rng.standard_normal((TBL, 8)), jnp.float32))
tbl_small = jax.device_put(jnp.asarray(rng.standard_normal((1024, 8)), jnp.float32))
idx_small = jax.device_put(idx_d % 1024)
idx_sorted = jax.device_put(jnp.sort(idx_d))

@jax.jit
def plain(t, i): return t[i]

@jax.jit
def col_split(t, i):
    return jnp.stack([t[:, c][i] for c in range(8)], -1)

for name, fn, a in [
    ("plain_46k", plain, (tbl, idx_d)),
    ("plain_46k_sorted", plain, (tbl, idx_sorted)),
    ("plain_1k", plain, (tbl_small, idx_small)),
    ("col_split_46k", col_split, (tbl, idx_d)),
]:
    dt = timeit(fn, *a)
    print(json.dumps({"variant": name, "ms": round(dt*1e3, 2),
                      "ns_per_row": round(dt/R*1e9, 1)}), flush=True)
