"""Ordered descent for the bvh engine: measure BEFORE building (VERDICT
round-4 item 6).

The reference walks near-child-first by direction sign on each node's
split axis (raytracer.cpp:190-196), which tightens best-t earlier and
prunes more boxes.  Our skip-threaded lockstep walk always goes
preorder.  The LOCKSTEP wall-clock driver is the while_loop iteration
count = max over the wavefront of (node visits + leaf prim tests), not
the mean — this simulates both walks in vectorized numpy and reports
mean/max steps per wave.

Exact ordering is emulated with EIGHT octant-threaded trees (per ray
direction octant, left-first iff dir[axis] >= 0 at every node — the
reference's exact order), i.e. the best any skip-thread scheme can do.

Semantics mirrored from ops/traverse.py:_bvh_walk: one step is EITHER a
node visit (slab test, t-prune for closest) OR one leaf primitive test.
"""
import sys, os, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
import jax
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.ops.camera import camera_vectors, eye_rays_band


def octant_thread(bvh, neg):
    """Emit (order, skip) for the child order where, at an inner node
    with split axis a, the LEFT child goes first iff not neg[a].
    Returns arrays indexed by NEW position: node_id[new], skip[new]."""
    leaf_count = np.asarray(bvh.leaf_count)
    skip0 = np.asarray(bvh.skip)
    axis = np.asarray(bvh.axis)
    n = leaf_count.shape[0]
    order = np.empty(n, np.int32)
    skip = np.empty(n, np.int32)
    pos = 0
    # iterative preorder with chosen child order; stack holds node ids
    stack = [0]
    # to fill skip we need subtree extents in NEW numbering: emit via
    # recursion-with-explicit-stack returning sizes
    sys.setrecursionlimit(100000)

    def emit(i):
        nonlocal pos
        my = pos
        order[my] = i
        pos += 1
        if leaf_count[i] > 0:
            skip[my] = my + 1
            return
        left, right = i + 1, int(skip0[i + 1])
        first, second = (left, right) if not neg[axis[i]] else (right, left)
        emit(first)
        emit(second)
        skip[my] = pos

    emit(0)
    assert pos == n
    return order, skip


def walk_steps(bvh, origin, dirs, order, skip, closest=True, t_max=None):
    """Vectorized numpy lockstep walk counting steps; returns
    (iterations_to_drain, mean_steps, prim_tests_mean)."""
    box_min = np.asarray(bvh.box_min)[order]
    box_max = np.asarray(bvh.box_max)[order]
    leaf_count = np.asarray(bvh.leaf_count)[order]
    leaf_start = np.asarray(bvh.leaf_start)[order]
    prim_idx = np.asarray(bvh.prim_idx)
    n = box_min.shape[0]
    r = dirs.shape[0]
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_d = 1.0 / dirs
    node = np.zeros(r, np.int64)
    cursor = np.zeros(r, np.int64)
    remaining = np.zeros(r, np.int64)
    best_t = np.full(r, np.inf, np.float32)
    done = np.zeros(r, bool)
    steps = np.zeros(r, np.int64)
    prim_tests = np.zeros(r, np.int64)
    iters = 0
    P = PRIMS  # (p, kind-packed test closures below)

    while True:
        live = ~done & ((node < n) | (remaining > 0))
        if not live.any():
            break
        iters += 1
        in_leaf = (remaining > 0) & ~done
        steps[live] += 1
        # leaf step
        if in_leaf.any():
            ci = np.clip(cursor, 0, prim_idx.shape[0] - 1)
            p = prim_idx[ci]
            t_p, ok_p = prim_test(p, origin, dirs)
            prim_tests[in_leaf] += 1
            if closest:
                upd = in_leaf & ok_p & (t_p < best_t)
                best_t[upd] = t_p[upd]
            else:
                found = in_leaf & ok_p & (t_p < t_max)
                done |= found
            cursor[in_leaf] += 1
            remaining[in_leaf] -= 1
        # node step
        at_node = ~in_leaf & (node < n) & ~done
        if at_node.any():
            ni = np.clip(node, 0, n - 1)
            with np.errstate(invalid="ignore"):
                t1 = (box_min[ni] - origin) * inv_d
                t2 = (box_max[ni] - origin) * inv_d
                tmin = np.minimum(t1, t2).max(1)
                tmax_ = np.maximum(t1, t2).min(1)
            ok_box = (tmin <= tmax_) & (tmax_ >= 0.0)
            visit = ok_box & (tmin <= best_t) if closest else ok_box
            nxt = np.where(visit, node + 1, skip[ni])
            enter = at_node & visit & (leaf_count[ni] > 0)
            node[at_node] = nxt[at_node]
            remaining[enter] = leaf_count[ni][enter]
            cursor[enter] = leaf_start[ni][enter]
    return iters, float(steps.mean()), float(prim_tests.mean())


def main(path, nrays=1 << 16):
    scene = os.path.basename(path).replace(".xml", "")
    data, meta = load_scene(path)
    bvh = build_bvh(data, meta)
    cam = meta.cameras[0]
    origin, dirs = eye_rays_band(jnp.asarray(camera_vectors(cam)),
                                 cam.width, cam.height, jnp.float32(0),
                                 cam.height)
    dirs = np.asarray(dirs, np.float32)
    rng = np.random.default_rng(0)
    sel = rng.choice(dirs.shape[0], size=min(nrays, dirs.shape[0]),
                     replace=False)
    dirs = dirs[sel]
    origin = np.broadcast_to(np.asarray(origin, np.float32), dirs.shape)

    # primitive test closures (numpy mirror of ops/traverse._prim_test)
    global prim_test, PRIMS
    verts = np.asarray(data.vertices, np.float32)
    tri_v = np.asarray(data.tri_v, np.int64)
    t_pad = tri_v.shape[0]
    sph_c = verts[np.asarray(data.sphere_cvid, np.int64)]
    sph_r = np.asarray(data.sphere_rad, np.float32)
    PRIMS = None

    def prim_test(p, o, d):
        is_tri = p < t_pad
        ti = np.clip(p, 0, t_pad - 1)
        a = verts[tri_v[ti, 0]]; b = verts[tri_v[ti, 1]]; c = verts[tri_v[ti, 2]]
        e1 = b - a; e2 = c - a
        pv = np.cross(d, e2)
        det = (e1 * pv).sum(1)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / det
            tv = o - a
            u = (tv * pv).sum(1) * inv
            qv = np.cross(tv, e1)
            v = (d * qv).sum(1) * inv
            t_tri = (e2 * qv).sum(1) * inv
        ok_tri = (u >= 0) & (v >= 0) & (u + v <= 1) & (t_tri >= 0)
        si = np.clip(p - t_pad, 0, max(sph_c.shape[0] - 1, 0))
        if sph_c.shape[0]:
            cc = sph_c[si]; rr = sph_r[si]
            oc = o - cc
            a_q = (d * d).sum(1); b_q = 2 * (d * oc).sum(1)
            c_q = (oc * oc).sum(1) - rr * rr
            disc = b_q * b_q - 4 * a_q * c_q
            with np.errstate(invalid="ignore"):
                sq = np.sqrt(np.maximum(disc, 0))
                t_s = (-b_q - sq) / (2 * a_q)
                t2 = (-b_q + sq) / (2 * a_q)
            ok_s = (disc >= 0) & ~((t_s < 0) & (t2 < 0))
        else:
            t_s = np.full_like(t_tri, np.inf); ok_s = np.zeros_like(ok_tri)
        t = np.where(is_tri, t_tri, t_s)
        ok = np.where(is_tri, ok_tri, ok_s)
        ok = ok & np.isfinite(t)
        return t.astype(np.float32), ok

    ident = np.arange(np.asarray(bvh.skip).shape[0], dtype=np.int32)
    base = walk_steps(bvh, origin, dirs, ident, np.asarray(bvh.skip))
    # octant threads: one walk per octant subset with its exact thread
    sgn = dirs < 0.0
    octs = sgn[:, 0].astype(int) * 4 + sgn[:, 1].astype(int) * 2 \
        + sgn[:, 2].astype(int)
    tot_iters = 0
    wsum = 0.0
    psum = 0.0
    nray = dirs.shape[0]
    for o in range(8):
        m = octs == o
        if not m.any():
            continue
        neg = [(o >> 2) & 1, (o >> 1) & 1, o & 1]
        order, skip = octant_thread(bvh, neg)
        it, ms, mp = walk_steps(bvh, origin[m], dirs[m], order, skip)
        tot_iters = max(tot_iters, it)
        wsum += ms * m.sum() / nray
        psum += mp * m.sum() / nray
    print(json.dumps({
        "scene": scene, "rays": int(nray),
        "preorder": {"lockstep_iters": base[0],
                     "mean_steps": round(base[1], 1),
                     "mean_prim_tests": round(base[2], 2)},
        "ordered": {"lockstep_iters": tot_iters,
                    "mean_steps": round(wsum, 1),
                    "mean_prim_tests": round(psum, 2)},
        "iters_speedup": round(base[0] / max(tot_iters, 1), 3),
        "mean_speedup": round(base[1] / max(wsum, 1e-9), 3),
    }), flush=True)


for p in ("/root/reference/inputs/bunny.xml",
          "/root/reference/inputs/dragon_lowres.xml"):
    main(p)
