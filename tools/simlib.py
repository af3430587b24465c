"""Shared exact-intersection helpers for the candidate-work simulators
(sim_candidates.py, sim_frame.py). Import AFTER forcing
jax_platforms=cpu — this module imports jax at load.

The triangle test mirrors the packed plane+edge form the production
kernels sweep (pallas_bf.pack_tris columns), so simulated hits and the
priors they drive match what the chained clustered launches would see.
"""

import jax
import jax.numpy as jnp
import numpy as np

TMIN = 0.01


@jax.jit
def chunk_hit(o, dd, tri):
    """[m, 3] rays vs [T, 16] packed tris -> (min t [m], argmin row [m])."""
    nrm, d0 = tri[:, 0:3], tri[:, 3]
    wu, cu = tri[:, 4:7], tri[:, 7]
    wv, cv = tri[:, 8:11], tri[:, 11]
    valid = tri[:, 12] > 0.5
    nd = dd @ nrm.T
    no = o @ nrm.T
    t = (d0[None, :] - no) / jnp.where(jnp.abs(nd) > 1e-20, nd, 1e-20)
    px = o[:, :, None] + dd[:, :, None] * t[:, None, :]
    u = jnp.einsum("mct,tc->mt", px, wu) + cu[None, :]
    v = jnp.einsum("mct,tc->mt", px, wv) + cv[None, :]
    ok = (valid[None, :] & (t > TMIN) & (u >= 0.0) & (v >= 0.0)
          & (u + v <= 1.0))
    tt = jnp.where(ok, t, jnp.float32(1e16))
    return jnp.min(tt, axis=1), jnp.argmin(tt, axis=1)


def trace_slabs(packed, starts, slab_rows, o_np, d_np, chunk=8192):
    """Per-slab true hits: ([N, S] min-t, [N, S] global packed row)."""
    m_n = o_np.shape[0]
    s_count = len(starts)
    best = np.full((m_n, s_count), 1e16, np.float32)
    brow = np.zeros((m_n, s_count), np.int64)
    for si, s in enumerate(starts):
        tri = packed[s:s + slab_rows]
        for c in range(0, m_n, chunk):
            m = min(chunk, m_n - c)
            bt, br = chunk_hit(jnp.asarray(o_np[c:c + m]),
                               jnp.asarray(d_np[c:c + m]), tri)
            best[c:c + m, si] = np.asarray(bt)
            brow[c:c + m, si] = np.asarray(br) + s
    return best, brow


def scene_bounds(scene):
    """Scene AABB over the valid triangle VERTICES (NOT pack_tris cols
    0:3 — those are plane normals; see the 2026-08-19 workload fix)."""
    valid = np.asarray(scene.tri_valid) > 0
    v0 = np.asarray(scene.tri_v0)[valid]
    e1 = np.asarray(scene.tri_e1)[valid]
    e2 = np.asarray(scene.tri_e2)[valid]
    pts = np.concatenate([v0, v0 + e1, v0 + e2])
    return pts.min(axis=0), pts.max(axis=0)
