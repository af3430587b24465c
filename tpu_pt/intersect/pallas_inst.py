"""Instanced (two-level) Pallas traversal — the reference's GAS+IAS analog.

The reference keeps per-instance transforms in an instance acceleration
structure over shared per-mesh GASes (``sutil/Scene.cpp:1134-1213``:
``buildInstanceAccel`` uploads one ``OptixInstance`` per node with a 3x4
object-to-world transform; traversal transforms each ray into mesh space
in hardware). ``scene/gltf.py`` deliberately flattens instances to world
space instead — the right trade until instancing amplification makes the
flattened table bind memory or HBM bandwidth (the module docstring and
the ``max_flat_tris`` guardrail).

This module is the other half of that trade, TPU-shaped: the UNIQUE mesh
triangles stay VMEM-resident (packed once, mesh space), instances become
the outer level of the sweep — per 256-ray tile, a candidate-instance
work list (the same ``super_candidates`` schedule the clustered path
uses, built over per-instance WORLD AABBs), and per candidate instance
the kernel transforms the tile's rays by the instance's inverse 3x4
(9 mul + 9 fma on [1, RT] rows — there is no gather: the 12 matrix
scalars load from a [I, 16] VMEM table row) and sweeps the mesh's
cluster range with the usual plane+edge test. Because the mesh-space
direction is left UNNORMALIZED, the hit parameter t is identical in
world and mesh parameterization (o + t·d ↦ M⁻¹o + t·M⁻¹d), so best-t
chains across instances exactly like chained slabs do.

Memory scales O(unique mesh + instances): a 50k-instance forest whose
flatten would materialize 50M world triangles sweeps an 8k-row table.

Layout contracts shared with ``pallas_bf``: rays [8, N] (``pack_rays``),
triangles [T, 16] (``pack_tris``), cluster AABBs [C, 8], candidate
tables [tiles * ns1, 1] (``super_candidates``), lean (t, id) carry
resolved outside the kernel (``_lean_resolve_packed``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.arrays import SceneArrays
from ..vec3 import V3, as_v3
from .moller import Hit, T_FAR
from .pallas_bf import (CLUSTER, RAY_TILE_C, VMEM_LIMIT, _BIG_IDX,
                        _box_near_far, _coherence_key, _interpret,
                        _lean_resolve_packed, _pad_to, _pe_block,
                        _ray_inv, _ray_rows, _sorted_rays, _unsort,
                        pack_rays, pack_tris, super_candidates)

# Mesh-table bound: every unique-mesh row lives in VMEM for the whole
# launch (the point of the design). 8192 rows = 512 KB — the same
# single-slab budget the dense small-scene kernels use (TRI_SLAB).
INST_MAX_ROWS = int(os.environ.get("TPT_INST_ROWS", 8192))
# Instance bound: the [I, 16] transform table is VMEM-resident (16384
# rows = 1 MB) and the schedule build runs a dense [N, I] slab pass per
# call (the flat one-level schedule; past this a parent-box hierarchy
# over instance groups would be needed, the cbin two-level build's
# shape).
INST_MAX_INST = int(os.environ.get("TPT_INST_MAX", 16384))


def _inst_guard() -> bool:
    """Per-cluster ``lax.cond`` skip inside a candidate instance's
    range. The candidate list already passed the instance's WORLD box,
    but a tree-sized mesh is ~10 clusters of which a tile typically
    pierces 2-3, so the cluster conds still cull most sweep steps —
    unlike the clustered path, where tight kd work lists made conds
    pure serialization (``_guard_mode``). Measured on the 500-tree
    forest (512^2 x 8 spp, Mrays/s): guard on 12.47, off 10.48 — the
    conds stay. ``TPT_INST_GUARD=0`` ablates to dense sweeps."""
    return os.environ.get("TPT_INST_GUARD", "1") != "0"


@struct.dataclass
class InstanceTable:
    """Device-side instance table (the ``OptixInstance`` array analog).

    ``rows`` [I_pad, 16] f32: cols 0:12 the mesh-from-world (inverse)
    3x4, row-major; col 12 the instance's first cluster index in the
    packed mesh table; col 13 its cluster count; col 14 the instance id;
    col 15 pad. Padding instances carry far-point ``boxes`` rows (3e37)
    so every slab test rejects them.
    ``nrm`` [I_pad, 9]: sign(det M) * (M^-1)^T — mesh normal -> world
    (un-normalized; consumers normalize), orientation-corrected so
    mirrored instances keep the flatten path's cross-product winding.
    ``fwd`` [I_pad, 9]: the forward linear part M (tangents transform
    covariantly, not like normals).
    ``boxes`` [I_pad, 8]: world-space instance AABBs (mesh AABB corners
    pushed through M), the outer-level culling geometry.
    """
    rows: jnp.ndarray
    nrm: jnp.ndarray
    fwd: jnp.ndarray
    boxes: jnp.ndarray
    count: int = struct.field(pytree_node=False)
    # Static per-mesh packed ranges ((tri_lo, tri_hi), ...) in unique-
    # geometry triangle indices; mesh i of an instance is resolved at
    # build time into rows cols 12:14, these are kept for packing.
    mesh_ranges: tuple = struct.field(pytree_node=False)


def build_instance_table(mesh_ranges, mesh_aabbs, instances) -> InstanceTable:
    """Host-side table build.

    ``mesh_ranges``: [(tri_lo, tri_hi)] per unique mesh (unique-geometry
    triangle indices). ``mesh_aabbs``: [(min3, max3)] mesh-space AABBs.
    ``instances``: [(mesh_slot, world_matrix 4x4 np)] — mesh_slot indexes
    mesh_ranges. Cluster offsets follow ``pack_tris_instanced``'s layout:
    each mesh padded to whole CLUSTER rows, concatenated in order.
    """
    n = len(instances)
    if n == 0:
        raise ValueError("instanced scene with no instances")
    if n > INST_MAX_INST:
        raise ValueError(
            f"{n} instances exceeds the instanced-path bound "
            f"{INST_MAX_INST} (TPT_INST_MAX)")
    # Cluster layout per mesh slot.
    c_lo, c_cnt, off = [], [], 0
    for lo, hi in mesh_ranges:
        cnt = _pad_to(hi - lo, CLUSTER) // CLUSTER
        c_lo.append(off)
        c_cnt.append(cnt)
        off += cnt
    i_pad = _pad_to(n, 8)
    rows = np.zeros((i_pad, 16), np.float32)
    nrm = np.zeros((i_pad, 9), np.float32)
    fwd = np.zeros((i_pad, 9), np.float32)
    boxes = np.full((i_pad, 8), 3e37, np.float32)
    boxes[:, 6:8] = 0.0
    for i, (slot, m) in enumerate(instances):
        m = np.asarray(m, np.float64).reshape(4, 4)
        lin = m[:3, :3]
        inv = np.linalg.inv(m)
        rows[i, 0:12] = inv[:3, :4].reshape(-1).astype(np.float32)
        rows[i, 12] = c_lo[slot]
        rows[i, 13] = c_cnt[slot]
        rows[i, 14] = i
        det_sign = 1.0 if np.linalg.det(lin) >= 0 else -1.0
        nrm[i] = (det_sign * np.linalg.inv(lin).T).reshape(-1)
        fwd[i] = lin.reshape(-1).astype(np.float32)
        lo3, hi3 = mesh_aabbs[slot]
        corners = np.array([[x, y, z]
                            for x in (lo3[0], hi3[0])
                            for y in (lo3[1], hi3[1])
                            for z in (lo3[2], hi3[2])], np.float64)
        wc = corners @ lin.T + m[:3, 3]
        boxes[i, 0:3] = wc.min(axis=0)
        boxes[i, 3:6] = wc.max(axis=0)
    return InstanceTable(
        rows=jnp.asarray(rows), nrm=jnp.asarray(nrm),
        fwd=jnp.asarray(fwd), boxes=jnp.asarray(boxes),
        count=n, mesh_ranges=tuple(map(tuple, mesh_ranges)))


def pack_tris_instanced(geom: SceneArrays, mesh_ranges):
    """Pack unique-mesh triangles per mesh (no cross-mesh reordering).

    Returns (tris [R_pad, 16] mesh-space packed rows, boxes [C_pad, 8]
    mesh-space per-cluster AABBs). Each mesh's rows stay in original
    order, padded to whole clusters, so an instance addresses clusters
    ``[rows[i,12], rows[i,12] + rows[i,13])`` — cluster ids match
    ``build_instance_table``'s layout exactly. Cluster AABBs cover the
    three triangle corners of the valid rows; all-padding clusters
    collapse to a far point box (every slab test fails, as in
    ``pack_tris_clustered``)."""
    packed = pack_tris(geom)
    v0, e1, e2 = geom.tri_v0, geom.tri_e1, geom.tri_e2
    valid = geom.tri_valid
    parts, box_parts = [], []
    big = jnp.float32(3e38)
    far = jnp.float32(3e37)
    for lo, hi in mesh_ranges:
        rows = packed[lo:hi]
        r_pad = _pad_to(hi - lo, CLUSTER)
        if r_pad != hi - lo:
            rows = jnp.pad(rows, ((0, r_pad - (hi - lo)), (0, 0)))
        parts.append(rows)
        vm = valid[lo:hi, None]
        p0 = jnp.where(vm, v0[lo:hi], big)
        p1 = jnp.where(vm, v0[lo:hi] + e1[lo:hi], big)
        p2 = jnp.where(vm, v0[lo:hi] + e2[lo:hi], big)
        q0 = jnp.where(vm, v0[lo:hi], -big)
        q1 = jnp.where(vm, v0[lo:hi] + e1[lo:hi], -big)
        q2 = jnp.where(vm, v0[lo:hi] + e2[lo:hi], -big)

        def padc(a, fill):
            return jnp.pad(a, ((0, r_pad - a.shape[0]), (0, 0)),
                           constant_values=fill)

        mins = jnp.minimum(jnp.minimum(padc(p0, big), padc(p1, big)),
                           padc(p2, big)).reshape(-1, CLUSTER, 3).min(1)
        maxs = jnp.maximum(jnp.maximum(padc(q0, -big), padc(q1, -big)),
                           padc(q2, -big)).reshape(-1, CLUSTER, 3).max(1)
        empty = jnp.any(mins > maxs, axis=1, keepdims=True)
        mins = jnp.where(empty, far, mins)
        maxs = jnp.where(empty, far, maxs)
        box_parts.append(jnp.concatenate(
            [mins, maxs, jnp.zeros((mins.shape[0], 2), jnp.float32)],
            axis=1))
    tris = jnp.concatenate(parts)
    boxes = jnp.concatenate(box_parts)
    r_tot = _pad_to(tris.shape[0], 8 * CLUSTER)
    if r_tot != tris.shape[0]:
        tris = jnp.pad(tris, ((0, r_tot - tris.shape[0]), (0, 0)))
        pad_boxes = jnp.full(
            (r_tot // CLUSTER - boxes.shape[0], 8), far)
        boxes = jnp.concatenate([boxes, pad_boxes])
    if tris.shape[0] > INST_MAX_ROWS:
        raise ValueError(
            f"instanced mesh table has {tris.shape[0]} packed rows, past "
            f"the VMEM-resident bound {INST_MAX_ROWS} (TPT_INST_ROWS)")
    return tris, boxes


def _xform_ray(w, ixf_ref, c):
    """World ray rows -> instance mesh space. ``w`` is the 6-tuple of
    [1, RT] world rows; the 12 inverse-matrix scalars load from the
    instance's sublane row (same access shape as ``_box_near_far``'s box
    reads). Direction is left unnormalized so t stays world-parameter."""
    m = [ixf_ref[c, j] for j in range(12)]
    ox = m[0] * w[0] + m[1] * w[1] + m[2] * w[2] + m[3]
    oy = m[4] * w[0] + m[5] * w[1] + m[6] * w[2] + m[7]
    oz = m[8] * w[0] + m[9] * w[1] + m[10] * w[2] + m[11]
    dx = m[0] * w[3] + m[1] * w[4] + m[2] * w[5]
    dy = m[4] * w[3] + m[5] * w[4] + m[6] * w[5]
    dz = m[8] * w[3] + m[9] * w[4] + m[10] * w[5]
    return (ox, oy, oz, dx, dy, dz)


def _closest_kernel_inst(rays_ref, tris_ref, boxes_ref, ixf_ref, cand_ref,
                         t_ref, row_ref, inst_ref, *, n_inst, tmin, tmax):
    rt = rays_ref.shape[1]
    w = _ray_rows(rays_ref)
    ncand = jnp.clip(cand_ref[0, 0], 0, n_inst)
    init = (jnp.full((1, rt), T_FAR, jnp.float32),
            jnp.zeros((1, rt), jnp.float32),
            jnp.zeros((1, rt), jnp.float32))

    def inst_step(k, carry):
        c = cand_ref[1 + k, 0]
        ray = _xform_ray(w, ixf_ref, c)
        clo = ixf_ref[c, 12].astype(jnp.int32)
        ncl = ixf_ref[c, 13].astype(jnp.int32)
        cf = jnp.zeros((1, rt), jnp.float32) + ixf_ref[c, 14]
        inv = _ray_inv(ray)

        def sweep(b, cc):
            s = b * CLUSTER
            t, _, _, _ = _pe_block(ray, tris_ref, s, CLUSTER, tmin)
            if tmax < T_FAR:
                t = jnp.where(t < tmax, t, jnp.float32(T_FAR))
            blk_t = jnp.min(t, axis=0, keepdims=True)
            sub = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER, rt), 0)
            cnd = jnp.where(t == blk_t, sub, _BIG_IDX)
            blk_sub = jnp.min(cnd, axis=0, keepdims=True)
            bt, br, bi = cc
            blk_row = (blk_sub + s).astype(jnp.float32)
            better = blk_t < bt
            return (jnp.where(better, blk_t, bt),
                    jnp.where(better, blk_row, br),
                    jnp.where(better, cf, bi))

        if _inst_guard():
            def cstep(j, cc):
                b = clo + j
                tnear, tfar = _box_near_far(ray, inv, boxes_ref, b)
                useful = ((tnear <= tfar) & (tfar > tmin)
                          & (tnear < cc[0]))
                return jax.lax.cond(jnp.any(useful),
                                    lambda x: sweep(b, x),
                                    lambda x: x, cc)
        else:
            def cstep(j, cc):
                return sweep(clo + j, cc)

        return jax.lax.fori_loop(0, ncl, cstep, carry)

    best_t, best_row, best_inst = jax.lax.fori_loop(0, ncand, inst_step,
                                                    init)
    t_ref[0:1, :] = best_t
    hit = best_t < T_FAR
    row_ref[0:1, :] = jnp.where(hit, best_row.astype(jnp.int32), 0)
    inst_ref[0:1, :] = jnp.where(hit, best_inst.astype(jnp.int32), 0)


def _occluded_kernel_inst(rays_ref, tris_ref, boxes_ref, ixf_ref,
                          cand_ref, occ_ref, *, n_inst, tmin):
    """Any-hit over candidate instances; refractive rows pass light
    (``pathTracerPrograms.cu:672-681`` parity via the packed refr
    column, exactly like ``_occlusion_sweep``). Per-ray tmax rides ray
    row 6; guards early-exit once every lane is occluded."""
    rt = rays_ref.shape[1]
    w = _ray_rows(rays_ref)
    tmax = rays_ref[6:7, :]
    ncand = jnp.clip(cand_ref[0, 0], 0, n_inst)
    init = jnp.zeros((1, rt), jnp.float32)

    def inst_step(k, occ):
        c = cand_ref[1 + k, 0]
        ray = _xform_ray(w, ixf_ref, c)
        clo = ixf_ref[c, 12].astype(jnp.int32)
        ncl = ixf_ref[c, 13].astype(jnp.int32)
        inv = _ray_inv(ray)

        def sweep(b, oc):
            s = b * CLUSTER
            t, refr, _, _ = _pe_block(ray, tris_ref, s, CLUSTER, tmin)
            blocking = (t < tmax) & (refr < 0.5)
            hit_any = jnp.max(jnp.where(blocking, 1.0, 0.0), axis=0,
                              keepdims=True)
            return jnp.maximum(oc, hit_any)

        if _inst_guard():
            def cstep(j, oc):
                b = clo + j
                tnear, tfar = _box_near_far(ray, inv, boxes_ref, b)
                useful = ((tnear <= tfar) & (tfar > tmin)
                          & (tnear < tmax) & (oc < 0.5))
                return jax.lax.cond(jnp.any(useful),
                                    lambda x: sweep(b, x),
                                    lambda x: x, oc)
        else:
            def cstep(j, oc):
                return sweep(clo + j, oc)

        return jax.lax.fori_loop(0, ncl, cstep, occ)

    occ_ref[0:1, :] = jax.lax.fori_loop(0, ncand, inst_step, init)


@functools.partial(jax.named_call, name="pallas_closest_inst")
def _closest_call_inst(rays, tris, boxes, ixf, cand, tmin: float,
                       tmax: float):
    n_pad = rays.shape[1]
    grid = (n_pad // RAY_TILE_C,)
    n_inst = ixf.shape[0]
    ns1 = _pad_to(1 + n_inst, 8)
    kernel = functools.partial(_closest_kernel_inst, n_inst=n_inst,
                               tmin=tmin, tmax=tmax)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_TILE_C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(boxes.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ixf.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns1, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_TILE_C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE_C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE_C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * n_pad * tris.shape[0], bytes_accessed=n_pad * 48,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(rays, tris, boxes, ixf, cand)


@functools.partial(jax.named_call, name="pallas_occluded_inst")
def _occluded_call_inst(rays, tris, boxes, ixf, cand, tmin: float):
    n_pad = rays.shape[1]
    grid = (n_pad // RAY_TILE_C,)
    n_inst = ixf.shape[0]
    ns1 = _pad_to(1 + n_inst, 8)
    kernel = functools.partial(_occluded_kernel_inst, n_inst=n_inst,
                               tmin=tmin)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_TILE_C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(boxes.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ixf.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns1, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_TILE_C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, n_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=40 * n_pad * tris.shape[0], bytes_accessed=n_pad * 48,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(rays, tris, boxes, ixf, cand)[0]


def _inst_rows(tbl: jnp.ndarray, inst: jnp.ndarray) -> jnp.ndarray:
    """Exact one-hot row select ``tbl[inst]`` on the MXU.

    Small tables take one HIGHEST-precision [N, I] matmul (0/1 times
    f32, one nonzero term per row — bitwise the gather). Past the
    direct bound the [N, I] one-hot stops being affordable (a 16k-
    instance table at a 262k-lane wavefront would be a ~17 GB operand),
    so large tables split the id as (hi, lo) over a [H, 128, C]
    reshape — the exact two-level bf16-split select
    ``_lean_resolve_packed`` uses for 100k-row triangle tables, at
    [N, H] + [N, 128C] cost instead."""
    i_rows, c = tbl.shape
    if i_rows <= 2048:
        oh = (inst[:, None] == jnp.arange(i_rows,
                                          dtype=inst.dtype)[None, :]
              ).astype(tbl.dtype)
        return jnp.matmul(oh, tbl, precision=jax.lax.Precision.HIGHEST)
    h = (i_rows + 127) // 128
    if h * 128 != i_rows:
        tbl = jnp.pad(tbl, ((0, h * 128 - i_rows), (0, 0)))
    hi = inst // 128
    lo = inst % 128
    oh_hi = (hi[:, None] == jnp.arange(h, dtype=jnp.int32)[None, :]
             ).astype(jnp.bfloat16)
    tblr = tbl.reshape(h, 128 * c)
    # Three accumulated bf16-split matmuls reconstruct all 24
    # significand bits exactly; the optimization_barrier pins each
    # f32->bf16 rounding against --xla_allow_excess_precision (the
    # _lean_resolve_packed hazard).
    out = jnp.zeros((inst.shape[0], 128 * c), jnp.float32)
    rem = tblr
    for _ in range(3):
        part = jax.lax.optimization_barrier(rem.astype(jnp.bfloat16))
        rem = rem - part.astype(jnp.float32)
        out = out + jnp.matmul(oh_hi, part,
                               preferred_element_type=jnp.float32)
    out = out.reshape(-1, 128, c)
    oh_lo = (lo[:, None] == jnp.arange(128, dtype=jnp.int32)[None, :]
             ).astype(jnp.float32)
    return jnp.sum(out * oh_lo[:, :, None], axis=1)


def _mesh_space_rays(table: InstanceTable, origins: V3, dirs: V3,
                     inst: jnp.ndarray):
    """Per-lane winner-instance ray transform (host-side resolve twin of
    ``_xform_ray``), for the barycentric/edge-function recovery."""
    m = _inst_rows(table.rows[:, 0:12], inst)
    o = V3(m[:, 0] * origins.x + m[:, 1] * origins.y + m[:, 2] * origins.z
           + m[:, 3],
           m[:, 4] * origins.x + m[:, 5] * origins.y + m[:, 6] * origins.z
           + m[:, 7],
           m[:, 8] * origins.x + m[:, 9] * origins.y
           + m[:, 10] * origins.z + m[:, 11])
    d = V3(m[:, 0] * dirs.x + m[:, 1] * dirs.y + m[:, 2] * dirs.z,
           m[:, 4] * dirs.x + m[:, 5] * dirs.y + m[:, 6] * dirs.z,
           m[:, 8] * dirs.x + m[:, 9] * dirs.y + m[:, 10] * dirs.z)
    return o, d


def world_normal(table: InstanceTable, n_mesh: V3, inst: jnp.ndarray,
                 hit_mask: jnp.ndarray) -> V3:
    """Mesh-space normal -> world (inverse-transpose rows, orientation-
    corrected), normalized; misses stay 0 like every intersector."""
    nr = _inst_rows(table.nrm, inst)
    n = V3(nr[:, 0] * n_mesh.x + nr[:, 1] * n_mesh.y + nr[:, 2] * n_mesh.z,
           nr[:, 3] * n_mesh.x + nr[:, 4] * n_mesh.y + nr[:, 5] * n_mesh.z,
           nr[:, 6] * n_mesh.x + nr[:, 7] * n_mesh.y + nr[:, 8] * n_mesh.z)
    len2 = n.x * n.x + n.y * n.y + n.z * n.z
    scale = jnp.where(hit_mask, jax.lax.rsqrt(jnp.maximum(len2, 1e-30)),
                      0.0)
    return V3(n.x * scale, n.y * scale, n.z * scale)


def world_tangent(table: InstanceTable, t_mesh: V3,
                  inst: jnp.ndarray) -> V3:
    """Mesh-space tangent -> world by the forward linear part (covariant;
    consumers orthonormalize against the shading normal)."""
    fr = _inst_rows(table.fwd, inst)
    return V3(fr[:, 0] * t_mesh.x + fr[:, 1] * t_mesh.y
              + fr[:, 2] * t_mesh.z,
              fr[:, 3] * t_mesh.x + fr[:, 4] * t_mesh.y
              + fr[:, 5] * t_mesh.z,
              fr[:, 6] * t_mesh.x + fr[:, 7] * t_mesh.y
              + fr[:, 8] * t_mesh.z)


def intersect_closest(geom: SceneArrays, table: InstanceTable, origins: V3,
                      dirs: V3, tmin: float = 0.01, tmax: float = T_FAR,
                      want_uv: bool = True) -> Hit:
    """Closest hit through the instanced two-level sweep.

    Returns a ``Hit`` whose ``tri`` indexes the UNIQUE geometry's
    original triangle order (attribute tables stay mesh-sized), whose
    ``normal`` is the world-space geometric normal, and whose ``inst``
    is the winning instance id (shading consumers transform mesh-space
    vertex attributes with it — ``world_normal``/``world_tangent``)."""
    origins = as_v3(origins)
    dirs = as_v3(dirs)
    n = origins.x.shape[0]
    n_pad = _pad_to(n, RAY_TILE_C)
    tris, boxes = pack_tris_instanced(geom, table.mesh_ranges)
    rays = pack_rays(origins, dirs, None, n_pad)
    key = _coherence_key(rays, table.boxes, table.boxes)
    rays, perm, _ = _sorted_rays(rays, key)
    cand = super_candidates(rays, table.boxes, RAY_TILE_C, tmin, tmax)
    t, row, inst = _closest_call_inst(rays, tris, boxes, table.rows, cand,
                                      tmin, tmax)
    t, row, inst = _unsort(perm, (t[0], row[0], inst[0]))
    t, row, inst = t[:n], row[:n], inst[:n]
    uv_from = None
    if want_uv:
        uv_from = _mesh_space_rays(table, origins, dirs, inst)
    hit = _lean_resolve_packed(tris, t, row, uv_from=uv_from)
    n_world = world_normal(table, hit.normal, inst, hit.hit)
    return hit.replace(normal=n_world,
                       inst=jnp.where(hit.hit, inst, 0))


def intersect_occluded(geom: SceneArrays, table: InstanceTable,
                       origins: V3, dirs: V3, tmax: jnp.ndarray,
                       tmin: float = 0.01) -> jnp.ndarray:
    """Any-hit occlusion over instances; refractive surfaces pass."""
    origins = as_v3(origins)
    dirs = as_v3(dirs)
    n = origins.x.shape[0]
    n_pad = _pad_to(n, RAY_TILE_C)
    tris, boxes = pack_tris_instanced(geom, table.mesh_ranges)
    tmax = jnp.asarray(tmax, jnp.float32)
    rays = pack_rays(origins, dirs, jnp.reshape(tmax, (-1,)), n_pad)
    key = _coherence_key(rays, table.boxes, table.boxes)
    rays, perm, _ = _sorted_rays(rays, key)
    tmax_pad = rays[6]
    cand = super_candidates(rays, table.boxes, RAY_TILE_C, tmin, tmax_pad)
    occ = _occluded_call_inst(rays, tris, boxes, table.rows, cand, tmin)
    (occ,) = _unsort(perm, (occ[0],))
    return occ[:n] > 0.5


def get_intersectors(geom: SceneArrays, table: InstanceTable,
                     cfg) -> tuple:
    """(closest_fn, occluded_fn) over the instanced scene — the drop-in
    twin of ``intersect.get_intersectors`` for ``WhittedScene``s that
    kept their instances (``ws.inst``)."""
    closest = functools.partial(intersect_closest, geom, table,
                                tmin=cfg.t_min, tmax=cfg.t_max)
    occluded = functools.partial(intersect_occluded, geom, table,
                                 tmin=cfg.t_min)

    def closest_fn(o, d):
        return closest(o, d)

    def occluded_fn(o, d, tmax):
        return occluded(o, d, tmax=tmax)

    return closest_fn, occluded_fn
