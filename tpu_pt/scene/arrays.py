"""Flattened scene representation for the TPU wavefront renderer.

The reference uploads vertices/indices/material-indices into an OptiX GAS and
dispatches materials via per-material SBT hitgroup records
(``PathTracerMain.cpp:260-398,544-627``). The TPU-native equivalent is a pure
SoA pytree: padded triangle arrays (pretransformed for Möller-Trumbore) plus
stacked material tables indexed by a ``mat_id`` array — the SBT becomes an
integer gather, the GAS becomes dense/BVH intersection kernels.
"""

from __future__ import annotations

import numpy as np
from flax import struct
import jax.numpy as jnp

# BSDF ids — parity with ``TinyObjWrapper.h:27-31`` (BSDFType).
BSDF_DIFFUSE = 0
BSDF_METALLIC = 1
BSDF_REFRACTION = 2

# Triangle arrays are padded to a multiple of this so Pallas tiles divide
# evenly ((8, 128) f32 tiling; see pallas guide "Tiling Constraints").
TRI_PAD = 128


@struct.dataclass
class AreaLight:
    """Rectangular area light (``pathTracer.h:77-83`` AreaLight)."""
    corner: jnp.ndarray   # [3]
    v1: jnp.ndarray       # [3]
    v2: jnp.ndarray       # [3]
    normal: jnp.ndarray   # [3]
    emission: jnp.ndarray  # [3]


@struct.dataclass
class SceneArrays:
    """Padded, device-ready scene. All leaves are jax arrays.

    Triangles are stored as (v0, e1, e2) with e1 = v1 - v0, e2 = v2 - v0 so the
    intersector never regathers vertices; ``tri_normal`` is the geometric
    normal ``normalize(cross(e1, e2))`` — the same N_0 the reference computes
    per hit (``pathTracerPrograms.cu:886-891``), hoisted to scene build time.
    """
    tri_v0: jnp.ndarray       # [T, 3] f32
    tri_e1: jnp.ndarray       # [T, 3] f32
    tri_e2: jnp.ndarray       # [T, 3] f32
    tri_normal: jnp.ndarray   # [T, 3] f32
    tri_valid: jnp.ndarray    # [T] bool (False on padding)
    mat_id: jnp.ndarray       # [T] i32

    mat_diffuse: jnp.ndarray   # [M, 3] f32
    mat_emission: jnp.ndarray  # [M, 3] f32
    mat_roughness: jnp.ndarray  # [M] f32
    mat_metallic: jnp.ndarray   # [M] f32
    mat_ior: jnp.ndarray        # [M] f32
    mat_bsdf: jnp.ndarray       # [M] i32
    mat_is_emissive: jnp.ndarray  # [M] bool

    light: AreaLight

    # Optional acceleration structure (tpu_pt.intersect.lbvh.BVH), attached
    # once at scene-build time — the analog of the reference's GAS handle in
    # PathTraceParams (``pathTracer.h:102``).
    bvh: object = None

    # True (unpadded) triangle count, kept static so kernels can trim
    # their sweep range below the TRI_PAD granularity; 0 = unknown (use
    # the padded count).
    num_tris: int = struct.field(pytree_node=False, default=0)

    @property
    def num_tris_padded(self) -> int:
        return self.tri_v0.shape[0]

    @property
    def num_materials(self) -> int:
        return self.mat_diffuse.shape[0]


def default_cornell_light() -> AreaLight:
    """The reference's hardcoded Cornell area light
    (``PathTracerMain.cpp:154-158``)."""
    v1 = np.array([0.0, 0.0, 105.0], np.float32)
    v2 = np.array([-130.0, 0.0, 0.0], np.float32)
    n = np.cross(v1, v2)
    n = n / np.linalg.norm(n)
    return AreaLight(
        corner=jnp.asarray([343.0, 547.0, 227.0], jnp.float32),
        v1=jnp.asarray(v1),
        v2=jnp.asarray(v2),
        normal=jnp.asarray(n, jnp.float32),
        emission=jnp.asarray([10.0, 10.0, 10.0], jnp.float32),
    )


def build_scene_arrays(vertices: np.ndarray,
                       indices: np.ndarray,
                       mat_ids: np.ndarray,
                       materials: list[dict],
                       light: AreaLight | None = None,
                       pad_to: int = TRI_PAD,
                       return_host: bool = False):
    """Flatten host-side mesh data into a padded SceneArrays pytree.

    ``vertices`` [V, 3], ``indices`` [T, 3] int, ``mat_ids`` [T] int,
    ``materials`` a list of dicts with keys diffuse/emission/roughness/
    metallic/ior/bsdf (the loader's Material struct, parity with
    ``TinyObjWrapper.h:33-40``).

    ``return_host=True`` additionally returns the padded numpy arrays
    (keys v0/e1/e2/normal/valid/mat_id/mat_bsdf) so scene-load-time
    consumers (the native LBVH builder) never read device memory back —
    a device->host pull over a tunneled TPU runs at whole-seconds
    latency.
    """
    vertices = np.asarray(vertices, np.float32).reshape(-1, 3)
    indices = np.asarray(indices, np.int64).reshape(-1, 3)
    mat_ids = np.asarray(mat_ids, np.int64).reshape(-1)
    t = indices.shape[0]
    assert mat_ids.shape[0] == t, (mat_ids.shape, t)

    v0 = vertices[indices[:, 0]]
    v1 = vertices[indices[:, 1]]
    v2 = vertices[indices[:, 2]]
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)
    nlen = np.linalg.norm(n, axis=-1, keepdims=True)
    n = np.where(nlen > 0, n / np.maximum(nlen, 1e-30), 0.0).astype(np.float32)

    t_pad = max(pad_to, ((t + pad_to - 1) // pad_to) * pad_to)

    def pad(a, fill=0.0):
        out = np.full((t_pad,) + a.shape[1:], fill, a.dtype)
        out[:t] = a
        return out

    if not materials:
        materials = [dict(diffuse=(0.8, 0.8, 0.8), emission=(0, 0, 0),
                          roughness=0.5, metallic=0.0, ior=1.0,
                          bsdf=BSDF_DIFFUSE)]
        mat_ids = np.zeros(t, np.int64)

    m = len(materials)
    diffuse = np.array([mm["diffuse"] for mm in materials], np.float32)
    emission = np.array([mm["emission"] for mm in materials], np.float32)
    roughness = np.array([mm["roughness"] for mm in materials], np.float32)
    metallic = np.array([mm["metallic"] for mm in materials], np.float32)
    ior = np.array([mm["ior"] for mm in materials], np.float32)
    bsdf = np.array([mm["bsdf"] for mm in materials], np.int32)
    is_emissive = np.linalg.norm(emission, axis=-1) > 0.0

    mat_ids = np.clip(mat_ids, 0, m - 1)

    host = dict(v0=pad(v0), e1=pad(e1), e2=pad(e2), normal=pad(n),
                valid=pad(np.ones(t, bool), fill=False),
                mat_id=pad(mat_ids.astype(np.int32)), mat_bsdf=bsdf)
    scene = SceneArrays(
        tri_v0=jnp.asarray(host["v0"]),
        tri_e1=jnp.asarray(host["e1"]),
        tri_e2=jnp.asarray(host["e2"]),
        tri_normal=jnp.asarray(host["normal"]),
        tri_valid=jnp.asarray(host["valid"]),
        mat_id=jnp.asarray(host["mat_id"]),
        mat_diffuse=jnp.asarray(diffuse),
        mat_emission=jnp.asarray(emission),
        mat_roughness=jnp.asarray(roughness),
        mat_metallic=jnp.asarray(metallic),
        mat_ior=jnp.asarray(ior),
        mat_bsdf=jnp.asarray(bsdf),
        mat_is_emissive=jnp.asarray(is_emissive),
        light=light if light is not None else default_cornell_light(),
        num_tris=t,
    )
    return (scene, host) if return_host else scene
