"""Scene JSON: an OBJ mesh plus analytic primitives in one renderable file.

The reference binds sphere / sphere-shell / parallelogram intersection
programs into its pipeline through the SBT (``sutil/Scene.cpp:1368-1450``,
``cuda/geometry.cu:38-144``, ``cuda/sphere.cu:37-97``); its scene *data*
for those comes from hardcoded C++ sample setup. tpu_pt makes the same
capability reachable from a scene file: a small JSON that references an
optional OBJ mesh and declares primitives + extra materials.

Format (all paths relative to the JSON file)::

    {
      "obj": "cornell_box.obj",            // optional triangle mesh
      "materials": [                        // appended to the OBJ's .mtl set
        {"name": "RefractiveShell", "diffuse": [1, 1, 1], "ior": 1.5}
      ],
      "primitives": [
        {"type": "sphere", "center": [x, y, z], "radius": r,
         "material": "name-or-index"},
        {"type": "sphere_shell", "center": [...], "radius1": ri,
         "radius2": ro, "material": ...},
        {"type": "parallelogram", "anchor": [...], "v1": [...],
         "v2": [...], "material": ...},
        {"type": "curve", "basis": "linear" | "quadratic_bspline" |
         "cubic_bspline" | "catmullrom", "points": [[x, y, z], ...],
         "radii": [r, ...] | r, "material": ...}
      ],
      "light": {"corner": [...], "v1": [...], "v2": [...],
                "emission": [...]}          // optional AreaLight override
    }

Material ``bsdf`` defaults to the reference's name-substring rule
(``classify_bsdf``), so a material named "Refractive..." refracts, exactly
as it would coming from an .mtl.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .arrays import AreaLight, SceneArrays, build_scene_arrays, \
    default_cornell_light
from .objloader import (Material, ObjMesh, classify_bsdf, detect_area_light,
                        load_obj)

_PRIM_TYPES = {"sphere": 0, "parallelogram": 1, "sphere_shell": 2}


def load_scene_json(path: str, light: AreaLight | None = None,
                    auto_light: bool = True,
                    build_bvh: bool = True) -> SceneArrays:
    """Scene JSON -> SceneArrays with ``prims`` attached."""
    with open(path) as f:
        doc = json.load(f)
    base = os.path.dirname(os.path.abspath(path))

    if "obj" in doc:
        mesh = load_obj(os.path.join(base, doc["obj"]))
    else:
        mesh = ObjMesh()
    materials = list(mesh.materials)
    if not materials:
        materials = [Material(name="default")]
    name_to_idx = {m.name: i for i, m in enumerate(materials)}

    for md in doc.get("materials", []):
        name = md.get("name", f"json_mat_{len(materials)}")
        mat = Material(
            name=name,
            diffuse=tuple(md.get("diffuse", (0.8, 0.8, 0.8))),
            emission=tuple(md.get("emission", (0.0, 0.0, 0.0))),
            roughness=float(md.get("roughness", 0.5)),
            metallic=float(md.get("metallic", 0.0)),
            ior=float(md.get("ior", 1.0)),
            bsdf=int(md["bsdf"]) if "bsdf" in md else classify_bsdf(name),
        )
        name_to_idx[name] = len(materials)
        materials.append(mat)

    def mat_index(ref) -> int:
        if isinstance(ref, int):
            return ref
        if ref not in name_to_idx:
            raise ValueError(f"scene JSON references unknown material {ref!r}")
        return name_to_idx[ref]

    prim_dicts = []
    curve_dicts = []
    for p in doc.get("primitives", []):
        if p.get("type") == "curve":
            from ..intersect.curves import expand_curve_spec
            curve_dicts.extend(
                expand_curve_spec(p, mat_index(p.get("material", 0))))
            continue
        kind = _PRIM_TYPES.get(p.get("type"))
        if kind is None:
            raise ValueError(f"unknown primitive type {p.get('type')!r}")
        d = dict(kind=kind, mat=mat_index(p.get("material", 0)))
        if p["type"] == "sphere":
            d.update(center=p["center"], radius=p["radius"])
        elif p["type"] == "sphere_shell":
            d.update(center=p["center"], radius1=p["radius1"],
                     radius2=p["radius2"])
        else:
            d.update(anchor=p["anchor"], v1=p["v1"], v2=p["v2"])
        prim_dicts.append(d)

    if light is None and "light" in doc:
        ld = doc["light"]
        v1 = np.asarray(ld["v1"], np.float32)
        v2 = np.asarray(ld["v2"], np.float32)
        n = np.cross(v1, v2)
        n = (n / max(float(np.linalg.norm(n)), 1e-30)).astype(np.float32)
        light = AreaLight(corner=np.asarray(ld["corner"], np.float32),
                          v1=v1, v2=v2, normal=n,
                          emission=np.asarray(ld["emission"], np.float32))
    if light is None and auto_light and mesh.indices.shape[0]:
        light = detect_area_light(mesh)
    if light is None:
        light = default_cornell_light()

    if mesh.indices.shape[0]:
        verts, idx, mids = mesh.vertices, mesh.indices, mesh.mat_indices
    else:
        verts = np.zeros((0, 3), np.float32)
        idx = np.zeros((0, 3), np.int64)
        mids = np.zeros((0,), np.int64)
    scene, host = build_scene_arrays(
        verts, idx, mids, [m.as_dict() for m in materials], light=light,
        return_host=True)
    if build_bvh and mesh.indices.shape[0]:
        from ..intersect.lbvh import with_bvh
        scene = with_bvh(scene, host=host)

    if prim_dicts:
        from ..intersect.primitives import make_primitives
        scene = scene.replace(
            prims=make_primitives(prim_dicts, mat_bsdf=host["mat_bsdf"]))
    if curve_dicts:
        from ..intersect.curves import make_curves
        scene = scene.replace(
            curves=make_curves(curve_dicts, mat_bsdf=host["mat_bsdf"]))
    return scene
