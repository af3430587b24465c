#!/usr/bin/env python3
"""Generate glTF 2.0 test assets (embedded-buffer .gltf + .glb).

A small PBR scene: a ground plane, a rough red cube, a metallic sphere, a
glass-ish blend quad, a textured quad, two instanced cubes via node
transforms, and a KHR_lights_punctual point light.
"""

from __future__ import annotations

import base64
import json
import math
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def cube(size=1.0):
    s = size / 2
    verts = []
    norms = []
    uvs = []
    idx = []
    faces = [
        ((0, 0, 1), [(-s, -s, s), (s, -s, s), (s, s, s), (-s, s, s)]),
        ((0, 0, -1), [(s, -s, -s), (-s, -s, -s), (-s, s, -s), (s, s, -s)]),
        ((1, 0, 0), [(s, -s, s), (s, -s, -s), (s, s, -s), (s, s, s)]),
        ((-1, 0, 0), [(-s, -s, -s), (-s, -s, s), (-s, s, s), (-s, s, -s)]),
        ((0, 1, 0), [(-s, s, s), (s, s, s), (s, s, -s), (-s, s, -s)]),
        ((0, -1, 0), [(-s, -s, -s), (s, -s, -s), (s, -s, s), (-s, -s, s)]),
    ]
    for n, quad in faces:
        base = len(verts)
        verts.extend(quad)
        norms.extend([n] * 4)
        uvs.extend([(0, 0), (1, 0), (1, 1), (0, 1)])
        idx.extend([base, base + 1, base + 2, base, base + 2, base + 3])
    return (np.array(verts, np.float32), np.array(norms, np.float32),
            np.array(uvs, np.float32), np.array(idx, np.uint16))


def sphere(r=1.0, n_lat=16, n_lon=24):
    verts, norms, uvs, idx = [], [], [], []
    for i in range(n_lat + 1):
        th = math.pi * i / n_lat
        for j in range(n_lon + 1):
            ph = 2 * math.pi * j / n_lon
            n = (math.sin(th) * math.cos(ph), math.cos(th),
                 math.sin(th) * math.sin(ph))
            verts.append(tuple(r * c for c in n))
            norms.append(n)
            uvs.append((j / n_lon, i / n_lat))
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * (n_lon + 1) + j
            b = a + n_lon + 1
            idx.extend([a, b, a + 1, a + 1, b, b + 1])
    return (np.array(verts, np.float32), np.array(norms, np.float32),
            np.array(uvs, np.float32), np.array(idx, np.uint16))


def plane(size=10.0):
    s = size / 2
    verts = np.array([(-s, 0, -s), (s, 0, -s), (s, 0, s), (-s, 0, s)],
                     np.float32)
    norms = np.array([(0, 1, 0)] * 4, np.float32)
    uvs = np.array([(0, 0), (4, 0), (4, 4), (0, 4)], np.float32)
    idx = np.array([0, 2, 1, 0, 3, 2], np.uint16)
    return verts, norms, uvs, idx


def checker_png(path, n=8, res=64):
    from tpu_pt import film
    img = np.zeros((res, res, 3), np.uint8)
    cell = res // n
    for y in range(res):
        for x in range(res):
            img[y, x] = (230, 230, 230) if ((x // cell + y // cell) % 2 == 0) \
                else (40, 40, 160)
    film.write_png(path, img)


def bumps_png(path, n=6, res=64):
    """Tangent-space normal map: a grid of spherical bumps."""
    from tpu_pt import film
    img = np.zeros((res, res, 3), np.uint8)
    cell = res / n
    for y in range(res):
        for x in range(res):
            cx = (x % cell) / cell * 2 - 1
            cy = (y % cell) / cell * 2 - 1
            r2 = cx * cx + cy * cy
            if r2 < 0.64:
                nz = math.sqrt(max(1.0 - r2 / 0.64, 0.0))
                nv = np.array([-cx, -cy, max(nz, 0.3)])
            else:
                nv = np.array([0.0, 0.0, 1.0])
            nv = nv / np.linalg.norm(nv)
            img[y, x] = np.clip((nv * 0.5 + 0.5) * 255, 0, 255)
    film.write_png(path, img)


def mr_png(path, res=64):
    """Metallic-roughness map: G = roughness ramp in v, B = metallic
    ramp in u (glTF channel convention)."""
    from tpu_pt import film
    img = np.zeros((res, res, 3), np.uint8)
    for y in range(res):
        for x in range(res):
            img[y, x] = (0, int(255 * y / (res - 1)),
                         int(255 * x / (res - 1)))
    film.write_png(path, img)


def build(out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    checker_png(os.path.join(out_dir, "checker.png"))
    bumps_png(os.path.join(out_dir, "bumps.png"))
    mr_png(os.path.join(out_dir, "mr.png"))

    meshes_np = [plane(12.0), cube(1.5), sphere(1.0), cube(1.0)]
    blob = b""
    buffer_views = []
    accessors = []
    meshes = []

    def add_accessor(arr, target, ctype, atype):
        nonlocal blob
        off = len(blob)
        blob += arr.tobytes()
        while len(blob) % 4:
            blob += b"\0"
        buffer_views.append(dict(buffer=0, byteOffset=off,
                                 byteLength=arr.nbytes, target=target))
        acc = dict(bufferView=len(buffer_views) - 1, componentType=ctype,
                   count=arr.shape[0], type=atype)
        if atype == "VEC3":
            acc["min"] = [float(x) for x in arr.min(axis=0)]
            acc["max"] = [float(x) for x in arr.max(axis=0)]
        accessors.append(acc)
        return len(accessors) - 1

    for k, (v, n, uv, idx) in enumerate(meshes_np):
        pos_a = add_accessor(v, 34962, 5126, "VEC3")
        nrm_a = add_accessor(n, 34962, 5126, "VEC3")
        uv_a = add_accessor(uv, 34962, 5126, "VEC2")
        idx_a = add_accessor(idx.reshape(-1, 1), 34963, 5123, "SCALAR")
        meshes.append(dict(primitives=[dict(
            attributes=dict(POSITION=pos_a, NORMAL=nrm_a, TEXCOORD_0=uv_a),
            indices=idx_a, material=k)]))

    materials = [
        dict(name="Ground",
             pbrMetallicRoughness=dict(
                 baseColorFactor=[1.0, 1.0, 1.0, 1.0],
                 baseColorTexture=dict(index=0),
                 metallicFactor=0.0, roughnessFactor=0.9),
             normalTexture=dict(index=1, scale=1.0)),
        dict(name="RedCube",
             pbrMetallicRoughness=dict(
                 baseColorFactor=[0.8, 0.1, 0.1, 1.0],
                 metallicFactor=0.0, roughnessFactor=0.6),
             emissiveFactor=[0.4, 0.25, 0.08],
             emissiveTexture=dict(index=0)),
        dict(name="MetalSphere",
             pbrMetallicRoughness=dict(
                 baseColorFactor=[0.9, 0.8, 0.6, 1.0],
                 metallicFactor=1.0, roughnessFactor=1.0,
                 metallicRoughnessTexture=dict(index=2))),
        dict(name="BlendCube", alphaMode="BLEND",
             pbrMetallicRoughness=dict(
                 baseColorFactor=[0.2, 0.5, 0.9, 0.35],
                 metallicFactor=0.0, roughnessFactor=0.3)),
    ]

    nodes = [
        dict(mesh=0, name="ground"),
        dict(mesh=1, translation=[-2.0, 0.76, 0.0], name="redcube"),
        dict(mesh=2, translation=[0.0, 1.0, 0.5], name="metalsphere"),
        dict(mesh=3, translation=[2.0, 0.51, -0.5],
             rotation=[0.0, math.sin(0.3), 0.0, math.cos(0.3)],
             name="blendcube"),
        # Instance of the red cube, scaled (tests node transforms).
        dict(mesh=1, translation=[2.5, 0.4, 2.0],
             scale=[0.5, 0.5, 0.5], name="redcube2"),
        dict(name="light",
             translation=[3.0, 6.0, 3.0],
             extensions=dict(KHR_lights_punctual=dict(light=0))),
        # Asset-declared perspective camera at the canonical test view
        # (the loader reads it like sutil::Scene, Scene.cpp:166-191):
        # -Z looks from (6, 4.5, 7) roughly toward the scene center.
        dict(name="camera", camera=0,
             translation=[6.0, 4.5, 7.0],
             rotation=[-0.177885, 0.340649, 0.065804, 0.920861]),
    ]

    doc = dict(
        asset=dict(version="2.0", generator="tpu_pt make_gltf_assets"),
        scene=0,
        scenes=[dict(nodes=list(range(len(nodes))))],
        cameras=[dict(type="perspective",
                      perspective=dict(yfov=math.radians(40.0),
                                       aspectRatio=1.0, znear=0.01))],
        nodes=nodes,
        meshes=meshes,
        materials=materials,
        textures=[dict(source=0), dict(source=1), dict(source=2)],
        images=[dict(uri="checker.png"), dict(uri="bumps.png"),
                dict(uri="mr.png")],
        samplers=[dict(magFilter=9729, minFilter=9729,
                       wrapS=10497, wrapT=10497)],
        buffers=[dict(byteLength=len(blob),
                      uri="data:application/octet-stream;base64,"
                          + base64.b64encode(blob).decode())],
        bufferViews=buffer_views,
        accessors=accessors,
        extensions=dict(KHR_lights_punctual=dict(lights=[
            dict(type="point", color=[1.0, 0.95, 0.9], intensity=3.0)])),
        extensionsUsed=["KHR_lights_punctual"],
    )

    with open(os.path.join(out_dir, "pbr_test.gltf"), "w") as f:
        json.dump(doc, f)

    # Variant with analytic primitives declared in the document extras
    # (whitted custom-primitive parity: Scene.cpp:1368-1450 binds
    # sphere/shell/parallelogram programs into the whitted SBT; tpu_pt
    # reads them from the asset itself).
    doc_prims = json.loads(json.dumps(doc))
    doc_prims["extras"] = dict(tpu_pt_primitives=[
        dict(type="sphere", center=[-1.2, 0.5, 1.4], radius=0.5,
             material=2),                      # metallic sphere
        dict(type="sphere_shell", center=[1.3, 0.6, 1.2],
             radius1=0.45, radius2=0.6, material=1),
        dict(type="parallelogram", anchor=[-2.0, 0.01, -1.8],
             v1=[1.2, 0.0, 0.0], v2=[0.0, 0.0, 1.2], material=1),
    ])
    # Swept-sphere curves in the same extras channel (GeometryData.h
    # round-curve parity from a glTF asset): a cubic-b-spline arc over
    # the scene and a catmullrom strand near the ground.
    doc_prims["extras"]["tpu_pt_curves"] = [
        dict(basis="cubic_bspline",
             points=[[-2.2, 0.3, 0.0], [-1.2, 1.8, 0.6], [1.2, 1.9, 0.6],
                     [2.2, 0.4, 0.0], [2.8, 0.2, -0.5]],
             radii=0.12, material=2),
        dict(basis="catmullrom",
             points=[[-1.5, 0.15, 2.2], [-0.5, 0.35, 2.4],
                     [0.5, 0.15, 2.3], [1.5, 0.4, 2.2]],
             radii=[0.05, 0.14, 0.14, 0.05], material=0),
    ]
    with open(os.path.join(out_dir, "pbr_prims.gltf"), "w") as f:
        json.dump(doc_prims, f)

    # GLB variant: same doc, binary chunk instead of data URI.
    doc_glb = json.loads(json.dumps(doc))
    doc_glb["buffers"] = [dict(byteLength=len(blob))]
    js = json.dumps(doc_glb).encode()
    while len(js) % 4:
        js += b" "
    bin_chunk = blob
    while len(bin_chunk) % 4:
        bin_chunk += b"\0"
    glb = (b"glTF" + struct.pack("<II", 2, 12 + 8 + len(js) + 8
                                 + len(bin_chunk))
           + struct.pack("<II", len(js), 0x4E4F534A) + js
           + struct.pack("<II", len(bin_chunk), 0x004E4942) + bin_chunk)
    with open(os.path.join(out_dir, "pbr_test.glb"), "wb") as f:
        f.write(glb)
    build_alpha(out_dir)
    print(f"glTF assets written to {out_dir}")


def alpha_png(path, res=64):
    """RGBA texture for the fractional-shadow asset: white RGB, alpha
    0.2 on the left half (u < 0.5) and 0.8 on the right (51/255 and
    204/255 are EXACT in float, so tests can assert transmissions
    analytically)."""
    from tpu_pt import film
    img = np.full((res, res, 4), 255, np.uint8)
    img[:, : res // 2, 3] = 51      # alpha 0.2
    img[:, res // 2:, 3] = 204      # alpha 0.8
    film.write_png(path, img)


def uquad(size=1.0):
    """Horizontal unit-UV quad facing +Y (u grows along +x)."""
    s = size / 2
    verts = np.array([(-s, 0, -s), (s, 0, -s), (s, 0, s), (-s, 0, s)],
                     np.float32)
    norms = np.array([(0, 1, 0)] * 4, np.float32)
    uvs = np.array([(0, 0), (1, 0), (1, 1), (0, 1)], np.float32)
    idx = np.array([0, 2, 1, 0, 3, 2], np.uint16)
    return verts, norms, uvs, idx


def build_alpha(out_dir: str):
    """alpha_shadow.gltf: the fractional-shadow-occlusion parity scene
    (``__anyhit__occlusion``, cuda/whitted.cu:113-138).

    A gray ground plane under three floating quads — textured BLEND,
    textured MASK (cutoff 0.5), and UNTEXTURED blend (the anyhit gates
    on base_color_tex, so it occludes fully) — lit by one point light
    high above. Shadow transmissions under the quads: textured blend
    1-alpha (0.8 left / 0.2 right), mask 1.0 left (alpha below cutoff
    passes) / 0.2 right, untextured blend 0."""
    os.makedirs(out_dir, exist_ok=True)
    alpha_png(os.path.join(out_dir, "alpha.png"))

    meshes_np = [plane(12.0), uquad(2.0)]
    blob = b""
    buffer_views = []
    accessors = []
    meshes = []

    def add_accessor(arr, target, ctype, atype):
        nonlocal blob
        off = len(blob)
        blob += arr.tobytes()
        while len(blob) % 4:
            blob += b"\0"
        buffer_views.append(dict(buffer=0, byteOffset=off,
                                 byteLength=arr.nbytes, target=target))
        acc = dict(bufferView=len(buffer_views) - 1, componentType=ctype,
                   count=arr.shape[0], type=atype)
        if atype == "VEC3":
            acc["min"] = [float(x) for x in arr.min(axis=0)]
            acc["max"] = [float(x) for x in arr.max(axis=0)]
        accessors.append(acc)
        return len(accessors) - 1

    prim_sets = []
    for v, n, uv, idx in meshes_np:
        pos_a = add_accessor(v, 34962, 5126, "VEC3")
        nrm_a = add_accessor(n, 34962, 5126, "VEC3")
        uv_a = add_accessor(uv, 34962, 5126, "VEC2")
        idx_a = add_accessor(idx.reshape(-1, 1), 34963, 5123, "SCALAR")
        prim_sets.append((pos_a, nrm_a, uv_a, idx_a))
    # One mesh per material so instances of the quad can differ.
    for mat in range(4):
        pos_a, nrm_a, uv_a, idx_a = prim_sets[0 if mat == 0 else 1]
        meshes.append(dict(primitives=[dict(
            attributes=dict(POSITION=pos_a, NORMAL=nrm_a, TEXCOORD_0=uv_a),
            indices=idx_a, material=mat)]))

    materials = [
        dict(name="Ground",
             pbrMetallicRoughness=dict(
                 baseColorFactor=[0.85, 0.85, 0.85, 1.0],
                 metallicFactor=0.0, roughnessFactor=0.9)),
        dict(name="BlendTex", alphaMode="BLEND",
             pbrMetallicRoughness=dict(
                 baseColorFactor=[0.9, 0.9, 1.0, 0.9],
                 baseColorTexture=dict(index=0),
                 metallicFactor=0.0, roughnessFactor=0.5)),
        dict(name="MaskTex", alphaMode="MASK", alphaCutoff=0.5,
             pbrMetallicRoughness=dict(
                 baseColorFactor=[1.0, 0.9, 0.9, 1.0],
                 baseColorTexture=dict(index=0),
                 metallicFactor=0.0, roughnessFactor=0.5)),
        dict(name="BlendPlain", alphaMode="BLEND",
             pbrMetallicRoughness=dict(
                 baseColorFactor=[0.2, 0.4, 0.9, 0.35],
                 metallicFactor=0.0, roughnessFactor=0.5)),
    ]

    nodes = [
        dict(mesh=0, name="ground"),
        dict(mesh=1, translation=[-3.0, 1.5, 0.0], name="blendtex"),
        # Second textured-blend layer below the first: a vertical
        # shadow ray crosses BOTH, so the transmission is the product
        # of per-hit factors (the anyhit accumulates multiplicatively).
        dict(mesh=1, translation=[-3.0, 0.8, 0.0], name="blendtex2"),
        dict(mesh=2, translation=[0.0, 1.5, 0.0], name="masktex"),
        dict(mesh=3, translation=[3.0, 1.5, 0.0], name="blendplain"),
        dict(name="light", translation=[0.0, 30.0, 0.0],
             extensions=dict(KHR_lights_punctual=dict(light=0))),
    ]

    doc = dict(
        asset=dict(version="2.0", generator="tpu_pt make_gltf_assets"),
        scene=0,
        scenes=[dict(nodes=list(range(len(nodes))))],
        nodes=nodes,
        meshes=meshes,
        materials=materials,
        textures=[dict(source=0)],
        images=[dict(uri="alpha.png")],
        samplers=[],
        buffers=[dict(byteLength=len(blob),
                      uri="data:application/octet-stream;base64,"
                          + base64.b64encode(blob).decode())],
        bufferViews=buffer_views,
        accessors=accessors,
        extensions=dict(KHR_lights_punctual=dict(lights=[
            dict(type="point", color=[1.0, 1.0, 1.0], intensity=5.0)])),
        extensionsUsed=["KHR_lights_punctual"],
    )
    path = os.path.join(out_dir, "alpha_shadow.gltf")
    with open(path, "w") as f:
        json.dump(doc, f)
    print(f"wrote {path}")


def leaf_png(path, res=64):
    """RGBA leaf-card texture: green RGB, alpha a centered disc (255
    inside radius 0.45, 0 outside) — alpha-MASK foliage cards."""
    from tpu_pt import film
    img = np.zeros((res, res, 4), np.uint8)
    img[..., 0] = 40
    img[..., 1] = 150
    img[..., 2] = 45
    yy, xx = np.mgrid[0:res, 0:res]
    u = (xx + 0.5) / res - 0.5
    v = (yy + 0.5) / res - 0.5
    img[..., 3] = np.where(u * u + v * v < 0.45 ** 2, 255, 0)
    film.write_png(path, img)


def vquad(size=1.0, y0=0.0):
    """Vertical unit-UV quad in the XZ=0 plane, facing +Z, base at y0."""
    s = size / 2
    verts = np.array([(-s, y0, 0), (s, y0, 0), (s, y0 + size, 0),
                      (-s, y0 + size, 0)], np.float32)
    norms = np.array([(0, 0, 1)] * 4, np.float32)
    uvs = np.array([(0, 1), (1, 1), (1, 0), (0, 0)], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    return verts, norms, uvs, idx


def crossed_leaves(n_cards=6, size=3.2, y0=3.4):
    """Foliage canopy: n vertical leaf cards crossed around +Y."""
    vs, ns, uvs, idx = [], [], [], []
    base = 0
    for i in range(n_cards):
        a = math.pi * i / n_cards
        c, s = math.cos(a), math.sin(a)
        v, n, uv, ix = vquad(size, y0)
        r = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        vs.append(v @ r.T)
        ns.append(n @ r.T)
        uvs.append(uv)
        idx.append(ix.astype(np.int64) + base)
        base += v.shape[0]
    return (np.concatenate(vs), np.concatenate(ns),
            np.concatenate(uvs),
            np.concatenate(idx).astype(np.uint16))


def build_foliage(out_dir: str, n_trees=300, seed=11,
                  filename="foliage.gltf"):
    """foliage.gltf: the alpha-masked instanced-foliage workload — the
    scene class the instanced contract + fractional shadow split exist
    for. One trunk mesh + one leaf-CARD canopy mesh (6 crossed quads,
    baseColorTexture with a disc alpha, alphaMode MASK) instanced
    ``n_trees`` times over a ground plane; shadows through the leaf
    cards must pass outside the discs (MASK below cutoff) and block
    inside them."""
    os.makedirs(out_dir, exist_ok=True)
    leaf_png(os.path.join(out_dir, "leaf.png"))
    meshes_np = [plane(200.0), cone(0.5, 3.6, 10), crossed_leaves()]
    blob = b""
    buffer_views = []
    accessors = []

    def add_accessor(arr, target, ctype, atype):
        nonlocal blob
        off = len(blob)
        blob += arr.tobytes()
        while len(blob) % 4:
            blob += b"\0"
        buffer_views.append(dict(buffer=0, byteOffset=off,
                                 byteLength=arr.nbytes, target=target))
        acc = dict(bufferView=len(buffer_views) - 1, componentType=ctype,
                   count=arr.shape[0], type=atype)
        if atype == "VEC3":
            acc["min"] = [float(x) for x in arr.min(axis=0)]
            acc["max"] = [float(x) for x in arr.max(axis=0)]
        accessors.append(acc)
        return len(accessors) - 1

    prim_sets = []
    for v, n, uv, idx in meshes_np:
        pos_a = add_accessor(v, 34962, 5126, "VEC3")
        nrm_a = add_accessor(n, 34962, 5126, "VEC3")
        uv_a = add_accessor(uv, 34962, 5126, "VEC2")
        idx_a = add_accessor(idx.reshape(-1, 1), 34963, 5123, "SCALAR")
        prim_sets.append(dict(
            attributes=dict(POSITION=pos_a, NORMAL=nrm_a,
                            TEXCOORD_0=uv_a),
            indices=idx_a))
    meshes = [
        dict(name="ground", primitives=[dict(**prim_sets[0], material=0)]),
        dict(name="trunk", primitives=[dict(**prim_sets[1], material=1)]),
        dict(name="leaves", primitives=[dict(**prim_sets[2], material=2)]),
    ]
    materials = [
        dict(name="Ground", pbrMetallicRoughness=dict(
            baseColorFactor=[0.35, 0.32, 0.25, 1.0],
            metallicFactor=0.0, roughnessFactor=0.95)),
        dict(name="Bark", pbrMetallicRoughness=dict(
            baseColorFactor=[0.32, 0.2, 0.1, 1.0],
            metallicFactor=0.0, roughnessFactor=0.9)),
        dict(name="Leaves", alphaMode="MASK", alphaCutoff=0.5,
             doubleSided=True,
             pbrMetallicRoughness=dict(
                 baseColorFactor=[1.0, 1.0, 1.0, 1.0],
                 baseColorTexture=dict(index=0),
                 metallicFactor=0.0, roughnessFactor=0.8)),
    ]

    rng = np.random.RandomState(seed)
    nodes = [dict(mesh=0, name="ground")]
    tree_nodes = []
    for i in range(n_trees):
        x = float(rng.uniform(-90, 90))
        z = float(rng.uniform(-90, 90))
        s = float(rng.uniform(0.7, 1.5))
        a = float(rng.uniform(0, math.pi))
        nodes.append(dict(
            mesh=1, name=f"tree{i}",
            translation=[x, 0.0, z],
            rotation=[0.0, math.sin(a / 2), 0.0, math.cos(a / 2)],
            scale=[s, s, s],
            children=[],
        ))
        tree_nodes.append(len(nodes) - 1)
    for ti in tree_nodes:
        nodes.append(dict(mesh=2, name=f"leaves_of_{ti}"))
        nodes[ti]["children"] = [len(nodes) - 1]
    nodes.append(dict(name="light", translation=[50.0, 80.0, 30.0],
                      extensions=dict(KHR_lights_punctual=dict(light=0))))

    doc = dict(
        asset=dict(version="2.0", generator="tpu_pt make_gltf_assets"),
        scene=0,
        scenes=[dict(nodes=[0] + tree_nodes + [len(nodes) - 1])],
        nodes=nodes,
        meshes=meshes,
        materials=materials,
        textures=[dict(source=0, sampler=0)],
        samplers=[dict(wrapS=33071, wrapT=33071)],
        images=[dict(uri="leaf.png")],
        buffers=[dict(byteLength=len(blob),
                      uri="data:application/octet-stream;base64,"
                          + base64.b64encode(blob).decode())],
        bufferViews=buffer_views,
        accessors=accessors,
        extensions=dict(KHR_lights_punctual=dict(lights=[
            dict(type="point", color=[1.0, 0.98, 0.9], intensity=4.0)])),
        extensionsUsed=["KHR_lights_punctual"],
    )
    path = os.path.join(out_dir, filename)
    with open(path, "w") as f:
        json.dump(doc, f)
    print(f"wrote {path} ({n_trees} foliage tree instances)")


def cone(r=0.3, h=2.0, n=16):
    """Open cone (trunk): n side triangles + base fan."""
    verts = [(0.0, h, 0.0), (0.0, 0.0, 0.0)]
    for i in range(n):
        a = 2 * math.pi * i / n
        verts.append((r * math.cos(a), 0.0, r * math.sin(a)))
    idx = []
    for i in range(n):
        j = 2 + i
        k = 2 + (i + 1) % n
        idx += [0, k, j]          # side
        idx += [1, j, k]          # base
    v = np.array(verts, np.float32)
    norms = np.zeros_like(v)
    norms[:, 1] = 1.0
    uvs = np.zeros((v.shape[0], 2), np.float32)
    return v, norms, uvs, np.array(idx, np.uint16)


def build_forest(out_dir: str, n_trees=500, seed=9,
                 filename="forest.gltf"):
    """forest.gltf: ONE ~1k-tri tree mesh instanced ``n_trees`` times
    over a ground plane via node TRS — the reference's shared-mesh IAS
    workload (``sutil/Scene.cpp:1134-1213``). tpu_pt flattens instances
    to world space (scene/gltf.py module docstring); this asset
    exercises that flatten at forest scale (~0.5M world triangles)
    INSIDE the default guardrail, with the per-mesh decode cache
    keeping load time O(mesh + instances)."""
    os.makedirs(out_dir, exist_ok=True)
    meshes_np = [plane(240.0), cone(0.5, 4.0, 12), sphere(1.8, 16, 30)]
    blob = b""
    buffer_views = []
    accessors = []

    def add_accessor(arr, target, ctype, atype):
        nonlocal blob
        off = len(blob)
        blob += arr.tobytes()
        while len(blob) % 4:
            blob += b"\0"
        buffer_views.append(dict(buffer=0, byteOffset=off,
                                 byteLength=arr.nbytes, target=target))
        acc = dict(bufferView=len(buffer_views) - 1, componentType=ctype,
                   count=arr.shape[0], type=atype)
        if atype == "VEC3":
            acc["min"] = [float(x) for x in arr.min(axis=0)]
            acc["max"] = [float(x) for x in arr.max(axis=0)]
        accessors.append(acc)
        return len(accessors) - 1

    prim_sets = []
    for v, n, uv, idx in meshes_np:
        pos_a = add_accessor(v, 34962, 5126, "VEC3")
        nrm_a = add_accessor(n, 34962, 5126, "VEC3")
        uv_a = add_accessor(uv, 34962, 5126, "VEC2")
        idx_a = add_accessor(idx.reshape(-1, 1), 34963, 5123, "SCALAR")
        prim_sets.append(dict(
            attributes=dict(POSITION=pos_a, NORMAL=nrm_a, TEXCOORD_0=uv_a),
            indices=idx_a))
    meshes = [
        dict(name="ground", primitives=[dict(**prim_sets[0], material=0)]),
        dict(name="trunk", primitives=[dict(**prim_sets[1], material=1)]),
        dict(name="canopy", primitives=[dict(**prim_sets[2], material=2)]),
    ]
    # Canopy sits atop the trunk via a per-instance child node.
    materials = [
        dict(name="Ground", pbrMetallicRoughness=dict(
            baseColorFactor=[0.35, 0.32, 0.25, 1.0],
            metallicFactor=0.0, roughnessFactor=0.95)),
        dict(name="Bark", pbrMetallicRoughness=dict(
            baseColorFactor=[0.32, 0.2, 0.1, 1.0],
            metallicFactor=0.0, roughnessFactor=0.9)),
        dict(name="Leaves", pbrMetallicRoughness=dict(
            baseColorFactor=[0.12, 0.4, 0.12, 1.0],
            metallicFactor=0.0, roughnessFactor=0.8)),
    ]

    rng = np.random.RandomState(seed)
    nodes = [dict(mesh=0, name="ground")]
    # One canopy node parented under each tree instance would double the
    # node count; instead the canopy is its own mesh entry placed by the
    # same instance transform with a fixed local offset node.
    tree_nodes = []
    for i in range(n_trees):
        x = float(rng.uniform(-110, 110))
        z = float(rng.uniform(-110, 110))
        s = float(rng.uniform(0.6, 1.6))
        a = float(rng.uniform(0, math.pi))
        nodes.append(dict(
            mesh=1, name=f"tree{i}",
            translation=[x, 0.0, z],
            rotation=[0.0, math.sin(a / 2), 0.0, math.cos(a / 2)],
            scale=[s, s, s],
            children=[],
        ))
        tree_nodes.append(len(nodes) - 1)
    # Canopy offset child per tree (glTF nodes form a tree, so each
    # parent needs its own child node).
    for ti in tree_nodes:
        nodes.append(dict(mesh=2, name=f"canopy_of_{ti}",
                          translation=[0.0, 4.6, 0.0]))
        nodes[ti]["children"] = [len(nodes) - 1]
    nodes.append(dict(name="light", translation=[60.0, 90.0, 40.0],
                      extensions=dict(KHR_lights_punctual=dict(light=0))))

    doc = dict(
        asset=dict(version="2.0", generator="tpu_pt make_gltf_assets"),
        scene=0,
        scenes=[dict(nodes=[0] + tree_nodes + [len(nodes) - 1])],
        nodes=nodes,
        meshes=meshes,
        materials=materials,
        buffers=[dict(byteLength=len(blob),
                      uri="data:application/octet-stream;base64,"
                          + base64.b64encode(blob).decode())],
        bufferViews=buffer_views,
        accessors=accessors,
        extensions=dict(KHR_lights_punctual=dict(lights=[
            dict(type="point", color=[1.0, 0.98, 0.9], intensity=4.0)])),
        extensionsUsed=["KHR_lights_punctual"],
    )
    path = os.path.join(out_dir, filename)
    with open(path, "w") as f:
        json.dump(doc, f)
    print(f"wrote {path} ({n_trees} tree instances)")


def build_big(out_dir: str, n=224):
    """pbr_big.glb: a ~100k-tri displaced sphere (the big_mesh.obj bump
    recipe) over the checkered ground — the whitted/display pipeline's
    large-mesh benchmark scene (clustered intersection path + smooth
    normals + textures + point lights in one workload)."""
    os.makedirs(out_dir, exist_ok=True)
    checker_png(os.path.join(out_dir, "checker.png"))

    sv, sn, suv, sidx = sphere(1.0, n_lat=n, n_lon=n)
    bump = (1.0 + 0.08 * np.sin(9 * sv[:, 0]) * np.sin(7 * sv[:, 1])
            * np.sin(5 * sv[:, 2]))
    disp = sv * bump[:, None]
    # Smooth normals recomputed on the displaced surface (area-weighted
    # face-normal accumulation).
    idx3 = sidx.astype(np.int64).reshape(-1, 3)
    fn = np.cross(disp[idx3[:, 1]] - disp[idx3[:, 0]],
                  disp[idx3[:, 2]] - disp[idx3[:, 0]])
    vn = np.zeros_like(disp)
    for k in range(3):
        np.add.at(vn, idx3[:, k], fn)
    vn /= np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-20)
    disp = (disp * 1.6 + np.array([0.0, 1.9, 0.0])).astype(np.float32)

    gv, gn, guv, gidx = plane(14.0)

    blob = b""
    buffer_views = []
    accessors = []

    def add_accessor(arr, target, ctype, atype):
        nonlocal blob
        off = len(blob)
        blob += arr.tobytes()
        while len(blob) % 4:
            blob += b"\0"
        buffer_views.append(dict(buffer=0, byteOffset=off,
                                 byteLength=arr.nbytes, target=target))
        acc = dict(bufferView=len(buffer_views) - 1, componentType=ctype,
                   count=arr.shape[0], type=atype)
        if atype == "VEC3":
            acc["min"] = [float(x) for x in arr.min(axis=0)]
            acc["max"] = [float(x) for x in arr.max(axis=0)]
        accessors.append(acc)
        return len(accessors) - 1

    meshes = []
    for v, nrm, uv, idx, mat in (
            (gv, gn, guv, gidx.astype(np.uint32), 0),
            (disp, vn.astype(np.float32), suv, sidx.astype(np.uint32), 1)):
        pos_a = add_accessor(v.astype(np.float32), 34962, 5126, "VEC3")
        nrm_a = add_accessor(nrm.astype(np.float32), 34962, 5126, "VEC3")
        uv_a = add_accessor(uv.astype(np.float32), 34962, 5126, "VEC2")
        idx_a = add_accessor(idx.reshape(-1, 1), 34963, 5125, "SCALAR")
        meshes.append(dict(primitives=[dict(
            attributes=dict(POSITION=pos_a, NORMAL=nrm_a, TEXCOORD_0=uv_a),
            indices=idx_a, material=mat)]))

    doc = dict(
        asset=dict(version="2.0", generator="tpu_pt make_gltf_assets"),
        scene=0,
        scenes=[dict(nodes=[0, 1, 2, 3])],
        nodes=[dict(mesh=0), dict(mesh=1),
               dict(translation=[5.0, 7.0, 4.0],
                    extensions=dict(KHR_lights_punctual=dict(light=0))),
               dict(translation=[-4.0, 5.0, -3.0],
                    extensions=dict(KHR_lights_punctual=dict(light=1)))],
        meshes=meshes,
        materials=[
            dict(name="Ground", pbrMetallicRoughness=dict(
                baseColorFactor=[1, 1, 1, 1],
                baseColorTexture=dict(index=0),
                metallicFactor=0.0, roughnessFactor=0.9)),
            dict(name="Rock", pbrMetallicRoughness=dict(
                baseColorFactor=[0.7, 0.55, 0.4, 1.0],
                metallicFactor=0.1, roughnessFactor=0.6)),
        ],
        textures=[dict(source=0)],
        images=[dict(uri="checker.png")],
        samplers=[dict(magFilter=9729, minFilter=9729,
                       wrapS=10497, wrapT=10497)],
        buffers=[dict(byteLength=len(blob))],
        bufferViews=buffer_views,
        accessors=accessors,
        extensions=dict(KHR_lights_punctual=dict(lights=[
            dict(type="point", color=[1.0, 0.95, 0.9], intensity=4.0),
            dict(type="point", color=[0.7, 0.8, 1.0], intensity=2.0)])),
        extensionsUsed=["KHR_lights_punctual"],
    )
    js = json.dumps(doc).encode()
    while len(js) % 4:
        js += b" "
    bin_chunk = blob
    while len(bin_chunk) % 4:
        bin_chunk += b"\0"
    glb = (b"glTF" + struct.pack("<II", 2, 12 + 8 + len(js) + 8
                                 + len(bin_chunk))
           + struct.pack("<II", len(js), 0x4E4F534A) + js
           + struct.pack("<II", len(bin_chunk), 0x004E4942) + bin_chunk)
    path = os.path.join(out_dir, "pbr_big.glb")
    with open(path, "wb") as f:
        f.write(glb)
    print(f"wrote {path} ({2 * n * n} sphere tris)")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = args[0] if args else os.path.join(
        os.path.dirname(__file__), "..", "assets")
    if "--big" in sys.argv:
        build_big(os.path.abspath(out))
    elif "--forest" in sys.argv:
        build_forest(os.path.abspath(out))
    elif "--foliage" in sys.argv:
        build_foliage(os.path.abspath(out))
    else:
        build(os.path.abspath(out))
