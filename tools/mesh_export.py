#!/usr/bin/env python3
"""OBJ-sequence export of a results.h5 trajectory: 3D mesh visualization.

Closes the reference's remaining visualization role (the interactive
Irrlicht view, src/gui/guihelper.cpp:41-120, and the free-surface mesh
generator SetUpWaveMesh, src/wave_types.cpp:366-428,846-856) for the
headless TPU workflow: every exported frame is a standalone Wavefront OBJ
containing the body meshes posed from the recorded trajectory plus a
free-surface grid displaced by the exact wave field the run used (the
exporter stores spectrum/phases/wavenumbers in the H5 — WaveField
.from_results_h5). The sequence loads directly into Blender
("Import OBJ as animation" / mesh-sequence add-ons), MeshLab, or ParaView.

Usage:
    python tools/mesh_export.py results.irregular.h5 --out frames/ \
        --mesh-dir <case>/inputs --stride 20 --extent 40 --grid 48

Body meshes come from the model YAML's `visualization: model_file:` entries
(the YAML text is embedded in the H5; paths resolve against --mesh-dir,
then the H5's directory). Bodies without a mesh render as octahedron
markers scaled by --marker so the tool degrades gracefully.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# offline rendering is a CPU job: force CPU even though the axon site hook
# pre-selects the TPU platform (env var alone loses — DEVNOTES.md)
try:
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover
    pass

import numpy as np


# ---------------------------------------------------------------------------
# OBJ I/O
# ---------------------------------------------------------------------------

def load_obj(path):
    """Minimal OBJ reader: vertices + polygonal faces (1-based -> 0-based)."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                verts.append([float(t[1]), float(t[2]), float(t[3])])
            elif t[0] == "f":
                faces.append([int(tok.split("/")[0]) - 1 for tok in t[1:]])
    return np.asarray(verts, np.float64), faces


def octahedron(scale=1.0):
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0, 0, -1]], np.float64) * scale
    f = [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]]
    return v, f


def quat_rotate(q, v):
    """Rotate [N,3] vertices by quaternion (w,x,y,z)."""
    w, x, y, z = q
    u = np.array([x, y, z])
    t = 2.0 * np.cross(u, v)
    return v + w * t + np.cross(u, t)


# ---------------------------------------------------------------------------
# model YAML mesh discovery (tolerant scan of the embedded text)
# ---------------------------------------------------------------------------

def uv_sphere(radius, nu=24, nv=16):
    verts, faces = [], []
    for i in range(nv + 1):
        th = np.pi * i / nv
        for j in range(nu):
            ph = 2 * np.pi * j / nu
            verts.append([radius * np.sin(th) * np.cos(ph),
                          radius * np.sin(th) * np.sin(ph),
                          radius * np.cos(th)])
    for i in range(nv):
        for j in range(nu):
            a = i * nu + j
            b = i * nu + (j + 1) % nu
            faces.append([a, b, b + nu])
            faces.append([a, b + nu, a + nu])
    return np.asarray(verts, np.float64), faces


def box_mesh(sx, sy, sz):
    hx, hy, hz = sx / 2, sy / 2, sz / 2
    v = np.array([[sgx, sgy, sgz] for sgx in (-hx, hx)
                  for sgy in (-hy, hy) for sgz in (-hz, hz)], np.float64)
    f = [[0, 1, 3, 2], [4, 6, 7, 5], [0, 4, 5, 1],
         [2, 3, 7, 6], [0, 2, 6, 4], [1, 5, 7, 3]]
    return v, f


def cylinder_mesh(radius, height, nu=24):
    verts, faces = [], []
    for z in (-height / 2, height / 2):
        for j in range(nu):
            ph = 2 * np.pi * j / nu
            verts.append([radius * np.cos(ph), radius * np.sin(ph), z])
    for j in range(nu):
        a, b = j, (j + 1) % nu
        faces.append([a, b, b + nu, a + nu])
    verts.append([0.0, 0.0, -height / 2])
    verts.append([0.0, 0.0, height / 2])
    for j in range(nu):
        a, b = j, (j + 1) % nu
        faces.append([b, a, 2 * nu])
        faces.append([a + nu, b + nu, 2 * nu + 1])
    return np.asarray(verts, np.float64), faces


def find_geometry(model_yaml_text, body_names, search_dirs):
    """name -> (verts, faces) or None. Scans the embedded model YAML for
    per-body `visualization:` blocks: mesh model_file entries AND the
    Chrono primitive shapes (SPHERE/BOX/CYLINDER with radius/size/length,
    demos/yaml/* convention), offset by the shape's `location`."""
    out = {n: None for n in body_names}
    cur = None
    shape = None  # pending primitive: {type, radius, ...}

    def flush():
        nonlocal shape
        if cur is None or shape is None or out.get(cur) is not None:
            shape = None
            return
        t = shape.get("type", "").upper()
        geo = None
        if t == "SPHERE" and "radius" in shape:
            geo = uv_sphere(shape["radius"])
        elif t == "BOX" and len(shape.get("size", ())) == 3:
            geo = box_mesh(*shape["size"])
        elif t in ("CYLINDER", "CYL") and "radius" in shape:
            geo = cylinder_mesh(shape["radius"],
                                shape.get("length", shape.get("height", 1.0)))
        if geo is not None:
            v, fc = geo
            loc = shape.get("location")
            if loc is not None and len(loc) == 3:
                v = v + np.asarray(loc)
            out[cur] = (v, fc)
        shape = None

    for line in model_yaml_text.splitlines():
        m = re.search(r"^\s*-?\s*name\s*:\s*[\"']?([\w.-]+)", line)
        if m and m.group(1) in out:
            flush()
            cur = m.group(1)
            continue
        m = re.search(r"(model_file|mesh|filename)\s*:\s*[\"']?([^\s\"']+)",
                      line)
        if m and cur is not None and out[cur] is None and \
                m.group(2).lower().endswith(".obj"):
            for d in search_dirs:
                for p in (os.path.join(d, m.group(2)),
                          os.path.join(d, os.path.basename(m.group(2)))):
                    if os.path.exists(p):
                        out[cur] = load_obj(p)
                        break
                if out[cur] is not None:
                    break
            continue
        m = re.search(r"type\s*:\s*[\"']?(\w+)", line)
        if m and m.group(1).upper() in ("SPHERE", "BOX", "CYLINDER", "CYL"):
            flush()
            shape = {"type": m.group(1)}
            continue
        if shape is not None:
            m = re.search(r"(radius|length|height)\s*:\s*([0-9.eE+-]+)", line)
            if m:
                shape[m.group(1)] = float(m.group(2))
                continue
            m = re.search(r"(size|location)\s*:\s*\[([^\]]+)\]", line)
            if m:
                shape[m.group(1)] = [float(x) for x in
                                     m.group(2).split(",")]
                continue
    flush()
    return out


# ---------------------------------------------------------------------------
# frame writer
# ---------------------------------------------------------------------------

def write_frame(path, bodies, surface):
    """bodies: [(name, verts [N,3], faces)], surface: (verts, faces) or None."""
    with open(path, "w") as f:
        f.write("# hydrochrono-tpu mesh_export frame\n")
        off = 1
        for name, v, faces in bodies:
            f.write(f"o {name}\n")
            for p in v:
                f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
            for face in faces:
                f.write("f " + " ".join(str(i + off) for i in face) + "\n")
            off += len(v)
        if surface is not None:
            sv, sf = surface
            f.write("o free_surface\n")
            for p in sv:
                f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
            for face in sf:
                f.write("f " + " ".join(str(i + off) for i in face) + "\n")


def surface_grid(extent, n):
    xs = np.linspace(-extent, extent, n)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel(), np.zeros(X.size)], axis=-1)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + n, a + n + 1])
            faces.append([a, a + n + 1, a + 1])
    return pts, faces


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("results", help="results.*.h5 produced by the runner")
    ap.add_argument("--out", default="frames", help="output directory")
    ap.add_argument("--stride", type=int, default=25,
                    help="export every Nth recorded step")
    ap.add_argument("--max-frames", type=int, default=400)
    ap.add_argument("--mesh-dir", action="append", default=[],
                    help="directories to resolve visualization meshes in")
    ap.add_argument("--extent", type=float, default=30.0,
                    help="free-surface half-extent [m] (0 disables)")
    ap.add_argument("--grid", type=int, default=40,
                    help="free-surface grid resolution per side")
    ap.add_argument("--marker", type=float, default=1.0,
                    help="octahedron marker scale for mesh-less bodies")
    args = ap.parse_args(argv)

    import h5py

    from hydrochrono_tpu.physics.wavefield import WaveField

    with h5py.File(args.results, "r") as f:
        times = f["/results/time/time"][:]
        names = list(f["/results/model/bodies"])
        pos = {n: f[f"/results/model/bodies/{n}/position"][:] for n in names}
        quat = {n: f[f"/results/model/bodies/{n}/orientation"][:]
                for n in names}
        model_yaml = ""
        if "/meta/config/model_yaml" in f:
            raw = f["/meta/config/model_yaml"][()]
            model_yaml = raw.decode() if isinstance(raw, bytes) else str(raw)

    try:
        field = WaveField.from_results_h5(args.results)
    except Exception as exc:  # noqa: BLE001 - surface is optional
        print(f"# no wave field in H5 ({exc}); flat surface", file=sys.stderr)
        field = None

    search = list(args.mesh_dir) + [os.path.dirname(os.path.abspath(
        args.results))]
    found = find_geometry(model_yaml, names, search)
    geo = {}
    for n in names:
        if found.get(n) is not None:
            geo[n] = found[n]
            print(f"# {n}: visualization geometry ({len(geo[n][0])} verts)")
        else:
            geo[n] = octahedron(args.marker)
            print(f"# {n}: no mesh/shape found -> octahedron marker")

    sverts = sfaces = None
    if args.extent > 0:
        sverts, sfaces = surface_grid(args.extent, args.grid)

    os.makedirs(args.out, exist_ok=True)
    idx = range(0, len(times), max(1, args.stride))
    idx = list(idx)[: args.max_frames]
    for fi, i in enumerate(idx):
        t = float(times[i])
        bodies = []
        for n in names:
            v, faces = geo[n]
            p = pos[n][i]
            q = quat[n][i]  # wxyz
            # mesh vertices are body-frame about the recorded reference
            # point (design convention: geometry modeled about the cg)
            bodies.append((n, quat_rotate(q, v) + p, faces))
        surface = None
        if sverts is not None:
            if field is not None and field.kind != "still":
                eta = np.asarray(field.eta(sverts, t))
            else:
                eta = np.zeros(len(sverts))
            sv = sverts.copy()
            sv[:, 2] = eta
            surface = (sv, sfaces)
        write_frame(os.path.join(args.out, f"frame_{fi:05d}.obj"),
                    bodies, surface)
    print(f"wrote {len(idx)} frames to {args.out}/ "
          f"(t = {times[idx[0]]:.2f}..{times[idx[-1]]:.2f} s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
