"""Wavefront OBJ utilities: free-surface visualization mesh export and mesh
mass properties.

* `write_free_surface_obj` reproduces the reference's free-surface strip mesh
  (a 20 m-wide ribbon along -x whose vertex heights are the precomputed
  eta(t) series; wave_types.cpp:366-428, 846-856).
* `read_obj` / mass properties back the reference's reliance on
  ChBodyEasyMesh (mesh-derived volume/COM/inertia). A native C++
  implementation (native/meshprops.cpp) is used when built; the numpy
  fallback implements the same divergence-theorem algorithm.
"""

from __future__ import annotations

import ctypes
import os
import time

import numpy as np

_NATIVE = None


def _native_lib():
    global _NATIVE
    if _NATIVE is None:
        native_dir = os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", "native")
        )
        path = os.path.join(native_dir, "libmeshprops.so")
        if not os.path.exists(path):
            # self-build from source when a toolchain is available
            import subprocess

            try:
                subprocess.run(["make", "-C", native_dir], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                pass
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            lib.mesh_mass_properties.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.mesh_mass_properties.restype = ctypes.c_int
            _NATIVE = lib
        else:
            _NATIVE = False
    return _NATIVE or None


def create_free_surface_points(eta: np.ndarray, t_vec: np.ndarray) -> np.ndarray:
    """Strip vertices: for each time sample a pair of points at y = -10/+10,
    x = -t, z = eta (wave_types.cpp:366-379)."""
    n = len(t_vec)
    pts = np.zeros((2 * n, 3))
    pts[0::2, 0] = -np.asarray(t_vec)
    pts[1::2, 0] = -np.asarray(t_vec)
    pts[0::2, 1] = -10.0
    pts[1::2, 1] = 10.0
    pts[0::2, 2] = eta[:n]
    pts[1::2, 2] = eta[:n]
    return pts


def create_free_surface_triangles(n_points: int) -> np.ndarray:
    """Triangulation of the strip (wave_types.cpp:381-390)."""
    tris = []
    for i in range(n_points // 2 - 1):
        tris.append([2 * i, 2 * i + 1, 2 * i + 3])
        tris.append([2 * i, 2 * i + 3, 2 * i + 2])
    return np.asarray(tris, dtype=np.int64)


def write_obj(path: str, points: np.ndarray, triangles: np.ndarray,
              header: str = "Wavefront OBJ file exported by hydrochrono-tpu"):
    """OBJ writer matching the reference format (wave_types.cpp:392-428)."""
    with open(path, "w") as out:
        out.write(f"# {header}\n")
        out.write(f"# File Created: {time.strftime('%Y-%m-%d %H:%M:%S')}\n\n")
        out.write(f"# Vertices: {len(points)}\n\n")
        for p in points:
            out.write(f"v {p[0]:14.6f} {p[1]:14.6f} {p[2]:14.6f}\n")
        out.write(f"\n# Faces: {len(triangles)}\n\n")
        for tri in triangles:
            out.write(f"f {tri[0] + 1:9d}{tri[1] + 1:9d}{tri[2] + 1:9d}\n")
    return path


def write_free_surface_obj(path: str, eta: np.ndarray, dt: float, duration: float):
    """Export the eta(t) ribbon mesh (wave_types.cpp:846-856)."""
    n = int(np.ceil(duration / dt))
    t_vec = np.linspace(0.0, n * dt, n + 1)
    pts = create_free_surface_points(np.asarray(eta), t_vec)
    tris = create_free_surface_triangles(len(pts))
    return write_obj(path, pts, tris)


def read_obj(path: str):
    """Minimal OBJ reader: vertices + triangulated faces (fan for polygons)."""
    verts, faces = [], []
    with open(path) as fh:
        for line in fh:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:]]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, dtype=np.float64), np.asarray(faces, dtype=np.int64)


def mesh_mass_properties(vertices: np.ndarray, faces: np.ndarray, density: float = 1.0):
    """(volume, mass, com, inertia about COM) of a closed triangle mesh.

    Divergence-theorem accumulation over triangles (the same quantities
    Chrono's ChBodyEasyMesh computes for the reference demos). Uses the
    native C++ kernel when available, else numpy.
    """
    lib = _native_lib()
    if lib is not None:
        v = np.ascontiguousarray(vertices, dtype=np.float64)
        f = np.ascontiguousarray(faces, dtype=np.int32)
        out = np.zeros(13)
        rc = lib.mesh_mass_properties(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(f),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if rc == 0:
            volume = out[0]
            com = out[1:4]
            inertia_unit = out[4:13].reshape(3, 3)
            return volume, volume * density, com, inertia_unit * density

    # numpy fallback: signed tetrahedra against the origin
    a = vertices[faces[:, 0]]
    b = vertices[faces[:, 1]]
    c = vertices[faces[:, 2]]
    cross = np.cross(b, c)
    vol6 = np.einsum("ij,ij->i", a, cross)  # 6 * signed tet volume
    volume = vol6.sum() / 6.0
    # tet centroid (a+b+c)/4 weighted by tet volume vol6/6
    com = ((a + b + c) * vol6[:, None]).sum(axis=0) / (24.0 * volume)

    # inertia via canonical tetrahedron integrals
    inertia = np.zeros((3, 3))
    for i in range(len(faces)):
        p = np.stack([a[i], b[i], c[i]])
        v6 = vol6[i]
        # covariance of a tet with vertices (0, p0, p1, p2)
        Csum = np.zeros((3, 3))
        for j in range(3):
            for k in range(3):
                s = 0.0
                for m in range(3):
                    for nn in range(3):
                        s += p[m, j] * p[nn, k] * (2.0 if m == nn else 1.0)
                Csum[j, k] = s
        C = v6 / 120.0 * Csum
        inertia += np.trace(C) * np.eye(3) - C
    # shift to COM
    m_unit = volume
    r = com
    inertia -= m_unit * ((r @ r) * np.eye(3) - np.outer(r, r))
    return volume, volume * density, com, inertia * density
