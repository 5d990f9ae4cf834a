"""Generates the low-poly ``duck.obj`` used by 06_spawning_objects.py.

The reference example spawns PyBullet's stock duck mesh
(/root/reference/examples/core/06_spawning_objects.py); that asset isn't
redistributable here, so this script builds a comparable watertight
duck-ish mesh (ellipsoid body + sphere head + box beak) as plain triangle
soup. Deterministic — the committed OBJ is its exact output:

    python examples/assets/gen_duck_obj.py
"""

import math
import os

import numpy as np


def uv_sphere(center, radii, n_lat=9, n_lon=12):
    """Watertight UV sphere (ellipsoid): returns (verts, tris)."""
    cx, cy, cz = center
    rx, ry, rz = radii
    verts = [(cx, cy, cz + rz)]  # north pole
    for i in range(1, n_lat):
        th = math.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * math.pi * j / n_lon
            verts.append(
                (
                    cx + rx * math.sin(th) * math.cos(ph),
                    cy + ry * math.sin(th) * math.sin(ph),
                    cz + rz * math.cos(th),
                )
            )
    verts.append((cx, cy, cz - rz))  # south pole
    tris = []
    for j in range(n_lon):
        tris.append((0, 1 + j, 1 + (j + 1) % n_lon))
    for i in range(n_lat - 2):
        a = 1 + i * n_lon
        b = 1 + (i + 1) * n_lon
        for j in range(n_lon):
            j2 = (j + 1) % n_lon
            tris.append((a + j, b + j, b + j2))
            tris.append((a + j, b + j2, a + j2))
    south = len(verts) - 1
    base = 1 + (n_lat - 2) * n_lon
    for j in range(n_lon):
        tris.append((south, base + (j + 1) % n_lon, base + j))
    return np.asarray(verts), np.asarray(tris)


def box(center, half):
    cx, cy, cz = center
    hx, hy, hz = half
    v = np.array(
        [
            (cx + sx * hx, cy + sy * hy, cz + sz * hz)
            for sx in (-1, 1)
            for sy in (-1, 1)
            for sz in (-1, 1)
        ]
    )
    t = np.array(
        [
            (0, 1, 3), (0, 3, 2),  # -x
            (4, 6, 7), (4, 7, 5),  # +x
            (0, 4, 5), (0, 5, 1),  # -y
            (2, 3, 7), (2, 7, 6),  # +y
            (0, 2, 6), (0, 6, 4),  # -z
            (1, 5, 7), (1, 7, 3),  # +z
        ]
    )
    return v, t


def main():
    parts = [
        uv_sphere((0.0, 0.0, 0.25), (0.45, 0.30, 0.25)),  # body
        uv_sphere((0.32, 0.0, 0.62), (0.16, 0.14, 0.16)),  # head
        box((0.52, 0.0, 0.58), (0.10, 0.05, 0.03)),  # beak
        box((-0.42, 0.0, 0.38), (0.10, 0.08, 0.05)),  # tail
    ]
    lines = ["# procedural low-poly duck (gen_duck_obj.py)"]
    offset = 0
    all_faces = []
    for v, t in parts:
        for x, y, z in v:
            lines.append(f"v {x:.5f} {y:.5f} {z:.5f}")
        all_faces.extend((a + offset, b + offset, c + offset) for a, b, c in t)
        offset += len(v)
    for a, b, c in all_faces:
        lines.append(f"f {a + 1} {b + 1} {c + 1}")
    out = os.path.join(os.path.dirname(__file__), "duck.obj")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"{out}: {offset} verts, {len(all_faces)} tris")


if __name__ == "__main__":
    main()
