"""Generate a parametric aneurysm vessel as STL parts for the aneurysm
example.

The reference downloads five STL files (inlet/outlet disks, noslip wall,
interior closed surface, mid-vessel integral plane —
``/root/reference/examples/aneurysm/aneurysm.py:26-30``). With zero egress
this builds the equivalent geometry in-repo: a curved tube of radius R with
a spherical aneurysm bulge at mid-length, written as binary STLs:

  aneurysm_inlet.stl     start-cap disk
  aneurysm_outlet.stl    end-cap disk
  aneurysm_noslip.stl    vessel wall (tube+bulge lateral surface)
  aneurysm_closed.stl    watertight wall+caps (interior sampling)
  aneurysm_integral.stl  cross-section disk at 3/4 length

Usage: python tools/gen_aneurysm_stl.py [--out dataset/aneurysm]
"""

from __future__ import annotations

import argparse
import os
import struct

import numpy as np

R = 0.6          # vessel radius
LENGTH = 8.0     # centerline length along z
BULGE_R = 1.25   # aneurysm bulge radius
N_THETA = 48
N_Z = 96


def write_stl(path: str, tris: np.ndarray) -> None:
    """tris: (T, 3, 3) float32 vertices (outward orientation)."""
    tris = np.asarray(tris, np.float32)
    n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    n /= np.linalg.norm(n, axis=1, keepdims=True) + 1e-12
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for i in range(len(tris)):
            f.write(struct.pack("<3f", *n[i]))
            for v in tris[i]:
                f.write(struct.pack("<3f", *v))
            f.write(struct.pack("<H", 0))


def _radius_profile(z: np.ndarray) -> np.ndarray:
    """Tube radius with a smooth spherical-cap bulge at mid-length."""
    zc = LENGTH / 2.0
    w = BULGE_R * 0.9
    bump = np.exp(-((z - zc) ** 2) / (2 * (w / 2.2) ** 2))
    return R + (BULGE_R - R) * bump


def _centerline(z: np.ndarray) -> np.ndarray:
    """Slightly curved centerline in the x-z plane."""
    x = 0.35 * np.sin(np.pi * z / LENGTH)
    return np.stack([x, np.zeros_like(z), z], axis=-1)


def _ring(z: float) -> np.ndarray:
    th = np.linspace(0, 2 * np.pi, N_THETA, endpoint=False)
    c = _centerline(np.array([z]))[0]
    r = _radius_profile(np.array([z]))[0]
    return np.stack([c[0] + r * np.cos(th), c[1] + r * np.sin(th),
                     np.full_like(th, z)], axis=-1)


def lateral_surface() -> np.ndarray:
    zs = np.linspace(0.0, LENGTH, N_Z)
    rings = np.stack([_ring(z) for z in zs])  # (N_Z, N_THETA, 3)
    tris = []
    for i in range(N_Z - 1):
        a, b = rings[i], rings[i + 1]
        for j in range(N_THETA):
            k = (j + 1) % N_THETA
            tris.append([a[j], b[j], b[k]])
            tris.append([a[j], b[k], a[k]])
    return np.asarray(tris, np.float32)


def cap(z: float, flip: bool) -> np.ndarray:
    ring = _ring(z)
    c = _centerline(np.array([z]))[0]
    center = np.array([c[0], c[1], z], np.float32)
    tris = []
    for j in range(N_THETA):
        k = (j + 1) % N_THETA
        t = [center, ring[j], ring[k]]
        if flip:
            t = [center, ring[k], ring[j]]
        tris.append(t)
    return np.asarray(tris, np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "dataset", "aneurysm"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    wall = lateral_surface()
    inlet = cap(0.0, flip=True)      # normal -z (into the vessel flow is +z)
    outlet = cap(LENGTH, flip=False)  # normal +z
    integral = cap(0.75 * LENGTH, flip=False)

    write_stl(os.path.join(args.out, "aneurysm_noslip.stl"), wall)
    write_stl(os.path.join(args.out, "aneurysm_inlet.stl"), inlet)
    write_stl(os.path.join(args.out, "aneurysm_outlet.stl"), outlet)
    write_stl(os.path.join(args.out, "aneurysm_integral.stl"), integral)
    write_stl(os.path.join(args.out, "aneurysm_closed.stl"),
              np.concatenate([wall, inlet, outlet]))
    areas = {
        "inlet": float(np.pi * _radius_profile(np.array([0.0]))[0] ** 2),
        "outlet": float(np.pi * _radius_profile(np.array([LENGTH]))[0] ** 2),
    }
    print(f"wrote 5 STLs to {args.out}; inlet area {areas['inlet']:.4f}, "
          f"outlet area {areas['outlet']:.4f}")


if __name__ == "__main__":
    main()
