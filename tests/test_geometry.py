"""Geometry sampling invariants (reference doctests in ppsci/geometry/*)."""

import numpy as np
import pytest

import paddlescience_tpu as psci

g = psci.geometry


def test_interval():
    itv = g.Interval(0.0, 2.0)
    s = itv.sample_interior(32)
    assert s["x"].shape == (32, 1) and (s["sdf"] >= 0).all()
    b = itv.sample_boundary(2)
    np.testing.assert_allclose(sorted(b["x"].flatten()), [0.0, 2.0])
    np.testing.assert_allclose(np.abs(b["normal_x"]).flatten(), 1.0)


def test_rectangle_sdf_derivatives():
    rect = g.Rectangle((0, 0), (2, 1))
    s = rect.sample_interior(64, compute_sdf_derivatives=True)
    assert {"x", "y", "sdf", "sdf__x", "sdf__y"} <= set(s)
    # interior sdf positive, gradient magnitude <= ~1
    assert (s["sdf"] > 0).all()
    gmag = np.sqrt(s["sdf__x"] ** 2 + s["sdf__y"] ** 2)
    assert (gmag <= 1.2).all()


def test_boundary_normals_unit():
    for geom in [g.Rectangle((0, 0), (1, 1)), g.Disk((0, 0), 1.0), g.Cuboid((0, 0, 0), (1, 1, 1)), g.Sphere((0, 0, 0), 1.0)]:
        b = geom.sample_boundary(16)
        n = np.concatenate([b[f"normal_{k}"] for k in geom.dim_keys], axis=1)
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)


def test_csg_union_difference_intersection():
    r1 = g.Rectangle((0, 0), (1, 1))
    r2 = g.Rectangle((0.5, 0), (1.5, 1))
    for dom, pred in [
        (r1 | r2, lambda p: (p[:, 0] >= 0) & (p[:, 0] <= 1.5)),
        (r1 - r2, lambda p: p[:, 0] <= 0.5 + 1e-6),
        (r1 & r2, lambda p: (p[:, 0] >= 0.5 - 1e-6) & (p[:, 0] <= 1.0 + 1e-6)),
    ]:
        s = dom.sample_interior(64)
        pts = np.concatenate([s["x"], s["y"]], 1)
        assert pred(pts).all()


def test_triangle_polygon():
    tri = g.Triangle((0, 0), (2, 0), (0, 2))
    s = tri.sample_interior(64)
    assert (s["x"] + s["y"] <= 2 + 1e-5).all()
    poly = g.Polygon([(0, 0), (1, 0), (1, 1), (0, 1)])
    s = poly.sample_interior(32)
    assert (s["sdf"] >= 0).all()
    b = poly.sample_boundary(16)
    on = poly.on_boundary(np.concatenate([b["x"], b["y"]], 1))
    assert on.all()


def test_timedomain_product():
    tg = g.TimeXGeometry(g.TimeDomain(0, 1, time_step=0.25), g.Interval(0, 1))
    assert tg.dim_keys == ("t", "x")
    s = tg.sample_interior(16)
    assert s["t"].shape == (16, 1)
    init = tg.sample_initial_interior(8)
    np.testing.assert_allclose(init["t"], 0.0)
    b = tg.sample_boundary(8)
    assert "normal_x" in b and "normal_t" not in b


def test_periodic_point():
    rect = g.Rectangle((0, 0), (1, 1))
    b = rect.sample_boundary(16)
    x = {k: b[k] for k in ("x", "y")}
    y = rect.periodic_point(x, 0)
    on_edge = np.isclose(x["x"], 0) | np.isclose(x["x"], 1)
    flipped = np.isclose(y["x"], 1 - x["x"])
    assert (flipped | ~on_edge).all()


def test_pointcloud():
    pts = {"x": np.random.rand(32, 1).astype(np.float32), "y": np.random.rand(32, 1).astype(np.float32)}
    pc = g.PointCloud(pts, ("x", "y"))
    r = pc.random_points(16)
    assert r.shape == (16, 2)


def test_samplers():
    from paddlescience_tpu.geometry import sampler

    for method in ("pseudo", "LHS", "Halton", "Hammersley", "Sobol"):
        s = sampler.sample(16, 3, method)
        assert s.shape == (16, 3) and (s >= 0).all() and (s <= 1).all()


def test_impossible_criteria_raises():
    rect = g.Rectangle((0, 0), (1, 1))
    with pytest.raises(ValueError):
        rect.sample_interior(4, criteria=lambda x, y: x > 5)


def test_mesh_cube():
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.float32
    )
    f = np.array(
        [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4], [1, 2, 6], [1, 6, 5],
         [2, 3, 7], [2, 7, 6], [3, 0, 4], [3, 4, 7]]
    )
    mesh = g.Mesh((v, f))
    np.testing.assert_allclose(mesh.area, 6.0, rtol=1e-6)
    assert list(mesh.is_inside(np.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5]]))) == [True, False]
    s = mesh.sample_interior(64)
    assert (s["sdf"] >= 0).all()
    b = mesh.sample_boundary(32)
    assert "area" in b
    n = np.concatenate([b[f"normal_{k}"] for k in "xyz"], 1)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
    sdf = mesh.sdf_func(np.array([[0.5, 0.5, 0.5], [2.0, 0.5, 0.5]]))
    np.testing.assert_allclose(sdf.flatten(), [-0.5, 1.0], atol=1e-6)


def test_mesh_interior_covers_noncubic_bbox():
    """Regression: random_points once sampled every axis from the x-range,
    so elongated meshes (tube along z in [0, 2]) only got z<0.45 points."""
    import os
    import struct

    # slim box 0.4 x 0.4 x 2.0 as binary STL
    lo_xy, hi_xy, hz = -0.2, 0.2, 2.0
    corners = np.array([[x, y, z] for z in (0, hz) for y in (lo_xy, hi_xy) for x in (lo_xy, hi_xy)])
    quads = [  # (a,b,c,d) with outward normals
        (0, 2, 3, 1), (4, 5, 7, 6), (0, 1, 5, 4), (2, 6, 7, 3), (0, 4, 6, 2), (1, 3, 7, 5)]
    tris = []
    for a, b, c, d in quads:
        tris.append((corners[a], corners[b], corners[c]))
        tris.append((corners[a], corners[c], corners[d]))
    path = "/tmp/test_slim_box.stl"
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for a, b, c in tris:
            n = np.cross(b - a, c - a)
            n = n / (np.linalg.norm(n) + 1e-12)
            f.write(struct.pack("<3f", *n))
            for v in (a, b, c):
                f.write(struct.pack("<3f", *v))
            f.write(struct.pack("<H", 0))

    mesh = psci.geometry.Mesh.from_stl(path)
    pts = mesh.random_points(256)
    assert pts[:, 2].max() > 1.5, f"z coverage broken: max z {pts[:, 2].max()}"
    assert pts[:, 2].min() < 0.5
    # every sampled point is inside -> sdf negative
    assert (mesh.sdf_func(pts) < 0).all()
    # boundary points sit on the surface
    b = mesh.random_boundary_points(64)
    assert np.abs(mesh.sdf_func(b)).max() < 1e-5
    os.remove(path)


def test_native_mesh_kernels_parity():
    """C++ mesh kernels (ctypes) match the numpy fallback bit-for-bit-ish."""
    from paddlescience_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native mesh kernels not built (no g++)")

    # reuse a simple tetra mesh
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]])
    mesh = psci.geometry.Mesh((verts, faces))
    pts = np.random.default_rng(0).uniform(-0.2, 1.0, (512, 3))

    d_native = mesh._unsigned_distance(pts)
    in_native = mesh.is_inside(pts)
    lib = native.mesh_lib
    try:
        native.mesh_lib = None  # force numpy fallback
        d_numpy = mesh._unsigned_distance(pts)
        in_numpy = mesh.is_inside(pts)
    finally:
        native.mesh_lib = lib
    np.testing.assert_allclose(d_native, d_numpy, rtol=1e-12, atol=1e-12)
    assert (in_native == in_numpy).all()
