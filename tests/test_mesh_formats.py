"""PLY / OBJ / STL readers and writers (io/mesh_formats.py).

Roundtrip-based: geometry written in each format reloads bitwise- (or
f32-) equal, and the bundled 5k bone mesh survives a format conversion
with its point scalar (PLY) or geometry (OBJ/STL) intact.
"""

import numpy as np
import pytest

from pyfocusr_tpu import load_mesh, save_mesh
from pyfocusr_tpu.io import mesh_formats as mf

from conftest import DATA, _require_data


@pytest.fixture(scope="module")
def small():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(37, 3)).astype(np.float64)
    tris = np.asarray(
        [[i, (i + 1) % 37, (i + 5) % 37] for i in range(0, 37, 2)], np.int32
    )
    data = {"thickness": rng.uniform(0, 2, 37)}
    return pts, tris, data


class TestPly:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, small, tmp_path, binary):
        pts, tris, data = small
        p = str(tmp_path / "m.ply")
        mf.write_ply(p, pts, tris, data, binary=binary)
        pts2, tris2, data2 = mf.read_ply(p)
        np.testing.assert_allclose(pts2, pts, atol=1e-6)
        np.testing.assert_array_equal(tris2, tris)
        np.testing.assert_allclose(data2["thickness"], data["thickness"], atol=1e-6)

    def test_quad_fan_triangulation(self, tmp_path):
        pts = np.asarray(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64
        )
        p = str(tmp_path / "quad.ply")
        with open(p, "w") as fh:
            fh.write(
                "ply\nformat ascii 1.0\nelement vertex 4\n"
                "property float x\nproperty float y\nproperty float z\n"
                "element face 1\nproperty list uchar int vertex_indices\n"
                "end_header\n"
            )
            for row in pts:
                fh.write(" ".join(str(v) for v in row) + "\n")
            fh.write("4 0 1 2 3\n")
        pts2, tris2, _ = mf.read_ply(p)
        np.testing.assert_array_equal(tris2, [[0, 1, 2], [0, 2, 3]])

    def test_big_endian(self, small, tmp_path):
        pts, tris, _ = small
        p = str(tmp_path / "be.ply")
        with open(p, "wb") as fh:
            fh.write(
                b"ply\nformat binary_big_endian 1.0\n"
                b"element vertex %d\n" % len(pts)
                + b"property float x\nproperty float y\nproperty float z\n"
                + b"element face %d\n" % len(tris)
                + b"property list uchar int vertex_indices\nend_header\n"
            )
            fh.write(pts.astype(">f4").tobytes())
            import numpy as _np

            face_dt = _np.dtype([("c", "u1"), ("i", ">i4", (3,))])
            farr = _np.empty(len(tris), face_dt)
            farr["c"] = 3
            farr["i"] = tris
            fh.write(farr.tobytes())
        pts2, tris2, _ = mf.read_ply(p)
        np.testing.assert_allclose(pts2, pts, atol=1e-6)
        np.testing.assert_array_equal(tris2, tris)


class TestObj:
    def test_roundtrip(self, small, tmp_path):
        pts, tris, _ = small
        p = str(tmp_path / "m.obj")
        mf.write_obj(p, pts, tris)
        pts2, tris2, _ = mf.read_obj(p)
        np.testing.assert_allclose(pts2, pts, atol=1e-6)
        np.testing.assert_array_equal(tris2, tris)

    def test_slash_and_negative_indices(self, tmp_path):
        p = str(tmp_path / "m.obj")
        with open(p, "w") as fh:
            fh.write("v 0 0 0\nv 1 0 0\nv 0 1 0\n")
            fh.write("f 1/1 2/2/2 3//3\n")  # v/vt, v/vt/vn, v//vn forms
            fh.write("f -3 -2 -1\n")  # negative = from the end
        _, tris, _ = mf.read_obj(p)
        np.testing.assert_array_equal(tris, [[0, 1, 2], [0, 1, 2]])


class TestStl:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip_welds_shared_vertices(self, small, tmp_path, binary):
        pts, tris, _ = small
        used = np.unique(tris)  # STL only preserves referenced vertices
        p = str(tmp_path / "m.stl")
        mf.write_stl(p, pts, tris, binary=binary)
        pts2, tris2, _ = mf.read_stl(p)
        assert len(pts2) == len(used)
        # Same triangle geometry set (soup order preserved by the writer).
        np.testing.assert_allclose(
            pts2[tris2].astype(np.float32),
            pts[tris].astype(np.float32),
            atol=1e-6,
        )
        # Welding restored shared topology: edge-connected, not a soup.
        assert tris2.max() == len(pts2) - 1


class TestDispatch:
    def test_bundled_mesh_via_every_format(self, tmp_path):
        _require_data()
        mesh = load_mesh(f"{DATA}/source_mesh.vtk")
        for ext in ("ply", "obj", "stl"):
            p = str(tmp_path / f"m.{ext}")
            save_mesh(p, mesh)
            back = load_mesh(p)
            assert back.triangles.shape[0] == mesh.triangles.shape[0]
            if ext == "stl":
                # welded count equals original (bundled mesh has no
                # duplicate coordinates)
                assert back.points.shape[0] == mesh.points.shape[0]
            else:
                np.testing.assert_allclose(
                    np.asarray(back.points), np.asarray(mesh.points), atol=1e-4
                )
            if ext == "ply":
                key = "thickness_change_(mm)"
                assert key in back.point_data
                np.testing.assert_allclose(
                    np.asarray(back.point_data[key]),
                    np.asarray(mesh.point_data[key]),
                    atol=1e-4,
                )

    def test_unknown_extension_raises(self, tmp_path):
        with pytest.raises(ValueError, match="unsupported mesh extension"):
            mf.read_any(str(tmp_path / "m.xyz"))


class TestStlDetection:
    def test_binary_stl_with_solid_header(self, tmp_path):
        """Real-world binary STLs often carry free text like
        'solid Part1 facet count ...' in the 80-byte header; the size
        identity len == 84 + 50*n_tri must win over the 'solid' prefix."""
        import struct

        pts = np.asarray(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float64
        )
        tris = np.asarray([[0, 1, 2], [0, 1, 3]], np.int64)
        p = str(tmp_path / "m.stl")
        mf.write_stl(p, pts, tris, binary=True)
        raw = bytearray(open(p, "rb").read())
        header = b"solid Part1 facet count: 2".ljust(80, b" ")
        raw[:80] = header
        open(p, "wb").write(bytes(raw))
        pts2, tris2, _ = mf.read_stl(p)
        assert len(tris2) == 2
        np.testing.assert_allclose(
            np.sort(pts2.ravel()), np.sort(pts.ravel()), atol=1e-6
        )

    def test_empty_ascii_solid(self, tmp_path):
        p = str(tmp_path / "e.stl")
        open(p, "w").write("solid empty\nendsolid empty\n")
        pts, tris, _ = mf.read_stl(p)
        assert len(pts) == 0 and len(tris) == 0

    def test_corrupt_stl_raises(self, tmp_path):
        """'solid' prefix, no ascii vertices, wrong binary size: loud error
        instead of a silent empty mesh."""
        p = str(tmp_path / "c.stl")
        open(p, "wb").write(b"solid junk".ljust(200, b"\x00"))
        with pytest.raises(ValueError, match="not a valid STL"):
            mf.read_stl(p)

    def test_binary_stl_solid_header_trailing_bytes(self, tmp_path):
        """Binary STL with a 'solid' header AND trailing padding (text-mode
        transfer): the size identity fails, ascii finds no vertices, and
        the reader must fall back to the binary parse, not error."""
        import struct

        pts = np.asarray(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float64
        )
        tris = np.asarray([[0, 1, 2], [0, 1, 3]], np.int64)
        p = str(tmp_path / "t.stl")
        mf.write_stl(p, pts, tris, binary=True)
        raw = bytearray(open(p, "rb").read())
        raw[:80] = b"solid Part1 exported".ljust(80, b" ")
        raw += b"\r\n"  # trailing bytes break the exact size identity
        open(p, "wb").write(bytes(raw))
        pts2, tris2, _ = mf.read_stl(p)
        assert len(tris2) == 2
        np.testing.assert_allclose(
            np.sort(pts2.ravel()), np.sort(pts.ravel()), atol=1e-6
        )


def test_ply_multicomponent_point_data(tmp_path):
    """[N, C] point_data expands into one scalar property per component
    (name_0..name_{C-1}) instead of crashing; values round-trip."""
    import jax.numpy as jnp

    from pyfocusr_tpu.mesh import TriMesh, load_mesh, save_mesh

    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    tris = np.array([[0, 1, 2]], np.int32)
    vec = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], np.float32)
    mesh = TriMesh(jnp.asarray(pts), jnp.asarray(tris), {"grad": jnp.asarray(vec)})
    for binary in (True, False):
        p = tmp_path / f"vec_{binary}.ply"
        from pyfocusr_tpu.io.mesh_formats import write_ply

        write_ply(str(p), pts, tris, {"grad": vec}, binary=binary)
        back = load_mesh(str(p))
        for c in range(3):
            np.testing.assert_allclose(
                np.asarray(back.point_data[f"grad_{c}"]), vec[:, c]
            )
    # save_mesh dispatch path (the .vtk -> .ply conversion flow).
    save_mesh(str(tmp_path / "vec2.ply"), mesh)
    back = load_mesh(str(tmp_path / "vec2.ply"))
    assert {f"grad_{c}" for c in range(3)} <= set(back.point_data)


class TestFormatRobustness:
    """Round-3 review fixes: malformed/legal-but-unusual files must parse
    correctly or fail loudly — never silently corrupt geometry."""

    def test_ascii_ply_per_face_scalar_property(self, tmp_path):
        """Legal PLY: a scalar face property after the vertex list.  The
        scalar must not be consumed as the next face's vertex count."""
        p = str(tmp_path / "q.ply")
        open(p, "w").write(
            "ply\nformat ascii 1.0\n"
            "element vertex 4\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 2\n"
            "property list uchar int vertex_indices\n"
            "property uchar quality\n"
            "end_header\n"
            "0 0 0\n1 0 0\n0 1 0\n0 0 1\n"
            "3 0 1 2 7\n"
            "3 1 3 2 9\n"
        )
        pts, tris, _ = mf.read_ply(p)
        np.testing.assert_array_equal(tris, [[0, 1, 2], [1, 3, 2]])

    def test_ascii_ply_scalar_before_list(self, tmp_path):
        p = str(tmp_path / "q2.ply")
        open(p, "w").write(
            "ply\nformat ascii 1.0\n"
            "element vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\n"
            "property uchar quality\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
            "0 0 0\n1 0 0\n0 1 0\n"
            "7 3 0 1 2\n"
        )
        _, tris, _ = mf.read_ply(p)
        np.testing.assert_array_equal(tris, [[0, 1, 2]])

    def test_ply_comment_containing_end_header(self, tmp_path):
        p = str(tmp_path / "c.ply")
        open(p, "w").write(
            "ply\nformat ascii 1.0\n"
            "comment exported before end_header marker rework\n"
            "element vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
            "0 0 0\n1 0 0\n0 1 0\n"
            "3 0 1 2\n"
        )
        pts, tris, _ = mf.read_ply(p)
        assert pts.shape == (3, 3)
        np.testing.assert_array_equal(tris, [[0, 1, 2]])

    def test_obj_zero_index_raises(self, tmp_path):
        p = str(tmp_path / "z.obj")
        open(p, "w").write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 0 1 2\n")
        with pytest.raises(ValueError, match="1-based"):
            mf.read_obj(p)

    def test_short_non_stl_raises(self, tmp_path):
        """Sub-84-byte 'solid'-prefixed junk (no endsolid, no vertices)
        must raise, not return an empty mesh."""
        p = str(tmp_path / "j.stl")
        open(p, "w").write("solid junk that is not an stl at all\n")
        with pytest.raises(ValueError, match="not a valid STL"):
            mf.read_stl(p)
