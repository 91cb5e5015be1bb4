"""VTK XML PolyData (.vtp) reader/writer (io/vtp_io.py).

Round-trips through our own writer cover ascii / inline-base64 /
zlib-compressed encodings; hand-built files cover the reader paths the
writer does not emit (appended raw + base64 sections, BigEndian, UInt32
headers, multi-block compression, multiple pieces, quad polys).
"""

import base64
import struct
import zlib

import numpy as np
import pytest

from pyfocusr_tpu.io import vtp_io

from conftest import DATA, _require_data


@pytest.fixture(scope="module")
def small():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(23, 3)).astype(np.float64)
    tris = np.asarray(
        [[i, (i + 1) % 23, (i + 7) % 23] for i in range(0, 23, 2)], np.int32
    )
    data = {
        "thickness": rng.uniform(0, 2, 23),
        "grad": rng.normal(size=(23, 3)),
    }
    return pts, tris, data


class TestRoundtrip:
    @pytest.mark.parametrize(
        "binary,compress", [(True, False), (True, True), (False, False)]
    )
    def test_roundtrip(self, small, tmp_path, binary, compress):
        pts, tris, data = small
        p = str(tmp_path / "m.vtp")
        vtp_io.write_vtp(p, pts, tris, data, binary=binary, compress=compress)
        pts2, tris2, data2 = vtp_io.read_vtp(p)
        np.testing.assert_allclose(pts2, pts, rtol=0, atol=0 if binary else 1e-12)
        np.testing.assert_array_equal(tris2, tris)
        assert set(data2) == set(data)
        np.testing.assert_allclose(data2["thickness"], data["thickness"], atol=1e-12)
        assert data2["grad"].shape == (23, 3)
        np.testing.assert_allclose(data2["grad"], data["grad"], atol=1e-12)

    def test_empty_point_data_and_no_triangles(self, tmp_path):
        pts = np.zeros((4, 3))
        p = str(tmp_path / "e.vtp")
        vtp_io.write_vtp(p, pts, np.zeros((0, 3), np.int32))
        pts2, tris2, data2 = vtp_io.read_vtp(p)
        assert pts2.shape == (4, 3) and tris2.shape == (0, 3) and data2 == {}

    def test_dispatch_and_bundled_mesh(self, tmp_path):
        _require_data()
        from pyfocusr_tpu import load_mesh, save_mesh

        mesh = load_mesh(f"{DATA}/source_mesh.vtk")
        p = str(tmp_path / "m.vtp")
        save_mesh(p, mesh)
        back = load_mesh(p)
        np.testing.assert_allclose(
            np.asarray(back.points), np.asarray(mesh.points), atol=1e-4
        )
        np.testing.assert_array_equal(
            np.asarray(back.triangles), np.asarray(mesh.triangles)
        )
        key = "thickness_change_(mm)"
        np.testing.assert_allclose(
            np.asarray(back.point_data[key]),
            np.asarray(mesh.point_data[key]),
            atol=1e-4,
        )


def _xml_file(body, byte_order="LittleEndian", header_type="UInt32",
              compressor="", appended=None, encoding="base64"):
    comp = f' compressor="{compressor}"' if compressor else ""
    head = (
        f'<VTKFile type="PolyData" version="0.1" byte_order="{byte_order}" '
        f'header_type="{header_type}"{comp}>\n<PolyData>\n'
    )
    tail = "</PolyData>\n"
    if appended is not None:
        if encoding == "raw":
            app = b'<AppendedData encoding="raw">\n_' + appended + b"\n</AppendedData>\n"
        else:
            app = (
                b'<AppendedData encoding="base64">\n_'
                + appended.encode("ascii")
                + b"\n</AppendedData>\n"
            )
    else:
        app = b""
    return head.encode() + body.encode() + tail.encode() + app + b"</VTKFile>\n"


_PIECE_ASCII = """
<Piece NumberOfPoints="4" NumberOfPolys="1">
<Points>
<DataArray type="Float32" NumberOfComponents="3" format="ascii">
0 0 0  1 0 0  1 1 0  0 1 0
</DataArray>
</Points>
<Polys>
<DataArray type="Int64" Name="connectivity" format="ascii">0 1 2 3</DataArray>
<DataArray type="Int64" Name="offsets" format="ascii">4</DataArray>
</Polys>
</Piece>
"""


class TestReaderPaths:
    def test_ascii_quad_fan_triangulation(self, tmp_path):
        p = tmp_path / "q.vtp"
        p.write_bytes(_xml_file(_PIECE_ASCII))
        pts, tris, _ = vtp_io.read_vtp(str(p))
        assert pts.shape == (4, 3)
        np.testing.assert_array_equal(tris, [[0, 1, 2], [0, 2, 3]])

    def test_appended_raw_uint32(self, tmp_path):
        pts = np.arange(12, dtype="<f4")
        conn = np.array([0, 1, 2], "<i4")
        offs = np.array([3], "<i4")
        scal = np.array([9.5, 8.5, 7.5, 6.5], "<f4")
        payload, offsets = b"", []
        for arr in (pts, conn, offs, scal):
            offsets.append(len(payload))
            payload += struct.pack("<I", arr.nbytes) + arr.tobytes()
        body = f"""
<Piece NumberOfPoints="4" NumberOfPolys="1">
<PointData>
<DataArray type="Float32" Name="s" format="appended" offset="{offsets[3]}"/>
</PointData>
<Points>
<DataArray type="Float32" NumberOfComponents="3" format="appended" offset="{offsets[0]}"/>
</Points>
<Polys>
<DataArray type="Int32" Name="connectivity" format="appended" offset="{offsets[1]}"/>
<DataArray type="Int32" Name="offsets" format="appended" offset="{offsets[2]}"/>
</Polys>
</Piece>
"""
        p = tmp_path / "raw.vtp"
        p.write_bytes(_xml_file(body, appended=payload, encoding="raw"))
        pts2, tris2, data2 = vtp_io.read_vtp(str(p))
        np.testing.assert_allclose(pts2, pts.reshape(4, 3))
        np.testing.assert_array_equal(tris2, [[0, 1, 2]])
        np.testing.assert_allclose(data2["s"], scal)

    def test_appended_base64_uint32(self, tmp_path):
        pts = np.arange(12, dtype="<f4")
        conn = np.array([0, 1, 2], "<i4")
        offs = np.array([3], "<i4")
        text, offsets = "", []
        for arr in (pts, conn, offs):
            offsets.append(len(text))
            text += base64.b64encode(
                struct.pack("<I", arr.nbytes) + arr.tobytes()
            ).decode("ascii")
        body = f"""
<Piece NumberOfPoints="4" NumberOfPolys="1">
<Points>
<DataArray type="Float32" NumberOfComponents="3" format="appended" offset="{offsets[0]}"/>
</Points>
<Polys>
<DataArray type="Int32" Name="connectivity" format="appended" offset="{offsets[1]}"/>
<DataArray type="Int32" Name="offsets" format="appended" offset="{offsets[2]}"/>
</Polys>
</Piece>
"""
        p = tmp_path / "b64.vtp"
        p.write_bytes(_xml_file(body, appended=text, encoding="base64"))
        pts2, tris2, _ = vtp_io.read_vtp(str(p))
        np.testing.assert_allclose(pts2, pts.reshape(4, 3))
        np.testing.assert_array_equal(tris2, [[0, 1, 2]])

    def test_big_endian_inline_binary_uint64(self, tmp_path):
        pts = np.arange(9, dtype=">f8")
        conn = np.array([0, 1, 2], ">i8")
        offs = np.array([3], ">i8")

        def blk(arr):
            return base64.b64encode(
                struct.pack(">Q", arr.nbytes) + arr.tobytes()
            ).decode("ascii")

        body = f"""
<Piece NumberOfPoints="3" NumberOfPolys="1">
<Points>
<DataArray type="Float64" NumberOfComponents="3" format="binary">{blk(pts)}</DataArray>
</Points>
<Polys>
<DataArray type="Int64" Name="connectivity" format="binary">{blk(conn)}</DataArray>
<DataArray type="Int64" Name="offsets" format="binary">{blk(offs)}</DataArray>
</Polys>
</Piece>
"""
        p = tmp_path / "be.vtp"
        p.write_bytes(_xml_file(body, byte_order="BigEndian", header_type="UInt64"))
        pts2, tris2, _ = vtp_io.read_vtp(str(p))
        np.testing.assert_allclose(pts2, np.arange(9, dtype=np.float64).reshape(3, 3))
        np.testing.assert_array_equal(tris2, [[0, 1, 2]])

    def test_multiblock_zlib_inline(self, tmp_path):
        """Two compressed blocks in one DataArray (VTK splits large arrays
        into 32 KiB blocks): header = [nblocks, bs, last, s1, s2]."""
        vals = np.arange(24, dtype="<f4")
        raw = vals.tobytes()
        half = len(raw) // 2
        c1, c2 = zlib.compress(raw[:half]), zlib.compress(raw[half:])
        header = struct.pack("<4I", 2, half, half, len(c1)) + struct.pack("<I", len(c2))
        blob = (
            base64.b64encode(header).decode("ascii")
            + base64.b64encode(c1 + c2).decode("ascii")
        )
        body = f"""
<Piece NumberOfPoints="8" NumberOfPolys="0">
<Points>
<DataArray type="Float32" NumberOfComponents="3" format="binary">{blob}</DataArray>
</Points>
</Piece>
"""
        p = tmp_path / "z.vtp"
        p.write_bytes(
            _xml_file(body, compressor="vtkZLibDataCompressor", header_type="UInt32")
        )
        pts2, _, _ = vtp_io.read_vtp(str(p))
        np.testing.assert_allclose(pts2, vals.reshape(8, 3))

    def test_multi_piece_concatenation(self, small, tmp_path):
        pts, tris, data = small
        p1, p2 = str(tmp_path / "a.vtp"), str(tmp_path / "b.vtp")
        vtp_io.write_vtp(p1, pts, tris, {"thickness": data["thickness"]})
        # Build a 2-piece file by splicing the piece of a.vtp in twice.
        content = open(p1).read()
        start = content.index("<Piece")
        end = content.index("</Piece>") + len("</Piece>")
        piece = content[start:end]
        open(p2, "w").write(
            content[:start] + piece + "\n" + piece + content[end:]
        )
        pts2, tris2, data2 = vtp_io.read_vtp(p2)
        assert pts2.shape == (2 * len(pts), 3)
        np.testing.assert_allclose(pts2[len(pts):], pts)
        # Second copy's connectivity re-offset past the first piece's points.
        np.testing.assert_array_equal(tris2[len(tris):], tris + len(pts))
        assert data2["thickness"].shape == (2 * len(pts),)


class TestErrors:
    def test_not_polydata_raises(self, tmp_path):
        p = tmp_path / "g.vtp"
        p.write_bytes(
            b'<VTKFile type="ImageData" version="0.1"><ImageData/></VTKFile>'
        )
        with pytest.raises(ValueError, match="PolyData"):
            vtp_io.read_vtp(str(p))

    def test_unsupported_compressor_raises(self, tmp_path):
        p = tmp_path / "l.vtp"
        p.write_bytes(_xml_file(_PIECE_ASCII, compressor="vtkLZ4DataCompressor"))
        with pytest.raises(ValueError, match="compressor"):
            vtp_io.read_vtp(str(p))

    def test_out_of_range_connectivity_raises(self, tmp_path):
        bad = _PIECE_ASCII.replace(">0 1 2 3<", ">0 1 2 9<")
        p = tmp_path / "o.vtp"
        p.write_bytes(_xml_file(bad))
        with pytest.raises(ValueError, match="out of range"):
            vtp_io.read_vtp(str(p))

    def test_writer_validates_inputs(self, tmp_path):
        with pytest.raises(ValueError, match="must be"):
            vtp_io.write_vtp(str(tmp_path / "x.vtp"), np.zeros((3, 2)), np.zeros((0, 3)))
        with pytest.raises(ValueError, match="index out of range"):
            vtp_io.write_vtp(
                str(tmp_path / "y.vtp"), np.zeros((3, 3)), np.array([[0, 1, 5]])
            )
        # Quad / flat connectivity must be rejected, not silently written
        # as a corrupt file (review finding).
        with pytest.raises(ValueError, match="triangles must be"):
            vtp_io.write_vtp(
                str(tmp_path / "q.vtp"), np.zeros((5, 3)), np.array([[0, 1, 2, 3]])
            )
        with pytest.raises(ValueError, match="triangles must be"):
            vtp_io.write_vtp(
                str(tmp_path / "f.vtp"), np.zeros((5, 3)), np.array([0, 1, 2])
            )

    def test_points_with_two_components_raises(self, tmp_path):
        bad = _PIECE_ASCII.replace(
            'NumberOfComponents="3"', 'NumberOfComponents="2"'
        ).replace("0 0 0  1 0 0  1 1 0  0 1 0", "0 0  1 0  1 1  0 1")
        p = tmp_path / "2d.vtp"
        p.write_bytes(_xml_file(bad))
        with pytest.raises(ValueError, match="NumberOfComponents=2"):
            vtp_io.read_vtp(str(p))


def test_malformed_files_raise_not_corrupt(tmp_path):
    """Truncated/corrupted inputs must raise (any exception type is fine —
    callers treat read failure uniformly), never hang or silently return
    wrong geometry."""
    pts = np.arange(30, dtype=np.float64).reshape(10, 3)
    tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    good = str(tmp_path / "good.vtp")
    vtp_io.write_vtp(good, pts, tris, {"s": np.zeros(10)})
    raw = open(good, "rb").read()
    rng = np.random.default_rng(0)
    for i in range(30):
        # Truncations and random single-byte corruptions.
        if i < 10:
            bad = raw[: int(len(raw) * (i + 1) / 11)]
        else:
            b = bytearray(raw)
            pos = int(rng.integers(0, len(b)))
            b[pos] = int(rng.integers(0, 256))
            bad = bytes(b)
        p = str(tmp_path / "bad.vtp")
        open(p, "wb").write(bad)
        try:
            r_pts, r_tris, _ = vtp_io.read_vtp(p)
        except Exception:
            continue  # loud failure is the expected outcome
        # A byte flip may land in payload/whitespace and decode fine —
        # but structure must still be self-consistent.
        assert r_pts.shape[1] == 3
        assert r_tris.shape[1] == 3
        if r_tris.size:
            assert r_tris.max() < r_pts.shape[0]


def test_point_data_name_needing_xml_escape_roundtrips(tmp_path):
    """Names with " & < (arbitrary upstream array names) must be escaped
    into valid XML, not written verbatim (review finding)."""
    pts = np.zeros((3, 3))
    tris = np.array([[0, 1, 2]], np.int32)
    name = 'thick"ness_&_<mm>'
    vals = np.array([1.0, 2.0, 3.0])
    p = str(tmp_path / "esc.vtp")
    vtp_io.write_vtp(p, pts, tris, {name: vals})
    _, _, data = vtp_io.read_vtp(p)
    np.testing.assert_allclose(data[name], vals)


def test_wrong_length_scalar_point_data_raises(tmp_path):
    """1-component PointData with the wrong number of values must raise,
    not return misaligned point_data (review finding)."""
    body = _PIECE_ASCII.replace(
        "<Points>",
        '<PointData><DataArray type="Float32" Name="thick" format="ascii">'
        "1 2 3 4 5</DataArray></PointData>\n<Points>",
    )
    p = tmp_path / "wl.vtp"
    p.write_bytes(_xml_file(body))
    with pytest.raises(ValueError, match="holds 5 values for 4 points"):
        vtp_io.read_vtp(str(p))


def test_trailing_connectivity_junk_raises(tmp_path):
    """Connectivity longer than offsets[-1] must raise — the all-triangles
    fast path used to fabricate a phantom triangle from the junk."""
    body = _PIECE_ASCII.replace(
        ">0 1 2 3<", ">0 1 2 0 2 3<"
    ).replace(
        '<DataArray type="Int64" Name="offsets" format="ascii">4</DataArray>',
        '<DataArray type="Int64" Name="offsets" format="ascii">3</DataArray>',
    )
    p = tmp_path / "tj.vtp"
    p.write_bytes(_xml_file(body))
    with pytest.raises(ValueError, match="offsets\\s+declare|offsets declare"):
        vtp_io.read_vtp(str(p))
