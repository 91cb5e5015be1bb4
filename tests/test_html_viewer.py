"""Standalone HTML/WebGL viewer export (utils/html_viewer.py).

The viewer is the dependency-free replacement for the reference's itkwidgets
viewers (``focusr.py:646-795``): these tests verify the exported file is
truly self-contained (no network references) and that the embedded binary
payloads round-trip the geometry exactly.
"""

import base64
import json
import re
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from pyfocusr_tpu.mesh import TriMesh
from pyfocusr_tpu.utils.html_viewer import export_html


def _sphere_mesh():
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_curvature_icp import make_sphere

    pts, tris = make_sphere(n_theta=8, n_phi=16)
    return TriMesh(
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(tris),
        {"height": jnp.asarray(pts[:, 2], jnp.float32)},
    )


def _scene_json(path):
    text = open(path, encoding="utf-8").read()
    m = re.search(
        r'<script id="scene" type="application/json">(.*?)</script>',
        text,
        re.S,
    )
    assert m, "embedded scene JSON missing"
    return text, json.loads(m.group(1))


def _f32(b64):
    return np.frombuffer(base64.b64decode(b64), "<f4")


def _u32(b64):
    return np.frombuffer(base64.b64decode(b64), "<u4")


def test_export_mesh_roundtrip(tmp_path):
    mesh = _sphere_mesh()
    out = export_html(tmp_path / "scene.html", meshes=[mesh], title="t<est>")
    text, data = _scene_json(out)

    # Self-contained: no external script/style/image/network references.
    assert not re.search(r'(src|href)\s*=\s*["\']https?://', text)
    assert "http://" not in json.dumps(data)
    assert "t&lt;est&gt;" in text  # escaped title

    (m,) = data["meshes"]
    assert m["n"] == mesh.n_points and m["f"] == mesh.n_triangles
    np.testing.assert_array_equal(
        _f32(m["pos"]).reshape(-1, 3), np.asarray(mesh.points, np.float32)
    )
    np.testing.assert_array_equal(
        _u32(m["idx"]).reshape(-1, 3), np.asarray(mesh.triangles, np.uint32)
    )
    s = m["scalars"]["height"]
    vals = _f32(s["b64"])
    np.testing.assert_array_equal(vals, np.asarray(mesh.point_data["height"]))
    assert s["min"] == pytest.approx(float(vals.min()))
    assert s["max"] == pytest.approx(float(vals.max()))


def test_export_point_sets_and_colors(tmp_path):
    rng = np.random.default_rng(0)
    pts_a = rng.normal(size=(50, 3)).astype(np.float32)
    pts_b = rng.normal(size=(30, 6)).astype(np.float32)  # extra dims dropped
    out = export_html(
        tmp_path / "pts.html",
        point_sets=[pts_a, pts_b],
        point_set_names=["a", "b"],
        colors=[(1, 0, 0), (0, 0, 1)],
    )
    _, data = _scene_json(out)
    assert [p["name"] for p in data["pointSets"]] == ["a", "b"]
    np.testing.assert_array_equal(
        _f32(data["pointSets"][1]["pos"]).reshape(-1, 3), pts_b[:, :3]
    )
    assert data["pointSets"][0]["color"] == [1.0, 0.0, 0.0]


def test_export_requires_geometry(tmp_path):
    with pytest.raises(ValueError, match="at least one"):
        export_html(tmp_path / "empty.html")


def test_script_terminator_escaped(tmp_path):
    """A '</script>' inside a scalar/mesh NAME must not break the page."""
    mesh = _sphere_mesh()
    out = export_html(
        tmp_path / "esc.html", meshes=[mesh], mesh_names=["</script>x"]
    )
    text, data = _scene_json(out)
    assert data["meshes"][0]["name"] == "</script>x"
    # The raw terminator sequence never appears inside the JSON block.
    body = re.search(
        r'<script id="scene" type="application/json">(.*?)</script>', text, re.S
    ).group(1)
    assert "</script>" not in body


def test_nan_scalars_and_adversarial_title(tmp_path):
    """NaN point_data must export with finite min/max (JS renders those
    vertices gray), and a title containing the literal '__DATA__' must not
    have the payload spliced into it (substitution is split-based)."""
    mesh = _sphere_mesh()
    vals = np.asarray(mesh.point_data["height"]).copy()
    vals[::7] = np.nan
    mesh = mesh.with_point_data("height", vals)
    out = export_html(
        tmp_path / "nan.html", meshes=[mesh], title="run __DATA__ v2"
    )
    text, data = _scene_json(out)
    s = data["meshes"][0]["scalars"]["height"]
    assert np.isfinite(s["min"]) and np.isfinite(s["max"])
    finite = vals[np.isfinite(vals)]
    assert s["min"] == pytest.approx(float(finite.min()))
    # Title substituted verbatim (escaped), payload NOT spliced into it.
    assert "run __DATA__ v2" in text
    assert text.count('"meshes"') == 1
    # The embedded JSON itself still parses and round-trips the NaNs.
    emb = _f32(s["b64"])
    assert np.isnan(emb[::7]).all()


def test_graph_export_viewer_html(tmp_path):
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_curvature_icp import make_sphere

    from pyfocusr_tpu.spectral.graph import Graph

    pts, tris = make_sphere(n_theta=8, n_phi=16)
    g = Graph(
        TriMesh(jnp.asarray(pts, jnp.float32), jnp.asarray(tris)),
        n_spectral_features=3,
        list_features_to_calc=["max_curvature"],
        seed=0,
    )
    g.get_graph_spectrum()
    out = g.export_viewer_html(tmp_path / "g.html", eig_vec=1, feature_idx=0)
    _, data = _scene_json(out)
    scal = data["meshes"][0]["scalars"]
    assert "eig_vec_1" in scal and "feature_0" in scal
    np.testing.assert_array_equal(
        _f32(scal["eig_vec_1"]["b64"]),
        np.asarray(g.eig_vecs[:, 1], np.float32),
    )


def test_focusr_export_viewer_html(tmp_path):
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_curvature_icp import make_sphere

    from pyfocusr_tpu import Focusr

    p1, t1 = make_sphere(n_theta=10, n_phi=20)
    p2 = p1 * (1.0 + 0.05 * np.sin(3 * p1[:, [1]]))
    reg = Focusr(
        vtk_mesh_target=TriMesh(jnp.asarray(p1, jnp.float32), jnp.asarray(t1)),
        vtk_mesh_source=TriMesh(
            jnp.asarray(p2.astype(np.float32)), jnp.asarray(t1)
        ),
        get_weighted_spectral_coords=False,
        non_rigid_max_iterations=15,
        graph_smoothing_iterations=10,
        projection_smooth_iterations=2,
        n_coords_spectral_registration=150,
        seed=0,
    )
    reg.align_maps()
    out = reg.export_viewer_html(
        tmp_path / "reg.html", include_spectral_coords=True
    )
    _, data = _scene_json(out)
    names = [m["name"] for m in data["meshes"]]
    assert names == ["target", "source", "source transformed"]
    # Correspondence coloring: every mesh carries the corresp_idx scalar.
    for m in data["meshes"]:
        assert "corresp_idx" in m["scalars"]
    corr = _f32(data["meshes"][1]["scalars"]["corresp_idx"]["b64"])
    np.testing.assert_array_equal(
        corr,
        np.asarray(
            reg.corresponding_target_idx_for_each_source_pt, np.float32
        ),
    )
    assert len(data["pointSets"]) == 2


def test_script_breaking_names_escaped(tmp_path):
    """Names containing '<!--<script' must not break the viewer page: every
    '<' in the JSON payload is escaped (review finding — '</'-only escaping
    left the double-escaped script-data state reachable)."""
    import jax.numpy as jnp
    import numpy as np

    from pyfocusr_tpu.mesh import TriMesh
    from pyfocusr_tpu.utils.html_viewer import export_html

    m = TriMesh(
        jnp.zeros((3, 3), jnp.float32),
        jnp.asarray([[0, 1, 2]]),
        {"<!--<script>alert(1)</script>": jnp.arange(3, dtype=jnp.float32)},
    )
    p = str(tmp_path / "v.html")
    export_html(p, meshes=[m], mesh_names=["<!--<script>"], title="t")
    html = open(p).read()
    start = html.index("application/json")
    end = html.index("</script>", start)
    payload = html[start:end]
    assert "<" not in payload.replace("\\u003c", "")
    import json as _json

    # The escaped payload still parses back to the original names.
    blob = payload[payload.index(">") + 1:]
    data = _json.loads(blob)
    assert data["meshes"][0]["name"] == "<!--<script>"
