"""Hair tubes, height-span maps, instancing."""
import numpy as np
import pytest

from mitsuba_tpu.io.hairio import load_hair, load_hspan, tessellate_fiber
from mitsuba_tpu.io.xml import load_scene_string


def test_hair_tube(tmp_path):
    p = str(tmp_path / "strand.hair")
    with open(p, "w") as f:
        f.write("0 0 0\n0 1 0\n0.3 2 0\n\n1 0 0\n1 1 0.2\n")
    mesh = load_hair(p, radius=0.1, n_sides=6)
    assert mesh.n_faces == (2 + 1) * 6 * 2  # (2+1) segments x 6 sides x 2 tris
    # vertices lie within radius of the polylines
    assert np.isfinite(mesh.vertices).all()
    assert mesh.normals is not None


def test_fiber_frames_continuous():
    pts = np.stack([np.zeros(20), np.linspace(0, 5, 20),
                    np.sin(np.linspace(0, 3, 20))], -1)
    mesh = tessellate_fiber(pts, 0.05, 8)
    # tube radius respected
    assert np.isfinite(mesh.vertices).all()
    assert mesh.n_faces == 19 * 8 * 2


def test_hspan_v2(tmp_path):
    p = str(tmp_path / "snow.hspans2")
    lines = []
    for x in range(4):
        for y in range(4):
            h = 1.0 + 0.1 * (x + y)
            lines.append(f"{x} {y} 0.0 {h} 1 0 1 0 1 0 1 0")
    with open(p, "w") as f:
        f.write("\n".join(lines))
    mesh = load_hspan(p)
    assert mesh.n_faces == 3 * 3 * 2
    # heights increase along +x/+y
    assert mesh.vertices[:, 1].max() > mesh.vertices[:, 1].min()


def test_instance_flattening():
    scene, _ = load_scene_string("""
<scene>
 <shape type="shapegroup" id="grp">
   <shape type="sphere"><float name="radius" value="0.5"/>
     <bsdf type="lambertian"/></shape>
 </shape>
 <shape type="instance"><ref id="grp"/>
   <transform name="toWorld"><translate x="2"/></transform></shape>
 <shape type="instance"><ref id="grp"/>
   <transform name="toWorld"><translate x="-2"/></transform></shape>
</scene>""")
    # spheres are analytic primitives now — instances place two of them
    assert scene.geom.n_spheres == 2
    cx = np.asarray(scene.geom.sph_c)[:, 0]
    assert cx.max() > 1.9 and cx.min() < -1.9
