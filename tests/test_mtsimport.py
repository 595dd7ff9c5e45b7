"""mtsimport converter: OBJ and COLLADA -> XML + .serialized round trip."""
import os

import numpy as np

from mitsuba_tpu.io import meshio
from mitsuba_tpu.io.xml import load_scene
from mitsuba_tpu.render import mesh as mesh_mod
from mitsuba_tpu.utils.mtsimport import convert, load_collada

DAE = """<?xml version="1.0"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
 <library_geometries>
  <geometry id="box" name="box">
   <mesh>
    <source id="pos"><float_array id="pa" count="12">
      0 0 0  1 0 0  1 1 0  0 1 0</float_array></source>
    <vertices id="verts"><input semantic="POSITION" source="#pos"/></vertices>
    <triangles count="2">
     <input semantic="VERTEX" source="#verts" offset="0"/>
     <p>0 1 2 0 2 3</p>
    </triangles>
   </mesh>
  </geometry>
 </library_geometries>
</COLLADA>
"""


def test_collada_minimal(tmp_path):
    p = str(tmp_path / "m.dae")
    with open(p, "w") as f:
        f.write(DAE)
    meshes = load_collada(p)
    assert len(meshes) == 1
    name, m = meshes[0]
    assert m.vertices.shape == (4, 3)
    assert m.faces.shape == (2, 3)


def test_convert_obj_and_render(tmp_path):
    obj = str(tmp_path / "s.obj")
    meshio.save_obj(obj, mesh_mod.make_sphere_mesh([0, 0, 3], 1.0, 12, 24))
    out = str(tmp_path / "converted")
    xml = convert(obj, out, quiet=True)
    assert os.path.exists(os.path.join(out, "meshes.serialized"))
    scene, cfg = load_scene(xml, backend="bvh")
    assert scene.geom.n_tris > 100
    assert cfg["integrator"] == "path"
