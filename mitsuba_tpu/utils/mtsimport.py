"""Scene importer — mtsimport parity.

Capability parity with the reference converter (src/converter/converter.h:23
GeometryConverter, collada.cpp:462-494, obj.cpp): converts OBJ and COLLADA
(.dae) inputs into a mitsuba-format XML scene plus compressed `.serialized`
meshes (io/meshio.py writes the same zlib container the reference reads).

    python -m mitsuba_tpu.utils.mtsimport input.obj out_dir/
"""
from __future__ import annotations

import os
import sys
import xml.etree.ElementTree as ET

import numpy as np

from mitsuba_tpu.io import meshio
from mitsuba_tpu.render.mesh import TriMesh


def load_collada(path: str):
    """Minimal COLLADA geometry reader: triangles/polylist positions (+
    normals when indexed alongside). Returns [(name, TriMesh)]."""
    ns = {"c": "http://www.collada.org/2005/11/COLLADASchema"}
    root = ET.parse(path).getroot()
    out = []
    for geom in root.iter("{http://www.collada.org/2005/11/COLLADASchema}geometry"):
        name = geom.get("name") or geom.get("id") or "mesh"
        mesh_el = geom.find("c:mesh", ns)
        if mesh_el is None:
            continue
        sources = {}
        for src in mesh_el.findall("c:source", ns):
            arr = src.find("c:float_array", ns)
            if arr is not None and arr.text:
                sources["#" + src.get("id")] = np.fromstring(
                    arr.text, sep=" "
                ) if hasattr(np, "fromstring") else np.fromiter(
                    (float(x) for x in arr.text.split()), np.float64
                )
        # vertices indirection
        vert_map = {}
        for v in mesh_el.findall("c:vertices", ns):
            for inp in v.findall("c:input", ns):
                if inp.get("semantic") == "POSITION":
                    vert_map["#" + v.get("id")] = inp.get("source")
        for prim in list(mesh_el.findall("c:triangles", ns)) + list(
            mesh_el.findall("c:polylist", ns)
        ):
            inputs = sorted(
                prim.findall("c:input", ns), key=lambda i: int(i.get("offset", 0))
            )
            stride = max(int(i.get("offset", 0)) for i in inputs) + 1
            pos_src = None
            pos_off = 0
            for inp in inputs:
                if inp.get("semantic") == "VERTEX":
                    pos_src = vert_map.get(inp.get("source"), inp.get("source"))
                    pos_off = int(inp.get("offset", 0))
            p_el = prim.find("c:p", ns)
            if p_el is None or pos_src not in sources:
                continue
            idx = np.fromiter((int(x) for x in p_el.text.split()), np.int64)
            pos = np.asarray(sources[pos_src], np.float64).reshape(-1, 3)
            vcount_el = prim.find("c:vcount", ns)
            if vcount_el is not None:
                vcounts = np.fromiter((int(x) for x in vcount_el.text.split()), np.int64)
            else:
                vcounts = np.full(len(idx) // (3 * stride), 3, np.int64)
            faces = []
            cursor = 0
            for vc in vcounts:
                corner_idx = [
                    idx[cursor + k * stride + pos_off] for k in range(vc)
                ]
                for k in range(1, vc - 1):
                    faces.append([corner_idx[0], corner_idx[k], corner_idx[k + 1]])
                cursor += vc * stride
            mesh = TriMesh(
                pos.astype(np.float32), np.asarray(faces, np.int32), name=name
            )
            mesh.compute_vertex_normals()
            out.append((name, mesh))
    return out


def convert(input_path: str, out_dir: str, quiet: bool = False) -> str:
    """Convert an OBJ/DAE file into out_dir/{scene.xml, meshes.serialized}.
    Returns the XML path."""
    os.makedirs(out_dir, exist_ok=True)
    ext = os.path.splitext(input_path)[1].lower()
    if ext == ".obj":
        meshes = [(os.path.basename(input_path), meshio.load_obj(input_path))]
    elif ext == ".dae":
        meshes = load_collada(input_path)
    else:
        raise ValueError(f"unsupported input format: {input_path}")
    if not meshes:
        raise ValueError(f"{input_path}: no geometry found")

    ser_path = os.path.join(out_dir, "meshes.serialized")
    meshio.save_serialized(ser_path, [m for _, m in meshes])

    scene = ET.Element("scene")
    integ = ET.SubElement(scene, "integrator", type="path")
    ET.SubElement(integ, "integer", name="maxDepth", value="5")
    cam = ET.SubElement(scene, "camera", type="perspective")
    ET.SubElement(cam, "float", name="fov", value="45")
    samp = ET.SubElement(cam, "sampler", type="independent")
    ET.SubElement(samp, "integer", name="sampleCount", value="16")
    film = ET.SubElement(cam, "film", type="exrfilm")
    ET.SubElement(film, "integer", name="width", value="512")
    ET.SubElement(film, "integer", name="height", value="512")
    for i, (name, _) in enumerate(meshes):
        shape = ET.SubElement(scene, "shape", type="serialized")
        ET.SubElement(shape, "string", name="filename", value="meshes.serialized")
        ET.SubElement(shape, "integer", name="shapeIndex", value=str(i))
        bsdf = ET.SubElement(shape, "bsdf", type="lambertian")
        ET.SubElement(bsdf, "rgb", name="reflectance", value="0.5 0.5 0.5")
    lum = ET.SubElement(scene, "luminaire", type="constant")
    ET.SubElement(lum, "rgb", name="intensity", value="1 1 1")

    xml_path = os.path.join(out_dir, "scene.xml")
    ET.indent(ET.ElementTree(scene))
    ET.ElementTree(scene).write(xml_path, encoding="unicode")
    if not quiet:
        print(f"wrote {xml_path} + {ser_path} ({len(meshes)} mesh(es))")
    return xml_path


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print("usage: python -m mitsuba_tpu.utils.mtsimport input.{obj,dae} out_dir/")
        return 1
    convert(argv[0], argv[1])
    return 0


if __name__ == "__main__":
    sys.exit(main())
