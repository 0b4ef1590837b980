"""Scene dict -> Mitsuba XML writer (round-trip parity tooling).

Counterpart of the reference's python/xml.py WriteXML (dict -> XML
exporter): produces XML that both this framework's loader
(loader/xml_loader.py) and stock Mitsuba 3 accept.  Mesh data given
inline (``trimesh`` with vertex arrays) is written to ``.serialized``
sidecar files when an output path is provided (the reference exporter
writes PLY sidecars for the same reason: Mitsuba XML has no inline
geometry).
"""

from __future__ import annotations

import os

import numpy as np

# element tag by object "type" (mirrors dict_loader's dispatch tables)
_SHAPES = {"obj", "ply", "serialized", "sphere", "rectangle", "disk",
           "cube", "cylinder", "sdfgrid", "bsplinecurve", "linearcurve",
           "instance", "shapegroup", "merge", "trimesh"}
_BSDFS = {"diffuse", "conductor", "roughconductor", "dielectric",
          "roughdielectric", "thindielectric", "plastic", "roughplastic",
          "principled", "principledthin", "hair", "measured",
          "measured_polarized", "pplastic", "polarizer", "retarder",
          "circular", "blendbsdf", "mask", "twosided", "bumpmap",
          "normalmap", "null"}
_EMITTERS = {"area", "point", "constant", "envmap", "directional",
             "directionalarea", "spot", "projector"}
_SENSORS = {"perspective", "thinlens", "orthographic", "grid", "batch",
            "distant", "radiancemeter", "irradiancemeter"}
_TEXTURES = {"bitmap", "checkerboard", "mesh_attribute", "volume"}
_SPECTRA = {"uniform", "regular", "irregular", "srgb", "d65", "blackbody",
            "rgb"}
_MEDIA = {"homogeneous", "heterogeneous"}
_PHASE = {"isotropic", "hg", "rayleigh", "sggx", "tabphase", "blendphase"}
_INTEGRATORS = {"path", "mvpath", "direct", "aov", "depth", "moment",
                "stokes", "volpath", "volpathmis", "ptracer"}
_FILMS = {"hdrfilm", "specfilm"}
_SAMPLERS = {"independent", "stratified", "multijitter", "orthogonal",
             "ldsampler"}
_RFILTERS = {"box", "tent", "gaussian", "mitchell", "catmullrom",
             "lanczos"}
_VOLUMES = {"gridvolume", "constvolume"}

_POINT_KEYS = {"position", "center", "origin", "target", "up",
               "direction", "cam_dir"}


def _tag_for(type_name: str, key: str) -> str:
    if type_name in _SHAPES:
        return "shape"
    if type_name in _BSDFS:
        return "bsdf"
    if type_name in _EMITTERS:
        return "emitter"
    if type_name in _SENSORS:
        return "sensor"
    if type_name in _INTEGRATORS:
        return "integrator"
    if type_name in _FILMS:
        return "film"
    if type_name in _SAMPLERS:
        return "sampler"
    if type_name in _RFILTERS:
        return "rfilter"
    if type_name in _TEXTURES:
        return "texture"
    if type_name in _MEDIA:
        return "medium"
    if type_name in _PHASE:
        return "phase"
    if type_name in _VOLUMES:
        return "volume"
    if type_name in _SPECTRA:
        return "spectrum"
    raise ValueError(f"cannot map type {type_name!r} to an XML tag")


def _fmt(v) -> str:
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    return str(v)


def _fmt_vec(v) -> str:
    return ", ".join(repr(float(x)) for x in np.asarray(v).reshape(-1))


class _W:
    def __init__(self):
        self.lines = ['<?xml version="1.0" encoding="utf-8"?>']
        self.ind = 0

    def line(self, s):
        self.lines.append("    " * self.ind + s)

    @staticmethod
    def _attrs(attrs):
        from xml.sax.saxutils import quoteattr
        return "".join(f" {k}={quoteattr(str(v))}"
                       for k, v in attrs.items() if v is not None)

    def open(self, tag, **attrs):
        self.line(f"<{tag}{self._attrs(attrs)}>")
        self.ind += 1

    def close(self, tag):
        self.ind -= 1
        self.line(f"</{tag}>")

    def leaf(self, tag, **attrs):
        self.line(f"<{tag}{self._attrs(attrs)}/>")


def _write_transform(w: _W, name, spec):
    w.open("transform", name=name)
    ops = []
    if isinstance(spec, dict) and "ops" in spec:
        ops = spec["ops"]
    elif isinstance(spec, dict) and ("lookat" in spec
                                     or spec.get("type") == "lookat"):
        ops = [spec]
    elif isinstance(spec, dict) and "matrix" in spec:
        ops = [spec]
    else:
        ops = [{"matrix": spec}]
    for op in ops:
        if "translate" in op:
            w.leaf("translate", value=_fmt_vec(op["translate"]))
        elif "scale" in op:
            s = op["scale"]
            if np.ndim(s) == 0:
                w.leaf("scale", value=_fmt(float(s)))
            else:
                w.leaf("scale", value=_fmt_vec(s))
        elif "rotate" in op:
            r = op["rotate"]
            ax = np.asarray(r["axis"], np.float64)
            w.leaf("rotate", x=_fmt(ax[0]), y=_fmt(ax[1]), z=_fmt(ax[2]),
                   angle=_fmt(float(r["angle"])))
        elif "lookat" in op or op.get("type") == "lookat":
            la = op.get("lookat", op)
            w.leaf("lookat", origin=_fmt_vec(la["origin"]),
                   target=_fmt_vec(la["target"]),
                   up=_fmt_vec(la.get("up", [0, 1, 0])))
        elif "matrix" in op:
            w.leaf("matrix", value=" ".join(
                repr(float(x))
                for x in np.asarray(op["matrix"]).reshape(-1)))
        else:
            raise ValueError(f"unknown transform op {op!r}")
    w.close("transform")


def _write_value(w: _W, name, v, out_dir):
    if isinstance(v, dict):
        t = v.get("type")
        if t == "ref":
            w.leaf("ref", id=v["id"], name=name)
        elif name == "to_world" or (t is None and (
                "ops" in v or "lookat" in v or "matrix" in v)):
            _write_transform(w, name, v)
        elif t == "irregular" and "wavelengths" in v:
            pairs = " ".join(f"{float(wl)}:{float(val)}" for wl, val in
                             zip(v["wavelengths"], v["values"]))
            w.leaf("spectrum", name=name, value=pairs)
        elif t == "rgb":
            w.leaf("rgb", name=name, value=_fmt_vec(v["value"]))
        else:
            _write_object(w, name, v, out_dir)
    elif isinstance(v, (bool, np.bool_)):
        w.leaf("boolean", name=name, value=_fmt(v))
    elif isinstance(v, (int, np.integer)):
        w.leaf("integer", name=name, value=str(int(v)))
    elif isinstance(v, (float, np.floating)):
        w.leaf("float", name=name, value=_fmt(v))
    elif isinstance(v, str):
        w.leaf("string", name=name, value=v)
    elif isinstance(v, (list, tuple, np.ndarray)):
        a = np.asarray(v)
        if a.shape == (3,) and name in _POINT_KEYS:
            w.leaf("point", name=name, value=_fmt_vec(a))
        elif a.shape == (3,):
            w.leaf("rgb", name=name, value=_fmt_vec(a))
        elif a.shape == (2,) and name == "grid":
            w.leaf("string", name=name,
                   value=f"{int(a[0])}, {int(a[1])}")
        else:
            raise ValueError(
                f"cannot serialize array of shape {a.shape} for {name!r}"
                " inline — use a trimesh (written as a sidecar) or a"
                " filename")
    else:
        raise ValueError(f"cannot serialize {type(v)} for {name!r}")


_mesh_counter = [0]


def _write_object(w: _W, name, spec, out_dir, top=False):
    t = spec["type"]
    body = dict(spec)
    body.pop("type")
    oid = body.pop("_id", None) or (name if top else None)

    if t == "trimesh":
        # inline mesh arrays -> .serialized sidecar (reference exporter
        # writes PLY sidecars, python/xml.py subfolders['shape'])
        if out_dir is None:
            raise ValueError("trimesh shapes need an output path for "
                             "their .serialized sidecar")
        from ..loader.meshes import write_serialized
        _mesh_counter[0] += 1
        fn = f"mesh_{_mesh_counter[0]:03d}.serialized"
        v = np.asarray(body.pop("vertices"))
        f = np.asarray(body.pop("faces"))
        vn = body.pop("normals", None)
        uv = body.pop("uvs", None)
        body.pop("vertex_colors", None)
        mesh = dict(v=v, f=f)
        if vn is not None:
            mesh["vn"] = np.asarray(vn)
        if uv is not None:
            mesh["uv"] = np.asarray(uv)
        write_serialized(os.path.join(out_dir, fn), [mesh])
        body["filename"] = fn
        t = "serialized"

    tag = _tag_for(t, name)
    w.open(tag, type=t, name=None if top else name, id=oid)
    for k, v in body.items():
        if v is None:
            continue
        _write_value(w, k, v, out_dir)
    w.close(tag)


def dict_to_xml(scene: dict, path: str = None) -> str:
    """Serialize a scene dict to Mitsuba XML.

    ``path``: optional output .xml file; sidecar meshes are written
    next to it.  Returns the XML string."""
    assert scene.get("type") == "scene"
    out_dir = os.path.dirname(os.path.abspath(path)) if path else None
    w = _W()
    w.open("scene", version="3.0.0")
    for key, v in scene.items():
        if key == "type":
            continue
        if isinstance(v, dict) and "type" in v:
            _write_object(w, key, v, out_dir, top=True)
        else:
            _write_value(w, key, v, out_dir)
    w.close("scene")
    xml = "\n".join(w.lines) + "\n"
    if path:
        with open(path, "w") as fh:
            fh.write(xml)
    return xml
