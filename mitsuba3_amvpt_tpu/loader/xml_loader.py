"""Mitsuba-XML scene importer.

Replaces src/core/xml.cpp (1411 LoC): parses the Mitsuba scene XML
format — nested property tags, ``$key`` parameter substitution,
``<default>``, ``<ref id>``, ``<transform>`` chains — into the dict
format consumed by dict_loader (the dict format stays primary;
SURVEY.md §2.1 mapping).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np


def _subst(text, params):
    if text is None:
        return text
    for k, v in params.items():
        text = text.replace(f"${k}", str(v))
    return text


def _floats(s):
    s = s.replace(",", " ")
    return [float(x) for x in s.split()]


def _parse_transform(node, params):
    ops = []
    for child in node:
        tag = child.tag
        g = lambda a, d=None: _subst(child.get(a, d), params)  # noqa: E731
        if tag == "translate":
            if g("value") is not None:
                v = _floats(g("value"))
            else:
                v = [float(g("x", 0)), float(g("y", 0)), float(g("z", 0))]
            ops.append({"translate": v})
        elif tag == "scale":
            if g("value") is not None:
                vv = _floats(g("value"))
                v = vv if len(vv) == 3 else [vv[0]] * 3
            else:
                v = [float(g("x", 1)), float(g("y", 1)), float(g("z", 1))]
            ops.append({"scale": v})
        elif tag == "rotate":
            axis = ([float(g("x", 0)), float(g("y", 0)), float(g("z", 0))]
                    if g("value") is None else _floats(g("value")))
            ops.append({"rotate": {"axis": axis,
                                   "angle": float(g("angle", 0))}})
        elif tag in ("lookat", "look_at"):
            ops.append({"lookat": {
                "origin": _floats(g("origin")),
                "target": _floats(g("target")),
                "up": _floats(g("up", "0, 1, 0"))}})
        elif tag == "matrix":
            m = np.asarray(_floats(g("value")), np.float64)
            if m.size == 16:
                m = m.reshape(4, 4)
            elif m.size == 9:
                m4 = np.eye(4)
                m4[:3, :3] = m.reshape(3, 3)
                m = m4
            ops.append({"matrix": m.tolist()})
        else:
            raise ValueError(f"unknown transform op <{tag}>")
    return {"ops": ops}


def _parse_element(node, params, base_dir):
    """Convert an object element (scene/bsdf/shape/...) to a dict."""
    d = {"type": _subst(node.get("type"), params)}
    if node.get("id"):
        d["_id"] = node.get("id")
    for child in node:
        tag = child.tag
        name = _subst(child.get("name"), params)
        g = lambda a, dflt=None: _subst(child.get(a, dflt), params)  # noqa: E731
        if tag == "float":
            d[name] = float(g("value"))
        elif tag == "integer":
            d[name] = int(g("value"))
        elif tag == "boolean":
            d[name] = g("value").lower() == "true"
        elif tag == "string":
            val = g("value")
            if name in ("filename",) and not os.path.isabs(val):
                val = os.path.join(base_dir, val)
            d[name] = val
        elif tag == "rgb":
            v = _floats(g("value"))
            d[name] = v if len(v) == 3 else v[0]
        elif tag == "spectrum" and child.get("type"):
            # plugin-style spectrum object (<spectrum type="d65" .../>),
            # as stock Mitsuba 3 and utils/xml_writer.py emit
            d[name or child.get("id") or tag] = _parse_element(
                child, params, base_dir)
        elif tag == "spectrum":
            sval = g("value")
            if ":" in sval:  # wavelength:value pairs
                pairs = [p.split(":") for p in sval.replace(",", " ").split()]
                d[name] = {"type": "irregular",
                           "wavelengths": [float(p[0]) for p in pairs],
                           "values": [float(p[1]) for p in pairs]}
            else:
                d[name] = float(sval)
        elif tag in ("point", "vector"):
            if g("value") is not None:
                d[name] = _floats(g("value"))
            else:
                d[name] = [float(g("x", 0)), float(g("y", 0)),
                           float(g("z", 0))]
        elif tag == "transform":
            d[name] = _parse_transform(child, params)
        elif tag == "ref":
            d[name or f"_ref_{child.get('id')}"] = {
                "type": "ref", "id": child.get("id")}
        elif tag == "default":
            params.setdefault(child.get("name"), g("value"))
        elif tag in ("bsdf", "emitter", "sensor", "film", "sampler",
                     "shape", "texture", "rfilter", "integrator", "medium",
                     "phase", "volume", "spectrum_obj"):
            sub = _parse_element(child, params, base_dir)
            key = name or child.get("id") or tag
            d[key] = sub
        elif tag == "alias":
            pass  # aliases resolved by id at scene level
        else:
            raise ValueError(f"unknown XML tag <{tag}>")
    return d


def xml_to_dict(text: str = None, path: str = None, params: dict = None):
    """Parse Mitsuba XML (string or file) -> scene dict."""
    params = dict(params or {})
    base_dir = os.path.dirname(path) if path else "."
    if text is None:
        with open(path) as f:
            text = f.read()
    root = ET.fromstring(text)
    assert root.tag == "scene", "top-level element must be <scene>"
    # collect <default> first (xml.cpp handles them before substitution)
    for child in root:
        if child.tag == "default":
            params.setdefault(child.get("name"), child.get("value"))

    out = {"type": "scene"}
    counters = {}
    for child in root:
        if child.tag == "default":
            continue
        el = _parse_element(child, params, base_dir)
        key = el.pop("_id", None)
        if key is None:
            counters[child.tag] = counters.get(child.tag, 0) + 1
            key = f"{child.tag}_{counters[child.tag]}"
        out[key] = el
    return out


def load_file(path: str, params: dict = None, **kw):
    """mi.load_file equivalent (xml.h:56)."""
    from .dict_loader import load_dict
    return load_dict(xml_to_dict(path=path, params=params), **kw)


def load_string(text: str, params: dict = None, **kw):
    """mi.load_string equivalent (xml.h:64)."""
    from .dict_loader import load_dict
    return load_dict(xml_to_dict(text=text, params=params), **kw)
