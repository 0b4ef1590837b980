"""Scene construction from Mitsuba-style dicts.

Replaces the Properties/PluginManager/XML machinery of the reference
(src/core/xml.cpp 1411 LoC, src/core/plugin.cpp, src/core/properties.cpp)
with a thin Python loader: the same ``mi.load_dict`` scene description
format, compiled directly into the flat SoA arrays of render/scene.py.
XML import (for parity tests) lives in loader/xml_loader.py.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..accel.build import build_bvh, triangle_bounds
from ..core import math as m
from ..core.distr import DiscreteDistribution, Marginal2D
from ..render import film as film_mod
from ..render import sensor as sensor_mod
from ..render.bsdfs import registry as bsdf_reg
from ..render.scene import (E_AREA, E_CONSTANT, E_DIRECTIONAL, E_ENVMAP,
                            E_POINT, E_PROJECTOR, E_SPOT, EmitterTable,
                            GeometryArrays, Scene)
from ..render.texture import TextureTable
from . import meshes

# Named IOR presets (src/core/properties.cpp ior lookup / Mitsuba docs)
IOR = {"vacuum": 1.0, "air": 1.000277, "water": 1.3330, "glass": 1.5046,
       "bk7": 1.5046, "diamond": 2.419, "acrylic": 1.49,
       "polypropylene": 1.49, "ethanol": 1.361, "pet": 1.5750,
       "sapphire": 1.7682, "water ice": 1.31, "fused quartz": 1.458,
       "pyrex": 1.470, "bromine": 1.661, "amber": 1.55}

# Conductor eta/k RGB presets (fits of spectra shipped with Mitsuba)
CONDUCTORS = {
    "Au": ([0.1431, 0.3749, 1.4424], [3.9831, 2.3857, 1.6032]),
    "Ag": ([0.1553, 0.1163, 0.1381], [4.8283, 3.1222, 2.1457]),
    "Cu": ([0.2004, 0.9240, 1.1022], [3.9129, 2.4528, 2.1421]),
    "Al": ([1.3456, 0.9654, 0.6172], [7.4746, 6.3995, 5.3031]),
    "Cr": ([4.3696, 2.9167, 1.6547], [5.2080, 4.2311, 3.7505]),
    "Ni": ([2.3672, 1.6633, 1.4670], [4.4988, 3.0501, 2.3454]),
    "W": ([4.3707, 3.3002, 2.9982], [3.5006, 2.6045, 2.2731]),
    "none": ([0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),
}

_SHAPE_TYPES = ("rectangle", "cube", "disk", "cylinder", "sphere", "obj",
                "ply", "serialized", "trimesh", "blender", "instance",
                "merge", "shapegroup", "linearcurve", "bsplinecurve",
                "sdfgrid")

_BSDF_TYPE = {
    "diffuse": bsdf_reg.D_DIFFUSE,
    "conductor": bsdf_reg.D_CONDUCTOR,
    "roughconductor": bsdf_reg.D_ROUGHCONDUCTOR,
    "dielectric": bsdf_reg.D_DIELECTRIC,
    "roughdielectric": bsdf_reg.D_ROUGHDIELECTRIC,
    "plastic": bsdf_reg.D_PLASTIC,
    "roughplastic": bsdf_reg.D_ROUGHPLASTIC,
    "thindielectric": bsdf_reg.D_THINDIELECTRIC,
    "null": bsdf_reg.D_NULL,
    "principled": bsdf_reg.D_PRINCIPLED,
    "principledthin": bsdf_reg.D_PRINCIPLEDTHIN,
    "pplastic": bsdf_reg.D_PPLASTIC,
    "polarizer": bsdf_reg.D_POLARIZER,
    "retarder": bsdf_reg.D_RETARDER,
    "circular": bsdf_reg.D_CIRCULAR,
    "measured": bsdf_reg.D_MEASURED,
    "hair": bsdf_reg.D_HAIR,
    "measured_polarized": bsdf_reg.D_MEASURED_POL,
}


def _spectrum3(v, default=0.5):
    """Any scalar/list/rgb-dict spectrum value -> np (3,)."""
    if v is None:
        v = default
    if isinstance(v, dict):
        t = v.get("type")
        if t == "rgb":
            v = v["value"]
        elif t in ("uniform", "d65"):
            v = v.get("value", v.get("scale", 1.0))
        elif t == "blackbody":
            v = _blackbody_rgb(v.get("temperature", 6500.0)) * v.get("scale", 1.0)
        elif t in ("regular", "irregular", "spectrum"):
            v = _tabulated_spectrum_rgb(v)
        else:
            v = v.get("value", default)
    if isinstance(v, str) and ":" in v:
        # "wl0:v0, wl1:v1, ..." inline spectrum string (xml.cpp spectra)
        pairs = [p.split(":") for p in v.replace(",", " ").split()]
        v = _tabulated_spectrum_rgb(dict(
            type="irregular",
            wavelengths=[float(p[0]) for p in pairs],
            values=[float(p[1]) for p in pairs]))
    a = np.asarray(v, np.float64).reshape(-1)
    if a.size == 1:
        a = np.repeat(a, 3)
    return a[:3]


def _edge_table(verts, faces):
    from ..ad.projective import build_edge_table
    return build_edge_table(verts, faces)


def _tabulated_spectrum_rgb(spec):
    """regular/irregular tabulated spectrum -> linear sRGB reflectance
    (src/spectra/{regular,irregular}.cpp; RGB-variant conversion =
    CIE-integration against D65, spectrum.cpp spectrum_list_to_srgb)."""
    from ..core import spectrum as S

    def _floats(x):
        if isinstance(x, str):
            return np.asarray([float(t) for t in
                               x.replace(",", " ").split()], np.float64)
        return np.asarray(x, np.float64).reshape(-1)

    values = _floats(spec.get("values", spec.get("value", 1.0)))
    if "wavelengths" in spec:
        wl = _floats(spec["wavelengths"])
    else:
        lo = float(spec.get("lambda_min", spec.get("wavelength_min", 360.0)))
        hi = float(spec.get("lambda_max", spec.get("wavelength_max", 830.0)))
        wl = np.linspace(lo, hi, max(values.size, 2))
    if values.size == 1:
        values = np.repeat(values, wl.size)

    grid = np.linspace(360.0, 830.0, 236)
    sv = np.interp(grid, wl, values, left=0.0, right=0.0)
    import jax.numpy as jnp
    xyz_bar = np.asarray(S.cie1931_xyz(jnp.asarray(grid)))
    d65 = np.asarray(S.cie_d65(jnp.asarray(grid)))
    num = (xyz_bar * (sv * d65)[:, None]).sum(0)
    # normalize against the SAME fitted observer's white point so a
    # flat unit reflectance maps exactly to sRGB (1,1,1) — the analytic
    # CIE/D65 fits carry a few percent of per-channel bias otherwise
    white = (xyz_bar * d65[:, None]).sum(0)
    d65_xyz = np.array([0.95047, 1.0, 1.08883])
    xyz = num / np.maximum(white, 1e-12) * d65_xyz
    rgb = np.asarray(S.xyz_to_srgb(jnp.asarray(xyz)))
    return np.clip(rgb, 0.0, None)


def _blackbody_rgb(temp_k):
    """Planck spectrum -> linear sRGB (rough; src/spectra/blackbody.cpp)."""
    wl = np.linspace(380e-9, 730e-9, 64)
    h, c, kb = 6.626e-34, 2.998e8, 1.381e-23
    p = (2 * h * c * c / wl ** 5) / (np.exp(h * c / (wl * kb * temp_k)) - 1.0)
    p = p / p.max()
    from ..core.spectrum import cie1931_xyz, xyz_to_srgb
    xyz = np.asarray(cie1931_xyz(jnp.asarray(wl * 1e9)))
    XYZ = (p[:, None] * xyz).sum(0)
    rgb = np.asarray(xyz_to_srgb(jnp.asarray(XYZ / max(XYZ[1], 1e-9))))
    return np.clip(rgb, 0.0, None)


def _to_world(v):
    """Transform spec -> 4x4 numpy (accepts matrix, dict with lookat /
    translate / scale / rotate chains, or None)."""
    if v is None:
        return np.eye(4)
    if isinstance(v, np.ndarray):
        return np.asarray(v, np.float64).reshape(4, 4)
    if isinstance(v, (list, tuple)):
        a = np.asarray(v, np.float64)
        if a.shape == (4, 4):
            return a
        raise ValueError("matrix to_world must be 4x4")
    if isinstance(v, dict):
        # {"type": "lookat", "origin": ..., "target": ...} spelling
        if v.get("type") in ("lookat", "look_at"):
            return m.look_at(v["origin"], v["target"],
                             v.get("up", [0, 1, 0]))
        ops = v.get("ops")
        if ops is None:
            ops = []
            for key in ("translate", "rotate", "scale", "lookat", "look_at", "matrix"):
                if key in v:
                    ops.append({key: v[key]})
            if not ops:
                raise ValueError(f"unrecognized to_world dict {v!r}: "
                                 "expected 'ops' chain, lookat/translate/"
                                 "rotate/scale/matrix keys, or "
                                 "{'type': 'lookat', ...}")
        mtx = np.eye(4)
        for op in ops:
            (key, val), = op.items()
            if key == "translate":
                t = m.translate(val)
            elif key == "scale":
                t = m.scale(val)
            elif key == "rotate":
                t = m.rotate(val.get("axis", [0, 0, 1]), val.get("angle", 0.0))
            elif key in ("lookat", "look_at"):
                t = m.look_at(val["origin"], val["target"], val.get("up", [0, 1, 0]))
            elif key == "matrix":
                t = np.asarray(val, np.float64).reshape(4, 4)
            else:
                raise ValueError(f"unknown transform op {key}")
            mtx = t @ mtx
        return mtx
    raise ValueError(f"bad to_world {v!r}")


class _Builder:
    def __init__(self):
        self.verts = []          # list of (V,3)
        self.faces = []
        self.vns = []
        self.vuvs = []
        self.vtans = []          # per-vertex fiber tangents (curves)
        self.vcols = []          # per-vertex attribute (vertex colors)
        self.has_vcols = False
        self.has_tangents = False
        self.face_hasvn = []
        self.face_hasuv = []
        self.tri_shape = []
        self.v_off = 0
        self.sph_center = []
        self.sph_radius = []
        self.sph_shape = []
        self.shape_mat = []
        self.shape_em = []
        self.shape_interior = []
        self.shape_exterior = []
        self.media = []          # list of medium row dicts
        self.med_cache = {}
        self.volumes = []        # list of (grid ndarray, to_world) tuples
        self.camera_medium = -1
        self.n_shapes = 0
        self.materials = []      # list of dict rows
        self.mat_cache = {}
        self.named_bsdfs = {}    # scene-dict key -> material index ('ref' ids)
        self.textures = []       # list of images
        self.emitters = []       # list of dict rows
        self.sensor = None
        self.film = None
        self.integrator = {}
        self.accel = "auto"
        self.shapegroups = {}    # id -> list of child shape specs
        self.sensor_shape = -1   # shape id carrying an irradiancemeter
        self.measured_tables = []   # MeasuredBSDF pytrees (bsdf type 17)
        self.measured_cache = {}    # filename -> index
        self.measured_pol_tables = []  # MeasuredPolarizedBSDF (type 19)
        self.measured_pol_cache = {}
        self.sdf_specs = []         # sdfgrid shape specs (render/sdf.py)
        self.distant_spec = None  # deferred distant sensor (needs bbox)
        # TRUE instancing (src/shapes/instance.cpp semantics): mesh
        # children of a shapegroup are stored ONCE in group-local
        # template arrays; each instance adds only a transform row.
        # Sphere children stay baked (one row per instance is already
        # O(unique)).  Emitters/sensors inside groups are rejected
        # (instance.cpp:48).
        self._tmpl_sink = None    # active template collector or None
        self.tmpl = dict(verts=[], faces=[], vns=[], vuvs=[],
                         hasvn=[], hasuv=[], tri_shape=[], v_off=0)
        self.groups = {}          # gid -> dict(f0, fc, spheres=[...])
        self.instances = []       # dicts(to_world, gid)

    # ---------------- textures ----------------

    def add_texture_image(self, img):
        self.textures.append(np.asarray(img, np.float32))
        return len(self.textures) - 1

    def resolve_texture(self, v):
        """Texture spec -> (constant rgb, tex_id)."""
        if isinstance(v, dict) and v.get("type") == "bitmap":
            img = v.get("data")
            if img is None:
                from ..core.bitmap import read_image
                img = read_image(v["filename"])
                if v.get("raw", False) is False and img.dtype == np.uint8:
                    pass
            tid = self.add_texture_image(img)
            return np.ones(3), tid
        if isinstance(v, dict) and v.get("type") == "mesh_attribute":
            # vertex-attribute-driven texture
            # (src/textures/mesh_attribute.cpp): barycentric-interpolated
            # per-vertex values evaluated at the shading point; sentinel
            # tex id -2 routes _gather_params to si.vattr.  Only the
            # "vertex_color" attribute is materialized (the common use);
            # `scale` multiplies like the reference prop
            return np.full(3, float(v.get("scale", 1.0))), -2
        if isinstance(v, dict) and v.get("type") == "checkerboard":
            c0 = _spectrum3(v.get("color0", 0.4))
            c1 = _spectrum3(v.get("color1", 0.2))
            res = int(v.get("res", 64))
            yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
            mask = ((xx * 2 // res + yy * 2 // res) % 2) == 0
            img = np.where(mask[..., None], c0, c1).astype(np.float32)
            tid = self.add_texture_image(img)
            return np.ones(3), tid
        return _spectrum3(v), -1

    # ---------------- bsdfs ----------------

    def add_bsdf(self, spec, name=None) -> int:
        if spec is None:
            spec = {"type": "diffuse"}
        if isinstance(spec, dict) and spec.get("type") == "ref":
            return self.named_bsdfs[spec["id"]]
        key = id(spec) if isinstance(spec, dict) else spec
        if key in self.mat_cache:
            idx = self.mat_cache[key]
        else:
            row = self._bsdf_row(spec)
            self.materials.append(row)
            idx = len(self.materials) - 1
            self.mat_cache[key] = idx
        if name is not None:
            self.named_bsdfs[name] = idx
        return idx

    def _bsdf_row(self, spec):
        twosided = False
        normal_tex = bump_tex = -1
        while True:
            t0 = spec.get("type")
            if t0 == "twosided":
                twosided = True
            elif t0 == "normalmap":
                nm = spec.get("normalmap")
                if nm is not None:
                    _, normal_tex = self.resolve_texture(nm)
            elif t0 == "bumpmap":
                bm = spec.get("texture", spec.get("bumpmap"))
                if bm is not None:
                    _, bump_tex = self.resolve_texture(bm)
            elif t0 in ("mask", "blendbsdf"):
                return self._wrapper_row(spec, twosided, normal_tex,
                                         bump_tex)
            else:
                break
            inner = spec.get("bsdf")
            if inner is None:
                inner = next((v for k, v in spec.items()
                              if isinstance(v, dict) and "type" in v
                              and k not in ("normalmap", "bumpmap", "texture")),
                             {"type": "diffuse"})
            spec = inner
        t = spec["type"]
        if t not in _BSDF_TYPE:
            raise ValueError(f"unsupported bsdf type {t!r}")
        mtype = _BSDF_TYPE[t]

        albedo, albedo_tex = np.array([0.5] * 3), -1
        if t == "diffuse":
            albedo, albedo_tex = self.resolve_texture(spec.get("reflectance", 0.5))
        if t in ("plastic", "roughplastic", "pplastic"):
            albedo, albedo_tex = self.resolve_texture(
                spec.get("diffuse_reflectance", 0.5))
        if t in ("principled", "principledthin"):
            albedo, albedo_tex = self.resolve_texture(
                spec.get("base_color", 0.5))

        alpha = np.array([0.1, 0.1])
        if t == "pplastic":    # pplastic.cpp:133 default alpha 0.06
            alpha = np.array([0.06, 0.06])
        alpha_tex = -1
        if "alpha" in spec:
            a = spec["alpha"]
            if isinstance(a, dict):
                _, alpha_tex = self.resolve_texture(a)
                alpha = np.array([0.1, 0.1])
            else:
                alpha = np.array([float(a), float(a)])
        if "alpha_u" in spec:
            alpha = np.array([float(spec["alpha_u"]),
                              float(spec.get("alpha_v", spec["alpha_u"]))])
        if "roughness" in spec:  # principled parameterizes by roughness
            r = spec["roughness"]
            if isinstance(r, dict):
                _, alpha_tex = self.resolve_texture(r)
                alpha = np.array([0.5, 0.5])
            else:
                alpha = np.array([float(r), float(r)])

        if t in ("polarizer", "retarder", "circular"):
            # transmittance rides in the albedo slot; angles in extra
            albedo = _spectrum3(spec.get("transmittance", 1.0))

        meas_idx = -1
        if t == "measured_polarized":
            # RGL pBSDF Mueller tensor (measured_polarized.cpp); in the
            # scalar RGB pipeline a fixed `wavelength` may override the
            # per-channel (620/550/465 nm) reads
            fname = spec["filename"]
            key = (fname, float(spec.get("alpha_sample", 0.1)),
                   float(spec.get("wavelength", -1.0)))
            meas_idx = self.measured_pol_cache.get(key, -1)
            if meas_idx < 0:
                from ..render.bsdfs.measured_polarized import \
                    MeasuredPolarizedBSDF
                self.measured_pol_tables.append(
                    MeasuredPolarizedBSDF.from_file(
                        fname, alpha_sample=key[1], wavelength=key[2]))
                meas_idx = len(self.measured_pol_tables) - 1
                self.measured_pol_cache[key] = meas_idx
            alpha = np.array([key[1], key[1]])   # eval_roughness parity
        if t == "measured":
            # RGL tensor file; table stored on the scene, row points at
            # it via child_a (measured.cpp plugin)
            fname = spec["filename"]
            meas_idx = self.measured_cache.get(fname, -1)
            if meas_idx < 0:
                from ..render.bsdfs.measured import MeasuredBSDF
                self.measured_tables.append(MeasuredBSDF.from_file(fname))
                meas_idx = len(self.measured_tables) - 1
                self.measured_cache[fname] = meas_idx
            alpha = np.array([0.5, 0.5])   # eval_roughness parity

        # principled extras (src/bsdfs/principled.cpp property set);
        # for polarization elements: extra[0] = theta (deg),
        # extra[1] = retardance delta (deg), extra[2] = left_handed
        extra = np.zeros(10)
        if t == "hair":
            # hair.cpp:155-199 + update():544-563: precompute the
            # longitudinal variances / azimuthal logistic scale; sigma_a
            # (pigmentation-mixed) rides in the albedo slot
            lr = float(spec.get("longitudinal_roughness", 0.3))
            ar = float(spec.get("azimuthal_roughness", 0.3))
            if not (0.0 <= lr <= 1.0) or not (0.0 <= ar <= 1.0):
                raise ValueError("hair roughness must be in [0, 1]")
            v0 = (0.726 * lr + 0.812 * lr ** 2 + 3.7 * lr ** 20) ** 2
            extra[0:3] = [v0, 0.25 * v0, 4.0 * v0]
            extra[3] = np.sqrt(np.pi / 8.0) * (
                0.265 * ar + 1.194 * ar ** 2 + 5.372 * ar ** 22)
            extra[4] = np.deg2rad(float(spec.get("scale_tilt", 2.0)))
            if "sigma_a" in spec:
                albedo, albedo_tex = self.resolve_texture(spec["sigma_a"])
                albedo = albedo * float(spec.get("scale", 1.0))
            else:   # melanin pigmentation (hair.cpp:740-760)
                eu = float(spec.get("eumelanin", 1.3))
                ph = float(spec.get("pheomelanin", 0.2))
                albedo = (eu * np.array(bsdf_reg._EUMELANIN_SIGMA_A)
                          + ph * np.array(bsdf_reg._PHEOMELANIN_SIGMA_A))
            # int_ior amber / ext_ior air (hair.cpp:167-169)
            spec = dict(spec, int_ior=spec.get("int_ior", "amber"))
            alpha = np.array([np.sqrt(0.5 * (lr * lr + ar * ar))] * 2)
        if t in ("polarizer", "retarder", "circular"):
            extra[0] = float(_spectrum3(spec.get("theta", 0.0)).mean())
            extra[1] = float(_spectrum3(spec.get("delta", 90.0)).mean())
            extra[2] = 1.0 if spec.get("left_handed", False) else 0.0
        if t in ("principled", "principledthin"):
            extra = np.array([
                float(spec.get("metallic", 0.0)),
                float(spec.get("spec_tint", 0.0)),
                float(spec.get("sheen", 0.0)),
                float(spec.get("sheen_tint", 0.0)),
                float(spec.get("clearcoat", 0.0)),
                float(spec.get("clearcoat_gloss", 1.0)),
                float(spec.get("anisotropic", 0.0)),
                float(spec.get("flatness", 0.0)),
                float(spec.get("spec_trans", 0.0)),
                float(spec.get("diff_trans", 0.0))])   # thin only, in [0,2]

        def ior_of(v, default):
            if isinstance(v, str):
                return IOR[v]
            return float(v) if v is not None else default

        eta_c = np.zeros(3)
        k_c = np.ones(3)
        if t in ("conductor", "roughconductor"):
            mat_name = spec.get("material", "none")
            if "eta" in spec and not isinstance(spec["eta"], str):
                eta_c = _spectrum3(spec["eta"])
                k_c = _spectrum3(spec.get("k", 1.0))
            else:
                eta_c, k_c = map(np.asarray, CONDUCTORS[mat_name])

        int_ior = ior_of(spec.get("int_ior"), 1.5046)
        ext_ior = ior_of(spec.get("ext_ior"), 1.000277)
        if t in ("plastic", "roughplastic"):
            int_ior = ior_of(spec.get("int_ior"), 1.49)
        if t == "pplastic":   # polypropylene default (pplastic.cpp:159)
            int_ior = ior_of(spec.get("int_ior"), 1.49)
        eta = int_ior / ext_ior
        if "eta" in spec and t in ("dielectric", "roughdielectric",
                                   "thindielectric"):
            v = spec["eta"]
            eta = IOR[v] if isinstance(v, str) else float(v)

        spec_refl = _spectrum3(spec.get("specular_reflectance", 1.0))
        spec_trans = _spectrum3(spec.get("specular_transmittance", 1.0))

        from ..core.fresnel import fresnel_diffuse_reflectance
        fdr = float(fresnel_diffuse_reflectance(jnp.asarray(1.0 / eta)))
        d_mean = float(np.mean(albedo))
        s_mean = float(np.mean(spec_refl))
        sw = s_mean / max(d_mean + s_mean, 1e-9)

        if t == "principled":
            # principled specular strength via 'specular' or eta
            specular = float(spec.get("specular", 0.5))
            f0 = 0.08 * specular
            eta = (1.0 + np.sqrt(min(f0, 0.99))) / max(1.0 - np.sqrt(min(f0, 0.99)), 1e-3) \
                if "specular" in spec else float(spec.get("eta", 1.5))
            # refraction needs eta != 1 (principled.cpp:223)
            if extra[8] > 0.0 and abs(eta - 1.0) < 1e-3:
                eta = 1.001
        elif t == "principledthin":
            eta = float(spec.get("eta", 1.5))   # principledthin.cpp:178

        return dict(mtype=mtype, albedo=albedo, albedo_tex=albedo_tex,
                    alpha=alpha, alpha_tex=alpha_tex, eta_c=eta_c, k_c=k_c,
                    eta=eta, spec_refl=spec_refl, spec_trans=spec_trans,
                    twosided=twosided, fdr_int=fdr, spec_weight=sw,
                    extra=extra, normal_tex=normal_tex, bump_tex=bump_tex,
                    child_a=meas_idx, child_b=-1)

    def _wrapper_row(self, spec, twosided, normal_tex, bump_tex):
        """blendbsdf / mask rows (src/bsdfs/{blendbsdf,mask}.cpp):
        children are separate material rows referenced by index."""
        t = spec["type"]
        nested = [v for k, v in spec.items()
                  if isinstance(v, dict) and "type" in v
                  and k not in ("weight", "opacity")
                  and (v.get("type") in _BSDF_TYPE
                       or v.get("type") in ("twosided", "normalmap",
                                            "bumpmap", "mask", "blendbsdf",
                                            "ref"))]
        if t == "blendbsdf":
            wspec = spec.get("weight", 0.5)
            child_a = self.add_bsdf(nested[0] if nested else None)
            child_b = self.add_bsdf(nested[1] if len(nested) > 1 else None)
            mtype = bsdf_reg.D_BLEND
        else:  # mask
            wspec = spec.get("opacity", 0.5)
            child_a = self.add_bsdf(nested[0] if nested else None)
            child_b = self.add_bsdf({"type": "null"})
            mtype = bsdf_reg.D_MASK
        wval, wtex = self.resolve_texture(wspec)
        w0 = float(np.mean(wval))
        return dict(mtype=mtype, albedo=np.array([w0, w0, w0]),
                    albedo_tex=wtex, alpha=np.array([0.1, 0.1]),
                    alpha_tex=-1, eta_c=np.zeros(3), k_c=np.ones(3),
                    eta=1.5, spec_refl=np.ones(3), spec_trans=np.ones(3),
                    twosided=twosided, fdr_int=0.0, spec_weight=0.5,
                    extra=np.zeros(10), normal_tex=normal_tex,
                    bump_tex=bump_tex, child_a=child_a, child_b=child_b)

    # ---------------- media ----------------

    def add_volume(self, spec, to_world=None) -> int:
        """Volume grid (src/volumes/{gridvolume,constvolume}.cpp); returns
        a volume id into the scene's VolumeGridTable, or -1 for constant
        volumes (the caller keeps the constant in the medium row)."""
        t = spec.get("type", "gridvolume")
        tw = _to_world(spec.get("to_world")) if spec.get("to_world") is not None \
            else np.eye(4)
        if to_world is not None:
            tw = np.asarray(to_world, np.float64) @ tw
        if t == "constvolume":
            return -1
        if t != "gridvolume":
            raise ValueError(f"unsupported volume type {t!r}")
        if "grid" in spec:
            data = np.asarray(spec["grid"], np.float32)
            bbox_tw = np.eye(4)
        else:
            from ..render.volume import read_vol
            data, bbox_tw = read_vol(spec["filename"])
        self.volumes.append((data, tw @ bbox_tw))
        return len(self.volumes) - 1

    def _phase_row(self, phase) -> dict:
        """Phase-function columns of a medium row
        (src/phase/{isotropic,hg,rayleigh,tabphase,blendphase,sggx}.cpp).
        blendphase nested lobes are restricted to iso/hg/rayleigh; the
        sggx 'S' parameter supports constant 6-vectors (grid-valued S is
        tracked as a gap)."""
        from ..render.medium import (P_BLEND, P_HG, P_ISOTROPIC, P_RAYLEIGH,
                                     P_SGGX, P_TAB, TAB_K)
        simple = {"isotropic": P_ISOTROPIC, "hg": P_HG,
                  "rayleigh": P_RAYLEIGH}
        row = dict(phase_type=P_ISOTROPIC, g=0.0, phase_type2=P_ISOTROPIC,
                   g2=0.0, phase_type3=P_ISOTROPIC, g3=0.0, blend_w=0.5,
                   tab_pdf=np.full(TAB_K, 0.5, np.float32),
                   tab_cdf=np.linspace(0.0, 1.0, TAB_K, dtype=np.float32),
                   sggx_s=np.array([1, 1, 1, 0, 0, 0], np.float32))
        t = phase.get("type", "isotropic")
        if t in simple:
            row["phase_type"] = simple[t]
            row["g"] = float(phase.get("g", 0.0))
        elif t == "tabphase":
            v = phase.get("values", "0.5, 0.5")
            if isinstance(v, str):
                v = [float(x) for x in v.replace(",", " ").split()]
            v = np.asarray(v, np.float64)
            # resample onto TAB_K uniform nodes over cos theta in [-1,1]
            xs = np.linspace(-1.0, 1.0, len(v))
            xk = np.linspace(-1.0, 1.0, TAB_K)
            pdf = np.interp(xk, xs, v)
            # trapezoid CDF + normalization (distr_1d.h ContinuousDistribution)
            dx = 2.0 / (TAB_K - 1)
            seg = 0.5 * (pdf[1:] + pdf[:-1]) * dx
            cdf = np.concatenate([[0.0], np.cumsum(seg)])
            total = max(cdf[-1], 1e-20)
            row["phase_type"] = P_TAB
            row["tab_pdf"] = (pdf / total).astype(np.float32)
            row["tab_cdf"] = (cdf / total).astype(np.float32)
        elif t == "blendphase":
            nested = [v for v in phase.values()
                      if isinstance(v, dict) and v.get("type") in simple]
            if len(nested) != 2:
                raise ValueError("blendphase needs two nested simple "
                                 "(isotropic/hg/rayleigh) phase functions")
            row["phase_type"] = P_BLEND
            row["phase_type2"] = simple[nested[0]["type"]]
            row["g2"] = float(nested[0].get("g", 0.0))
            row["phase_type3"] = simple[nested[1]["type"]]
            row["g3"] = float(nested[1].get("g", 0.0))
            row["blend_w"] = float(np.clip(phase.get("weight", 0.5), 0, 1))
        elif t == "sggx":
            s = phase.get("S", [1, 1, 1, 0, 0, 0])
            if isinstance(s, dict):
                s = s.get("value", [1, 1, 1, 0, 0, 0])
            if isinstance(s, str):
                s = [float(x) for x in s.replace(",", " ").split()]
            row["phase_type"] = P_SGGX
            row["sggx_s"] = np.asarray(s, np.float32).reshape(6)
        else:
            raise ValueError(f"unsupported phase type {t!r}")
        return row

    def add_medium(self, spec) -> int:
        """Medium row (src/media/{homogeneous,heterogeneous}.cpp)."""
        if spec is None:
            return -1
        key = id(spec)
        if key in self.med_cache:
            return self.med_cache[key]
        t = spec.get("type", "homogeneous")
        if t not in ("homogeneous", "heterogeneous"):
            raise ValueError(f"unsupported medium type {t!r}")
        density_vol = -1
        albedo_vol = -1
        dens_max = 1.0

        def resolve_vol(v, default):
            """A volume-valued medium property: dict volume spec, scalar,
            or rgb triple.  Returns (constant (3,), volume id, max)."""
            nonlocal_max = 1.0
            if isinstance(v, dict) and v.get("type") in ("gridvolume",
                                                         "constvolume"):
                if v.get("type") == "constvolume":
                    return _spectrum3(v.get("value", default)), -1, 1.0
                vid = self.add_volume(v)
                data = self.volumes[vid][0]
                nonlocal_max = float(np.max(data))
                return np.ones(3), vid, nonlocal_max
            return _spectrum3(v if v is not None else default), -1, 1.0

        if t == "heterogeneous" or isinstance(spec.get("sigma_t"), dict):
            st_c, density_vol, dens_max = resolve_vol(
                spec.get("sigma_t"), 1.0)
            sigma_t = st_c
            albedo, albedo_vol, _ = resolve_vol(spec.get("albedo"), 0.75)
        else:
            sigma_t = _spectrum3(spec.get("sigma_t", 1.0))
            if "sigma_s" in spec or "sigma_a" in spec:
                ss = _spectrum3(spec.get("sigma_s", 0.0))
                sa = _spectrum3(spec.get("sigma_a", 0.0))
                sigma_t = ss + sa
                albedo = ss / np.maximum(sigma_t, 1e-20)
            else:
                albedo = _spectrum3(spec.get("albedo", 0.75))
        phase = spec.get("phase", {"type": "isotropic"})
        prow = self._phase_row(phase)
        scale = float(spec.get("scale", 1.0))
        self.media.append(dict(
            sigma_t=sigma_t, albedo=albedo, scale=scale,
            density_vol=density_vol, albedo_vol=albedo_vol,
            majorant=float(np.max(sigma_t)) * scale * dens_max, **prow))
        idx = len(self.media) - 1
        self.med_cache[key] = idx
        return idx

    # ---------------- shapes ----------------

    def add_shape(self, spec, parent_tw=None):
        t = spec["type"]
        if t == "shapegroup":
            # deferred definition (src/shapes/shapegroup.cpp): children are
            # only instantiated through `instance` references
            return
        if t == "merge":
            # merge container (src/shapes/merge.cpp): flatten children
            for v in spec.values():
                if isinstance(v, dict) and v.get("type") in _SHAPE_TYPES:
                    self.add_shape(v, parent_tw)
            return
        if t == "instance":
            gid = spec.get("shapegroup", {})
            if isinstance(gid, dict):
                gid = gid.get("id")
            tw_i = _to_world(spec.get("to_world"))
            if parent_tw is not None:
                tw_i = parent_tw @ tw_i
            if gid not in self.groups:
                # first reference: build the group's mesh TEMPLATE once
                # (group-local space); spheres recorded for per-instance
                # baking
                rec = dict(spheres=[])
                rec["f0"] = sum(len(f) for f in self.tmpl["faces"])
                rec["v0"] = sum(len(v) for v in self.tmpl["verts"])
                self._tmpl_sink = rec
                for child in self.shapegroups.get(gid, []):
                    self.add_shape(child, None)
                self._tmpl_sink = None
                rec["fc"] = sum(len(f) for f in self.tmpl["faces"]) \
                    - rec["f0"]
                rec["vc"] = sum(len(v) for v in self.tmpl["verts"]) \
                    - rec["v0"]
                self.groups[gid] = rec
            rec = self.groups[gid]
            if rec["fc"] > 0:
                self.instances.append(dict(to_world=tw_i, gid=gid))
            for c_local, r, sid in rec["spheres"]:
                c = (tw_i[:3, :3] @ c_local) + tw_i[:3, 3]
                sc = float(np.cbrt(abs(np.linalg.det(tw_i[:3, :3]))))
                self.sph_center.append(np.asarray(c))
                self.sph_radius.append(r * sc)
                self.sph_shape.append(sid)
            return
        tw = _to_world(spec.get("to_world"))
        if parent_tw is not None:
            tw = parent_tw @ tw
        shape_id = self.n_shapes
        self.n_shapes += 1

        bsdf_spec = spec.get("bsdf")
        if bsdf_spec is None:
            bsdf_spec = next(
                (v for k, v in spec.items()
                 if isinstance(v, dict)
                 and v.get("type") in (*_BSDF_TYPE, "twosided", "ref",
                                       "mask", "blendbsdf", "normalmap",
                                       "bumpmap")
                 and k != "emitter"),
                None)
        mat_idx = self.add_bsdf(bsdf_spec)
        self.shape_mat.append(mat_idx)
        self.shape_interior.append(self.add_medium(spec.get("interior")))
        self.shape_exterior.append(self.add_medium(spec.get("exterior")))

        # shape-attached irradiancemeter (irradiancemeter.cpp: the sensor
        # is declared as a child of the shape it measures)
        sensor_spec = next(
            (v for v in spec.values()
             if isinstance(v, dict) and v.get("type") == "irradiancemeter"),
            None)
        if sensor_spec is not None:
            self.sensor_shape = shape_id
            self.add_sensor(dict(sensor_spec, type="_surface"))

        em_spec = spec.get("emitter")
        if em_spec is None:
            em_spec = next((v for v in spec.values()
                            if isinstance(v, dict) and v.get("type") == "area"), None)
        if self._tmpl_sink is not None and (em_spec is not None
                                            or sensor_spec is not None):
            # reference parity: "Shape groups cannot be used to
            # replicate shapes with attached emitters, sensors, or
            # ..." (src/shapes/instance.cpp:48)
            raise ValueError("shapegroup children cannot carry "
                             "emitters or sensors (instance.cpp:48)")
        if em_spec is not None:
            rad, tex = self.resolve_texture(em_spec.get("radiance", 1.0))
            self.emitters.append(dict(
                e_type=E_AREA, radiance=rad, tex=tex, to_world=np.eye(4),
                shape=shape_id, params=np.zeros(4),
                weight=float(em_spec.get("sampling_weight", 1.0))))
            self.shape_em.append(len(self.emitters) - 1)
        else:
            self.shape_em.append(-1)

        if t == "sdfgrid":
            # SDF grid shape (src/shapes/sdfgrid.cpp): samples from an
            # inline array or a Mitsuba .vol file; no area sampling ->
            # emitter attachment unsupported (parity with the reference,
            # which implements no sample_position)
            if em_spec is not None:
                raise ValueError("sdfgrid cannot carry an area emitter")
            if "grid" in spec:
                data = np.asarray(spec["grid"], np.float32)
            else:
                from ..render.volume import read_vol
                data = read_vol(spec["filename"])
                if data.ndim == 4:
                    data = data[..., 0]
            self.sdf_specs.append(
                dict(data=data, to_world=tw, shape_index=shape_id,
                     normal_mode=spec.get("normals", "smooth")))
            return

        if t == "sphere":
            c = np.asarray(spec.get("center", [0, 0, 0]), np.float64)
            r = float(spec.get("radius", 1.0))
            c = m.transform_point(jnp.asarray(tw), jnp.asarray(c))
            sc = float(np.cbrt(abs(np.linalg.det(tw[:3, :3])))) if tw is not None else 1.0
            if self._tmpl_sink is not None:
                # sphere group child: baked per instance (O(1) each)
                self._tmpl_sink["spheres"].append(
                    (np.asarray(c, np.float64), r * sc, shape_id))
                return
            self.sph_center.append(np.asarray(c))
            self.sph_radius.append(r * sc)
            self.sph_shape.append(shape_id)
            return

        vt = None     # per-vertex fiber tangents (curve shapes only)
        vcol = None   # per-vertex colors (trimesh "vertex_colors")
        if t == "rectangle":
            # flat prims: vertex normals equal the geometric normal, so
            # storing them only widens the SI gather — drop them
            v, f, _, uv = meshes.rectangle()
            vn = None
        elif t == "cube":
            v, f, _, uv = meshes.cube()
            vn = None
        elif t == "disk":
            v, f, _, uv = meshes.disk()
            vn = None
        elif t == "cylinder":
            v, f, vn, uv = meshes.cylinder()
        elif t == "obj":
            v, f, vn, uv = meshes.load_obj(spec["filename"])
            if not spec.get("face_normals", False) and vn is None:
                vn = _smooth_normals(v, f)
        elif t == "ply":
            v, f, vn, uv = meshes.load_ply(spec["filename"])
            if not spec.get("face_normals", False) and vn is None:
                vn = _smooth_normals(v, f)
        elif t == "serialized":
            v, f, vn, uv = meshes.load_serialized(
                spec["filename"], int(spec.get("shape_index", 0)))
            if not spec.get("face_normals", False) and vn is None:
                vn = _smooth_normals(v, f)
        elif t in ("linearcurve", "bsplinecurve"):
            # curve tube tessellation (loader/curves.py); to_world acts
            # on control points, radii invariant -> bake is identity
            from . import curves as _curves
            v, f, vn, uv, vt = _curves.load_curves(
                spec["filename"],
                kind="linear" if t == "linearcurve" else "bspline",
                subdiv=int(spec.get("subdiv", 4)),
                radial=int(spec.get("radial", 8)),
                to_world=tw)
            tw = np.eye(4)
        elif t in ("trimesh", "blender"):
            if t == "blender":
                # Blender-exporter pointer mesh (blender.cpp:443)
                from .blender import load_blender_mesh
                spec = dict(spec, **load_blender_mesh(spec))
            v = np.asarray(spec["vertices"], np.float64)
            f = np.asarray(spec["faces"], np.int32)
            vn = spec.get("normals")
            uv = spec.get("uvs")
            vcol = spec.get("vertex_colors")
        else:
            raise ValueError(f"unsupported shape type {t!r}")
        if spec.get("face_normals", False):
            vn = None

        # bake to_world
        v_w = (tw[:3, :3] @ v.T).T + tw[:3, 3]
        nrm_mat = np.linalg.inv(tw[:3, :3]).T
        vn_w = None if vn is None else (nrm_mat @ np.asarray(vn).T).T
        if spec.get("flip_normals", False):
            f = f[:, ::-1].copy()
            if vn_w is not None:
                vn_w = -vn_w

        F = f.shape[0]
        if vn_w is not None:
            norm = np.linalg.norm(vn_w, axis=-1, keepdims=True)
            vn_w = vn_w / np.maximum(norm, 1e-20)
        if self._tmpl_sink is not None:
            # group-template geometry: stored once, group-local space
            tm = self.tmpl
            tm["verts"].append(v_w)
            tm["faces"].append(f + tm["v_off"])
            tm["vns"].append(np.zeros_like(v_w) if vn_w is None else vn_w)
            tm["vuvs"].append(np.zeros((len(v_w), 2)) if uv is None
                             else np.asarray(uv))
            tm["hasvn"].append(np.full(F, vn_w is not None))
            tm["hasuv"].append(np.full(F, uv is not None))
            tm["tri_shape"].append(np.full(F, shape_id, np.int32))
            tm["v_off"] += len(v_w)
            return
        self.verts.append(v_w)
        self.faces.append(f + self.v_off)
        if vn_w is not None:
            self.vns.append(vn_w)
        else:
            self.vns.append(np.zeros_like(v_w))
        self.vuvs.append(np.zeros((len(v_w), 2)) if uv is None else np.asarray(uv))
        self.vtans.append(np.zeros((len(v_w), 3)) if vt is None
                          else np.asarray(vt))
        self.has_tangents |= vt is not None
        self.vcols.append(np.zeros((len(v_w), 3)) if vcol is None
                          else np.asarray(vcol, np.float64))
        self.has_vcols |= vcol is not None
        self.face_hasvn.append(np.full(F, vn_w is not None))
        self.face_hasuv.append(np.full(F, uv is not None))
        self.tri_shape.append(np.full(F, shape_id, np.int32))
        self.v_off += len(v_w)

    # ---------------- emitters (non-area) ----------------

    def add_emitter(self, spec):
        t = spec["type"]
        tw = _to_world(spec.get("to_world"))
        row = dict(e_type=None, radiance=np.zeros(3), tex=-1, to_world=tw,
                   shape=-1, params=np.zeros(4),
                   weight=float(spec.get("sampling_weight", 1.0)))
        if t == "point":
            row["e_type"] = E_POINT
            row["radiance"] = _spectrum3(spec.get("intensity", 1.0))
            if "position" in spec:
                tw = m.translate(spec["position"])
                row["to_world"] = tw
        elif t == "constant":
            row["e_type"] = E_CONSTANT
            row["radiance"] = _spectrum3(spec.get("radiance", 1.0))
        elif t == "envmap":
            row["e_type"] = E_ENVMAP
            img = spec.get("data")
            if img is None:
                from ..core.bitmap import read_image
                img = read_image(spec["filename"])
            row["tex"] = self.add_texture_image(img)
            row["radiance"] = np.full(3, float(spec.get("scale", 1.0)))
            row["mis_compensation"] = bool(spec.get("mis_compensation",
                                                    False))
        elif t in ("directional", "directionalarea"):
            row["e_type"] = E_DIRECTIONAL
            row["radiance"] = _spectrum3(spec.get("irradiance", 1.0))
            if "direction" in spec:
                d = np.asarray(spec["direction"], np.float64)
                d = d / np.linalg.norm(d)
                up = np.array([0.0, 1.0, 0.0])
                if abs(d @ up) > 0.99:
                    up = np.array([1.0, 0.0, 0.0])
                row["to_world"] = m.look_at([0, 0, 0], d, up)
        elif t == "spot":
            row["e_type"] = E_SPOT
            row["radiance"] = _spectrum3(spec.get("intensity", 1.0))
            cutoff = np.deg2rad(float(spec.get("cutoff_angle", 20.0)))
            beam = np.deg2rad(float(spec.get("beam_width",
                                             np.rad2deg(cutoff) * 0.75)))
            row["params"] = np.array([np.cos(cutoff), np.cos(beam), 0, 0])
        elif t == "projector":
            row["e_type"] = E_PROJECTOR
            row["radiance"] = _spectrum3(spec.get("scale", 1.0))
        else:
            raise ValueError(f"unsupported emitter type {t!r}")
        self.emitters.append(row)

    # ---------------- sensor / film ----------------

    def add_sensor(self, spec):
        t = spec["type"]
        film_spec = spec.get("film", {"type": "hdrfilm"})
        W = int(film_spec.get("width", 256))
        H = int(film_spec.get("height", 256))
        rf = film_spec.get("rfilter", {"type": "gaussian"})
        if isinstance(rf, str):
            rf = {"type": rf}
        fmap = {"box": (film_mod.F_BOX, 0.5), "tent": (film_mod.F_TENT, 1.0),
                "gaussian": (film_mod.F_GAUSSIAN, 2.0),
                "mitchell": (film_mod.F_MITCHELL, 2.0),
                "catmullrom": (film_mod.F_CATMULLROM, 2.0),
                "lanczos": (film_mod.F_LANCZOS, 3.0)}
        ftype, radius = fmap[rf.get("type", "gaussian")]
        radius = float(rf.get("radius", radius))

        def fov_x(s, w, h):
            fov = float(s.get("fov", 34.0))
            axis = s.get("fov_axis", "x")
            if axis == "y":
                fov = np.rad2deg(2 * np.arctan(np.tan(np.deg2rad(fov) / 2) * w / h))
            elif axis == "smaller":
                if h < w:
                    fov = np.rad2deg(2 * np.arctan(np.tan(np.deg2rad(fov) / 2) * w / h))
            return fov

        if "medium" in spec:
            # camera immersed in a participating medium (sensor.h medium ref)
            self.camera_medium = self.add_medium(spec["medium"])

        if t in ("perspective", "thinlens", "orthographic",
                 "radiancemeter"):
            tw = _to_world(spec.get("to_world"))
            ctype = {"perspective": sensor_mod.S_PERSPECTIVE,
                     "thinlens": sensor_mod.S_THINLENS,
                     "orthographic": sensor_mod.S_ORTHOGRAPHIC,
                     "radiancemeter": sensor_mod.S_RADIANCEMETER}[t]
            self.sensor = sensor_mod.make_camera_batch(
                [tw], fov_x(spec, W, H), (W, H), cam_type=ctype,
                aperture_radius=float(spec.get("aperture_radius", 0.0)),
                focus_dist=float(spec.get("focus_distance", 1.0)),
                near_clip=float(spec.get("near_clip", 1e-2)))
            self.film = film_mod.FilmConfig(width=W, height=H, ftype=ftype,
                                            radius=radius)
        elif t in ("grid", "batch"):
            from .grid_sensor import build_grid_sensor
            self.sensor, (FW, FH) = build_grid_sensor(spec, fov_x, W, H)
            self.film = film_mod.FilmConfig(width=FW, height=FH, ftype=ftype,
                                            radius=radius)
        elif t == "distant":
            # deferred — the ray origin needs the scene bounding sphere,
            # only known at finalize (distant.cpp set_scene :185-189)
            self.distant_spec = spec
            self.film = film_mod.FilmConfig(width=W, height=H,
                                            ftype=film_mod.F_BOX, radius=0.5)
        elif t == "_surface":
            # irradiancemeter placeholder camera; ray generation happens in
            # integrators/api.py from the attached shape's surface
            self.sensor = sensor_mod.make_camera_batch(
                [np.eye(4)], 90.0, (W, H),
                cam_type=sensor_mod.S_IRRADIANCEMETER)
            self.film = film_mod.FilmConfig(width=W, height=H,
                                            ftype=film_mod.F_BOX, radius=0.5)
        else:
            raise ValueError(f"unsupported sensor type {t!r}")

    # ---------------- finalize ----------------

    def finalize(self) -> Scene:
        if self.sensor is None and self.distant_spec is None:
            self.add_sensor({"type": "perspective"})
        if not self.materials:
            self.add_bsdf({"type": "diffuse"})
        if not self.shape_mat:
            # geometry-free scene (env emitter only): keep the per-shape
            # tables non-empty so gathers stay in range
            self.shape_mat.append(0)
            self.shape_em.append(-1)
            self.shape_interior.append(-1)
            self.shape_exterior.append(-1)

        if self.verts:
            verts = np.concatenate(self.verts, 0).astype(np.float32)
            faces = np.concatenate(self.faces, 0).astype(np.int32)
            vns = np.concatenate(self.vns, 0).astype(np.float32)
            vuvs = np.concatenate(self.vuvs, 0).astype(np.float32)
            hasvn = np.concatenate(self.face_hasvn, 0)
            hasuv = np.concatenate(self.face_hasuv, 0)
            tri_shape = np.concatenate(self.tri_shape, 0)
            vtans = (np.concatenate(self.vtans, 0).astype(np.float32)
                     if self.has_tangents else None)
            vcols = (np.concatenate(self.vcols, 0).astype(np.float32)
                     if self.has_vcols else None)
        else:
            verts = np.zeros((3, 3), np.float32)
            faces = np.zeros((0, 3), np.int32)
            vns = np.zeros((3, 3), np.float32)
            vuvs = np.zeros((3, 2), np.float32)
            hasvn = np.zeros((0,), bool)
            hasuv = np.zeros((0,), bool)
            tri_shape = np.zeros((0,), np.int32)
            vtans = None
            vcols = None

        sphc = (np.asarray(self.sph_center, np.float32).reshape(-1, 3)
                if self.sph_center else np.zeros((0, 3), np.float32))
        sphr = np.asarray(self.sph_radius, np.float32).reshape(-1)
        sphs = np.asarray(self.sph_shape, np.int32).reshape(-1)

        F, S = faces.shape[0], sphc.shape[0]
        n_prims = F + S

        # accel: brute for small scenes; beyond, the tiled-cull Pallas
        # sweep on TPU ("tiled") with the XLA BVH as the CPU fallback
        accel = self.accel
        if accel == "auto":
            accel = "brute" if n_prims <= 2048 else "tiled"
        tri_order = np.arange(max(F, 1), dtype=np.int32)
        if accel in ("bvh", "tiled") and n_prims > 0:
            lo_t, hi_t = (triangle_bounds(verts, faces) if F > 0
                          else (np.zeros((0, 3)), np.zeros((0, 3))))
            lo_s = sphc - sphr[:, None]
            hi_s = sphc + sphr[:, None]
            lo = np.concatenate([lo_t, lo_s], 0)
            hi = np.concatenate([hi_t, hi_s], 0)
            bvh_bbox, bvh_meta, prim_order = build_bvh(lo, hi)
            tile_starts = None
            if F > 0:
                # spatially-coherent triangle order for the tiled tracer
                _, meta_t, tri_order = build_bvh(lo_t, hi_t)
                if accel == "tiled":
                    from ..accel.build import treelet_tiles
                    from ..ops.binned_trace import TILE as _TILE
                    tile_starts = treelet_tiles(meta_t, F, _TILE)
        else:
            bvh_bbox = np.zeros((1, 2, 3), np.float32)
            bvh_meta = np.zeros((1, 2), np.int32)
            prim_order = np.arange(max(n_prims, 1), dtype=np.int32)
            tile_starts = None

        # ---- true-instancing template tables (src/shapes/instance.cpp)
        inst_kw = {}
        if self.instances:
            tm = self.tmpl
            t_verts = np.concatenate(tm["verts"], 0)
            t_faces = np.concatenate(tm["faces"], 0).astype(np.int32)
            I = len(self.instances)
            i_tw = np.stack([r["to_world"] for r in self.instances], 0)
            i_to = np.stack([np.linalg.inv(r["to_world"])
                             for r in self.instances], 0)
            # normals transform by the inverse transpose == to_object^T
            i_nm = np.transpose(i_to, (0, 2, 1)).copy()
            f0 = np.array([self.groups[r["gid"]]["f0"]
                           for r in self.instances], np.int32)
            fc = np.array([self.groups[r["gid"]]["fc"]
                           for r in self.instances], np.int32)
            poff = np.concatenate([[0], np.cumsum(fc)]).astype(np.int32)
            fg_max = int(fc.max())
            fidx = f0[:, None] + np.arange(fg_max)[None, :]
            fidx = np.where(np.arange(fg_max)[None, :] < fc[:, None],
                            fidx, -1).astype(np.int32)
            inst_kw = dict(
                tmpl_verts=jnp.asarray(t_verts),
                tmpl_faces=jnp.asarray(t_faces),
                tmpl_vns=jnp.asarray(np.concatenate(tm["vns"], 0)),
                tmpl_uvs=jnp.asarray(np.concatenate(tm["vuvs"], 0)),
                tmpl_hasvn=jnp.asarray(np.concatenate(tm["hasvn"], 0)),
                tmpl_hasuv=jnp.asarray(np.concatenate(tm["hasuv"], 0)),
                tmpl_tri_shape=jnp.asarray(
                    np.concatenate(tm["tri_shape"], 0)),
                inst_to_world=jnp.asarray(i_tw, jnp.float32),
                inst_to_object=jnp.asarray(i_to, jnp.float32),
                inst_nrm_mat=jnp.asarray(i_nm, jnp.float32),
                inst_prim_off=jnp.asarray(poff),
                inst_face_idx=jnp.asarray(fidx))

        geom = GeometryArrays(
            verts=jnp.asarray(verts), faces=jnp.asarray(faces),
            vnormals=jnp.asarray(vns), vuvs=jnp.asarray(vuvs),
            has_vn=jnp.asarray(hasvn), has_uv=jnp.asarray(hasuv),
            tri_shape=jnp.asarray(tri_shape),
            sph_center=jnp.asarray(sphc), sph_radius=jnp.asarray(sphr),
            sph_shape=jnp.asarray(sphs),
            bvh_bbox=jnp.asarray(bvh_bbox), bvh_meta=jnp.asarray(bvh_meta),
            bvh_prim_ids=jnp.asarray(prim_order), accel_mode=accel,
            tri_order=jnp.asarray(tri_order),
            tile_starts=(None if tile_starts is None
                         else jnp.asarray(tile_starts)),
            vtangents=None if vtans is None else jnp.asarray(vtans),
            vattrs=None if vcols is None else jnp.asarray(vcols),
            any_vattr=vcols is not None,
            any_vn=bool(np.asarray(hasvn).any()),
            any_uv=bool(np.asarray(hasuv).any()),
            edges=jnp.asarray(_edge_table(verts, faces)), **inst_kw)
        # precompute the binned-tracer tables once (repacking per trace
        # call re-gathered the triangle soup every bounce)
        from ..accel.traverse import build_binned_cache
        geom = build_binned_cache(geom)

        # SDF grid shapes (render/sdf.py)
        sdfs = []
        if self.sdf_specs:
            from ..render.sdf import build_sdf
            sdfs = [build_sdf(s["data"], s["to_world"], s["shape_index"],
                              s["normal_mode"]) for s in self.sdf_specs]

        # scene bbox
        allpts = [verts] if len(verts) else []
        for r in self.instances:
            g = self.groups[r["gid"]]
            if g["fc"] == 0:
                continue
            # only THIS group's vertex slice: the union over all
            # templates would inflate every instance's bbox (and the
            # distant-sensor placement) in multi-group scenes
            tv = np.concatenate(self.tmpl["verts"], 0)[
                g["v0"]:g["v0"] + g["vc"]]
            lo_g, hi_g = tv.min(0), tv.max(0)
            corners = np.stack(np.meshgrid(*zip(lo_g, hi_g),
                                           indexing="ij"), -1).reshape(-1, 3)
            twr = np.asarray(r["to_world"], np.float64)
            allpts.append((twr[:3, :3] @ corners.T).T + twr[:3, 3])
        if S:
            allpts += [sphc - sphr[:, None], sphc + sphr[:, None]]
        for s in self.sdf_specs:
            tw_s = np.asarray(s["to_world"], np.float64)
            corners = np.stack(np.meshgrid([0.0, 1], [0.0, 1], [0.0, 1],
                                           indexing="ij"), -1).reshape(-1, 3)
            allpts.append((tw_s[:3, :3] @ corners.T).T + tw_s[:3, 3])
        pts = np.concatenate(allpts, 0) if allpts else np.zeros((1, 3))
        bbox_lo, bbox_hi = pts.min(0), pts.max(0)

        if self.distant_spec is not None:
            # distant sensor (distant.cpp:155-232): to_world from an
            # explicit `direction` (look_at with auto up) or the given
            # transform; origin offsets use the scene bounding sphere
            spec = self.distant_spec
            if "direction" in spec:
                d = np.asarray(spec["direction"], np.float64)
                d = d / np.linalg.norm(d)
                up = np.array([0.0, 1.0, 0.0])
                if abs(d @ up) > 0.99:
                    up = np.array([1.0, 0.0, 0.0])
                tw = m.look_at([0, 0, 0], d, up)
            else:
                tw = _to_world(spec.get("to_world"))
            center = 0.5 * (bbox_lo + bbox_hi)
            brad = max(0.5 * float(np.linalg.norm(bbox_hi - bbox_lo)), 1e-4)
            tgt = spec.get("target")
            aux = np.zeros(8, np.float32)
            if tgt is not None:
                aux[0:3] = np.asarray(tgt, np.float32)
                aux[4] = 1.0
            else:
                aux[0:3] = center
            aux[3] = brad * 1.0001
            fc = self.film
            self.sensor = sensor_mod.make_camera_batch(
                [tw], 90.0, (fc.width, fc.height),
                cam_type=sensor_mod.S_DISTANT, aux=aux)

        # irradiancemeter: area-weighted pick table over the attached
        # shape's prims (irradiancemeter.cpp:82 sample_position)
        sensor_prims = jnp.zeros((1,), jnp.int32)
        sensor_distr = DiscreteDistribution.from_pmf(jnp.ones((1,)))
        has_surf_sensor = self.sensor_shape >= 0
        if has_surf_sensor:
            sid = self.sensor_shape
            tids = np.nonzero(tri_shape == sid)[0]
            if tids.size:
                p0, p1, p2 = (verts[faces[tids, k]] for k in range(3))
                t_areas = 0.5 * np.linalg.norm(
                    np.cross(p1 - p0, p2 - p0), axis=-1)
            else:
                t_areas = np.zeros((0,))
            sids_ = np.nonzero(sphs == sid)[0]
            s_areas = 4.0 * np.pi * sphr[sids_] ** 2
            prims = np.concatenate([tids, F + sids_]).astype(np.int32)
            areas = np.concatenate([t_areas, s_areas])
            if prims.size == 0:
                raise ValueError("irradiancemeter attached to empty shape")
            sensor_prims = jnp.asarray(prims)
            sensor_distr = DiscreteDistribution.from_pmf(jnp.asarray(areas))

        materials = self._material_table()
        textures = TextureTable.build(self.textures)
        emitters = self._emitter_table(verts, faces, tri_shape, sphc, sphr,
                                       sphs, n_prims)

        from ..render.medium import TAB_K as _TAB_K
        from ..render.medium import MediumTable
        from ..render.volume import VolumeGridTable
        if self.media:
            med = MediumTable(
                sigma_t=jnp.asarray(np.stack([r["sigma_t"] for r in self.media]),
                                    jnp.float32),
                albedo=jnp.asarray(np.stack([r["albedo"] for r in self.media]),
                                   jnp.float32),
                phase_type=jnp.asarray([r["phase_type"] for r in self.media],
                                       jnp.int32),
                g=jnp.asarray([r["g"] for r in self.media], jnp.float32),
                scale=jnp.asarray([r["scale"] for r in self.media],
                                  jnp.float32),
                density_vol=jnp.asarray(
                    [r.get("density_vol", -1) for r in self.media], jnp.int32),
                albedo_vol=jnp.asarray(
                    [r.get("albedo_vol", -1) for r in self.media], jnp.int32),
                majorant=jnp.asarray(
                    [r.get("majorant", float(np.max(r["sigma_t"]) * r["scale"]))
                     for r in self.media], jnp.float32),
                phase_type2=jnp.asarray(
                    [r.get("phase_type2", 0) for r in self.media], jnp.int32),
                g2=jnp.asarray([r.get("g2", 0.0) for r in self.media],
                               jnp.float32),
                phase_type3=jnp.asarray(
                    [r.get("phase_type3", 0) for r in self.media], jnp.int32),
                g3=jnp.asarray([r.get("g3", 0.0) for r in self.media],
                               jnp.float32),
                blend_w=jnp.asarray(
                    [r.get("blend_w", 0.5) for r in self.media], jnp.float32),
                tab_pdf=jnp.asarray(np.stack(
                    [r.get("tab_pdf", np.full(_TAB_K, 0.5, np.float32))
                     for r in self.media]), jnp.float32),
                tab_cdf=jnp.asarray(np.stack(
                    [r.get("tab_cdf",
                           np.linspace(0, 1, _TAB_K, dtype=np.float32))
                     for r in self.media]), jnp.float32),
                sggx_s=jnp.asarray(np.stack(
                    [r.get("sggx_s", np.array([1, 1, 1, 0, 0, 0], np.float32))
                     for r in self.media]), jnp.float32))
        else:
            med = MediumTable.empty()
        volumes = VolumeGridTable.build(self.volumes)
        has_hetero = any(r.get("density_vol", -1) >= 0 for r in self.media)
        # null boundaries: any shape with a null BSDF that separates media
        from ..render.bsdfs.registry import D_NULL as _D_NULL
        has_null_b = any(
            self.materials[mi]["mtype"] == _D_NULL
            and (self.shape_interior[i] >= 0 or self.shape_exterior[i] >= 0)
            for i, mi in enumerate(self.shape_mat) if mi >= 0)

        return Scene(
            geom=geom,
            shape_material=jnp.asarray(self.shape_mat, jnp.int32).reshape(-1),
            shape_emitter=jnp.asarray(self.shape_em, jnp.int32).reshape(-1),
            materials=materials, textures=textures, emitters=emitters,
            sensor=self.sensor, film=self.film,
            bbox_lo=jnp.asarray(bbox_lo, jnp.float32),
            bbox_hi=jnp.asarray(bbox_hi, jnp.float32),
            media=med,
            shape_interior=jnp.asarray(self.shape_interior,
                                       jnp.int32).reshape(-1),
            shape_exterior=jnp.asarray(self.shape_exterior,
                                       jnp.int32).reshape(-1),
            camera_medium=self.camera_medium,
            has_media=len(self.media) > 0,
            volumes=volumes, has_hetero=has_hetero,
            has_null_boundaries=has_null_b,
            sensor_prims=sensor_prims, sensor_prim_distr=sensor_distr,
            has_surface_sensor=has_surf_sensor,
            measured=tuple(self.measured_tables),
            measured_pol=tuple(self.measured_pol_tables),
            sdfs=tuple(sdfs))

    def _material_table(self):
        rows = self.materials

        def col(k, dt=np.float32):
            return jnp.asarray(np.stack([np.asarray(r[k]) for r in rows]).astype(dt))

        has_maps = any(r["normal_tex"] >= 0 or r["bump_tex"] >= 0
                       for r in rows)
        return bsdf_reg.MaterialTable(
            mtype=col("mtype", np.int32), albedo=col("albedo"),
            albedo_tex=col("albedo_tex", np.int32), alpha=col("alpha"),
            alpha_tex=col("alpha_tex", np.int32), eta_c=col("eta_c"),
            k_c=col("k_c"), eta=col("eta"), spec_refl=col("spec_refl"),
            spec_trans=col("spec_trans"), twosided=col("twosided", bool),
            fdr_int=col("fdr_int"), spec_weight=col("spec_weight"),
            extra=col("extra"), normal_tex=col("normal_tex", np.int32),
            bump_tex=col("bump_tex", np.int32),
            child_a=col("child_a", np.int32),
            child_b=col("child_b", np.int32),
            has_shading_maps=has_maps,
            types_present=tuple(sorted({int(r["mtype"]) for r in rows})))

    def _emitter_table(self, verts, faces, tri_shape, sphc, sphr, sphs,
                       n_prims):
        rows = self.emitters
        E = max(len(rows), 1)
        if not rows:
            rows = [dict(e_type=E_POINT, radiance=np.zeros(3), tex=-1,
                         to_world=np.eye(4), shape=-1, params=np.zeros(4),
                         weight=0.0)]

        # light-sample table: one entry per emissive prim + one per
        # non-area emitter (env/const appended last — scene.py relies on it)
        ls_prim, ls_emitter, ls_w = [], [], []
        prim_em = np.full(max(n_prims, 1), -1, np.int32)
        prim_pdf_area = np.zeros(max(n_prims, 1), np.float32)

        # per-triangle area
        if faces.shape[0]:
            p0 = verts[faces[:, 0]]
            p1 = verts[faces[:, 1]]
            p2 = verts[faces[:, 2]]
            tri_area = 0.5 * np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=-1)
        else:
            tri_area = np.zeros((0,))
        sph_area = 4.0 * np.pi * sphr ** 2

        env_idx = -1
        deferred_inf = []
        for e, r in enumerate(rows):
            if r["e_type"] == E_AREA:
                sid = r["shape"]
                tmask = tri_shape == sid
                tids = np.nonzero(tmask)[0]
                areas = tri_area[tids]
                smask = sphs == sid
                sids_ = np.nonzero(smask)[0]
                areas_s = sph_area[sids_]
                total_area = areas.sum() + areas_s.sum()
                for tid, a in zip(tids, areas):
                    ls_prim.append(int(tid))
                    ls_emitter.append(e)
                    ls_w.append(r["weight"] * a / max(total_area, 1e-20))
                    prim_em[tid] = e
                for sid_, a in zip(sids_, areas_s):
                    gp = faces.shape[0] + sid_
                    ls_prim.append(int(gp))
                    ls_emitter.append(e)
                    ls_w.append(r["weight"] * a / max(total_area, 1e-20))
                    prim_em[gp] = e
            else:
                if r["e_type"] in (E_CONSTANT, E_ENVMAP):
                    env_idx = e
                    deferred_inf.append(e)
                else:
                    ls_prim.append(-1)
                    ls_emitter.append(e)
                    ls_w.append(r["weight"])
        for e in deferred_inf:
            ls_prim.append(-1)
            ls_emitter.append(e)
            ls_w.append(rows[e]["weight"])

        if not ls_w:
            ls_prim, ls_emitter, ls_w = [-1], [0], [0.0]
        ls_w = np.asarray(ls_w, np.float32)
        total_w = max(ls_w.sum(), 1e-20)
        # prim_pdf_area = P(entry) / prim_area
        for i, (p, wgt) in enumerate(zip(ls_prim, ls_w)):
            if p >= 0:
                area = tri_area[p] if p < faces.shape[0] \
                    else sph_area[p - faces.shape[0]]
                prim_pdf_area[p] = (wgt / total_w) / max(area, 1e-20)

        # envmap importance table
        env_warp = Marginal2D.from_data(np.ones((1, 1), np.float32))
        if env_idx >= 0 and rows[env_idx]["e_type"] == E_ENVMAP:
            img = self.textures[rows[env_idx]["tex"]]
            lum = (0.2126 * img[..., 0] + 0.7152 * img[..., 1]
                   + 0.0722 * img[..., 2]).astype(np.float32)
            # MIS compensation (Karlik et al. 2019): subtract the mean
            # luminance so flat backgrounds are not oversampled; skipped
            # when the map is nearly constant (envmap.cpp:160-184,
            # default-off `mis_compensation` prop as in the reference)
            if rows[env_idx].get("mis_compensation"):
                off = float(lum.mean())
                if off - float(lum.min()) > 0.01 * off:
                    lum = np.maximum(lum - off, 0.0)
            # rows are bilinear NODES spanning theta in [0, pi]
            # inclusive (envmap.cpp:157 theta_scale = pi/(H-1)); the
            # sin(theta) factor vanishes at the poles by construction
            h = lum.shape[0]
            theta = np.arange(h) / max(h - 1, 1) * np.pi
            lum = lum * np.sin(theta)[:, None]
            # wrap column for periodic phi
            lum = np.concatenate([lum, lum[:, :1]], axis=1)
            env_warp = Marginal2D.from_data(np.maximum(lum, 1e-8))

        def col(k, dt=np.float32):
            return jnp.asarray(np.stack([np.asarray(r[k]) for r in rows]).astype(dt))

        tw = np.stack([r["to_world"] for r in rows]).astype(np.float32)
        twi = np.linalg.inv(tw.astype(np.float64)).astype(np.float32)
        return EmitterTable(
            e_type=col("e_type", np.int32), radiance=col("radiance"),
            tex=col("tex", np.int32), to_world=jnp.asarray(tw),
            to_world_inv=jnp.asarray(twi), shape=col("shape", np.int32),
            params=col("params"), sampling_weight=col("weight"),
            ls_distr=DiscreteDistribution.from_pmf(jnp.asarray(ls_w)),
            ls_prim=jnp.asarray(ls_prim, jnp.int32),
            ls_emitter=jnp.asarray(ls_emitter, jnp.int32),
            prim_emitter=jnp.asarray(prim_em),
            prim_pdf_area=jnp.asarray(prim_pdf_area),
            env_warp=env_warp, env_index=env_idx,
            types_present=tuple(sorted({int(r["e_type"]) for r in rows})))


def _smooth_normals(v, f):
    n = np.zeros_like(v)
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    fn = np.cross(p1 - p0, p2 - p0)  # area-weighted
    for k in range(3):
        np.add.at(n, f[:, k], fn)
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)


def load_dict(d: dict, accel: str = "auto") -> Scene:
    """Build a Scene from a Mitsuba-style dict (mi.load_dict parity)."""
    b = _Builder()
    b.accel = accel
    assert d.get("type", "scene") == "scene", "top-level type must be 'scene'"
    for key, spec in d.items():
        if key == "type" or not isinstance(spec, dict):
            continue
        t = spec.get("type")
        if t in ("path", "direct", "depth", "aov", "moment", "volpath",
                 "volpathmis", "ptracer", "mvpath"):
            b.integrator = dict(spec)
        elif t in ("perspective", "thinlens", "orthographic", "grid",
                   "batch", "radiancemeter", "distant"):
            b.add_sensor(spec)
        elif t in ("point", "constant", "envmap", "directional", "spot",
                   "projector", "directionalarea"):
            b.add_emitter(spec)
        elif t == "shapegroup":
            b.shapegroups[key] = [
                v for v in spec.values()
                if isinstance(v, dict) and v.get("type") in _SHAPE_TYPES]
        elif t in _SHAPE_TYPES:
            b.add_shape(spec)
        elif t in _BSDF_TYPE or t in ("twosided", "mask", "blendbsdf",
                                      "normalmap", "bumpmap"):
            b.add_bsdf(spec, name=key)   # top-level named bsdf ('ref' target)
        elif t in ("independent", "stratified", "multijitter", "orthogonal",
                   "ldsampler"):
            b.integrator.setdefault("sampler", dict(spec))
        else:
            raise ValueError(f"unknown scene element {key}: {t}")
    return b.finalize()
