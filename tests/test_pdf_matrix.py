"""bsdf_pdf_matrix: the fused (J, N) pdf dispatch must equal J
separate bsdf_eval_pdf calls for every material family (the AMVPT
exact-tv_pdf MIS path rides on it, mvpath_multi.h:466-523)."""

import numpy as np
import pytest

import jax.numpy as jnp

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.render.bsdfs import bsdf_eval_pdf, bsdf_pdf_matrix
from mitsuba3_amvpt_tpu.utils import scenes


BSDFS = [
    {"type": "diffuse", "reflectance": [0.6, 0.4, 0.2]},
    {"type": "roughconductor", "material": "Au", "alpha": 0.2},
    {"type": "conductor", "material": "Ag"},
    {"type": "dielectric"},
    {"type": "roughdielectric", "alpha": 0.3},
    {"type": "thindielectric"},
    {"type": "plastic"},
    {"type": "roughplastic", "alpha": 0.15},
    {"type": "principled", "metallic": 0.4, "roughness": 0.3,
     "spec_trans": 0.2},
    {"type": "blendbsdf", "weight": 0.3,
     "bsdf_0": {"type": "diffuse"},
     "bsdf_1": {"type": "roughconductor", "alpha": 0.1}},
    {"type": "mask", "opacity": 0.7, "bsdf": {"type": "diffuse"}},
    {"type": "hair"},
]


def _si_batch(bsdf, n=64, seed=0):
    d = scenes.cornell_box(res=8)
    d["back"]["bsdf"] = bsdf
    sc = mt.load_dict(d)
    rng = np.random.default_rng(seed)
    from mitsuba3_amvpt_tpu.render.records import Ray
    o = jnp.asarray(rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32))
    o = o.at[:, 2].set(1.5)
    dr = rng.normal(size=(n, 3)).astype(np.float32)
    dr[:, 2] = -np.abs(dr[:, 2]) - 0.5
    dr /= np.linalg.norm(dr, axis=-1, keepdims=True)
    si = sc.ray_intersect(Ray.make(o, jnp.asarray(dr)))
    return sc, si


@pytest.mark.parametrize("bsdf", BSDFS,
                         ids=[b["type"] for b in BSDFS])
def test_matrix_matches_loop(bsdf):
    sc, si = _si_batch(bsdf)
    n = si.t.shape[0]
    rng = np.random.default_rng(3)
    J = 4
    wos = rng.normal(size=(J, n, 3)).astype(np.float32)
    wos /= np.linalg.norm(wos, axis=-1, keepdims=True)
    wos = jnp.asarray(wos)
    P = np.asarray(bsdf_pdf_matrix(sc, si, wos))
    ref = np.stack([np.asarray(bsdf_eval_pdf(sc, si, wos[j])[1])
                    for j in range(J)])
    assert P.shape == (J, n)
    np.testing.assert_allclose(P, ref, rtol=1e-5, atol=1e-6)
