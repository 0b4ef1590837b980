"""Inverse rendering demo: albedo- or roughness-texture recovery with
PRB + Adam (BASELINE config 3: "path-replay backprop gradients w.r.t.
albedo/roughness textures, Adam texture recovery").

Run: python examples/texture_recovery.py [--steps 64] [--res 48]
     python examples/texture_recovery.py --param roughness
Writes /tmp/texrec_{target,init,final}.png and prints the loss curve.
``--param roughness`` optimizes a roughconductor alpha texture —
gradients flow through GGX eval (the harder half of config 3; also
covered by tests/test_ad.py::TestRoughnessTextureRecovery).
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.ad import traverse, update_scene
from mitsuba3_amvpt_tpu.ad.optimizers import Adam
from mitsuba3_amvpt_tpu.ad.prb import prb_pass
from mitsuba3_amvpt_tpu.core.bitmap import write_image
from mitsuba3_amvpt_tpu.render.film import film_develop


def make_scene(res, param="albedo"):
    if param == "roughness":
        bsdf = {"type": "roughconductor", "material": "Al",
                "alpha": {"type": "checkerboard",
                          "color0": [0.08, 0.08, 0.08],
                          "color1": [0.45, 0.45, 0.45], "res": 16}}
        light = {"type": "sphere", "radius": 0.35, "center": [0, 2.5, 1.0],
                 "emitter": {"type": "area", "radiance": 30.0}}
    else:
        bsdf = {"type": "diffuse",
                "reflectance": {"type": "checkerboard",
                                "color0": [0.7, 0.2, 0.1],
                                "color1": [0.1, 0.3, 0.7], "res": 32}}
        light = {"type": "point", "position": [0, 3, 1], "intensity": 25.0}
    d = {
        "type": "scene",
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": {"lookat": {"origin": [0, 2.0, 2.0],
                                           "target": [0, 0, 0],
                                           "up": [0, 1, 0]}},
                   "film": {"type": "hdrfilm", "width": res, "height": res,
                            "rfilter": {"type": "box"}}},
        "floor": {"type": "rectangle",
                  "to_world": {"ops": [{"rotate": {"axis": [1, 0, 0],
                                                   "angle": -90}},
                                       {"scale": [1.5, 1.5, 1.5]}]},
                  "bsdf": bsdf},
        "light": light,
    }
    if param == "roughness":
        d["env"] = {"type": "constant", "radiance": 0.05}
    return mt.load_dict(d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--res", type=int, default=48)
    ap.add_argument("--spp", type=int, default=24)
    ap.add_argument("--param", choices=("albedo", "roughness"),
                    default="albedo")
    args = ap.parse_args()

    scene = make_scene(args.res, args.param)
    target = film_develop(prb_pass(scene, jnp.uint32(7), args.spp * 2, 2, 8))
    write_image("/tmp/texrec_target.png", np.asarray(target))

    tex0 = scene.textures.texels
    init_val = 0.25 if args.param == "roughness" else 0.4
    scene_opt = update_scene(
        scene, {"textures.texels": jnp.full_like(tex0, init_val)})
    write_image("/tmp/texrec_init.png", np.asarray(
        film_develop(prb_pass(scene_opt, jnp.uint32(7), args.spp, 2, 8))))

    opt = Adam(lr=0.05, params={"tex": scene_opt.textures.texels})

    @jax.jit
    def loss_and_grad(texels, seed):
        def loss(t):
            s = update_scene(scene_opt, {"textures.texels": t})
            img = film_develop(prb_pass(s, seed, args.spp, 2, 8))
            return jnp.mean((img - target) ** 2)
        return jax.value_and_grad(loss)(texels)

    for it in range(args.steps):
        l, g = loss_and_grad(opt["tex"], jnp.uint32(100 + it))
        opt.step({"tex": g})
        lo = 0.02 if args.param == "roughness" else 0.0
        opt["tex"] = jnp.clip(opt["tex"], lo, 1.0)
        if it % 8 == 0 or it == args.steps - 1:
            print(f"step {it:3d}  loss {float(l):.6f}")

    final = update_scene(scene_opt, {"textures.texels": opt["tex"]})
    write_image("/tmp/texrec_final.png", np.asarray(
        film_develop(prb_pass(final, jnp.uint32(7), args.spp * 2, 2, 8))))
    tex_err = float(jnp.abs(opt["tex"] - tex0).mean())
    print(f"mean texel error vs ground truth: {tex_err:.4f} "
          f"(init was {float(jnp.abs(init_val - tex0).mean()):.4f})")


if __name__ == "__main__":
    main()
