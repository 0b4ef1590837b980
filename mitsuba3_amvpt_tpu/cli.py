"""Command-line render driver.

TPU-native counterpart of the reference's `mitsuba` binary
(src/mitsuba/mitsuba_render.cpp:165-408) and the Python console entry
(src/python/python/cli.py):

    python -m mitsuba3_amvpt_tpu scene.xml -o out.exr -s 64 -d 8
    python -m mitsuba3_amvpt_tpu scene.xml -D spp=4 -D res=128 -I mvpath
    python -m mitsuba3_amvpt_tpu --quilt-gif out.gif --grid 8x1 quilt.exr

Flags mirror the reference where meaningful on TPU: `-D key=value`
substitutes `$key` scene parameters (mitsuba_render.cpp:238-245), `-o`
output path, `-s/--spp`, `-d/--max-depth`, `-S/--seed`, `-I` integrator
selection, `-t/--timeout` wall-clock limit (integrator.cpp:24).  JIT
optimization levels / wavefront toggles (-O, -W, -V) have no analog —
XLA owns compilation.
"""

from __future__ import annotations

import argparse
import sys
import time


def _parse_defines(items):
    out = {}
    for it in items or ():
        if "=" not in it:
            raise SystemExit(f"-D expects key=value, got {it!r}")
        k, v = it.split("=", 1)
        for cast in (int, float):
            try:
                v = cast(v)
                break
            except ValueError:
                continue
        out[k] = v
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="mitsuba3_amvpt_tpu",
        description="TPU-native differentiable path tracer "
                    "(Mitsuba 3 + AMVPT capability set)")
    ap.add_argument("scene", nargs="?", help=".xml scene file")
    ap.add_argument("extra_files", nargs="*", metavar="FILE",
                    help="additional input images for --tonemap")
    ap.add_argument("-o", "--output", default="output.exr",
                    help="output image path (.exr/.png/.pfm)")
    ap.add_argument("-s", "--spp", type=int, default=None,
                    help="samples per pixel (overrides the sampler's)")
    ap.add_argument("-d", "--max-depth", type=int, default=6)
    ap.add_argument("-S", "--seed", type=int, default=0)
    ap.add_argument("-I", "--integrator", default=None,
                    help="override the scene integrator "
                         "(path/direct/depth/aov/moment/volpath/"
                         "volpathmis/ptracer/mvpath/stokes/spectral)")
    ap.add_argument("-D", dest="defines", action="append", metavar="k=v",
                    help="scene parameter substitution ($key in XML)")
    ap.add_argument("-t", "--timeout", type=float, default=None,
                    help="wall-clock render budget in seconds: rendering "
                         "stops at the last finished pass")
    ap.add_argument("--spp-per-pass", type=int, default=None)
    ap.add_argument("--interruptible", action="store_true",
                    help="render pass-by-pass with SIGINT cancellation "
                         "and SIGHUP partial-image dumps (reference "
                         "m_stop + develop_callback)")
    ap.add_argument("--raw", action="store_true",
                    help="write the undeveloped accumulator")
    ap.add_argument("--quilt-gif", metavar="OUT.gif",
                    help="slice a quilt image into per-view frames and "
                         "write an animated gif (to_gif.py parity); the "
                         "positional argument is the quilt image")
    ap.add_argument("--grid", default="8x1",
                    help="quilt grid COLSxROWS for --quilt-gif")
    ap.add_argument("--tonemap", action="store_true",
                    help="treat positional args as EXR images: write "
                         "dithered sRGB PNGs next to them "
                         "(tonemap.py parity)")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="linear pre-scale for --tonemap/--polvis")
    ap.add_argument("--polvis", metavar="MODES",
                    help="comma list of Stokes visualizations to write "
                         "from a 12-channel stokes EXR (polvis.py "
                         "parity): intensity,s1,s2,s3,dop,top,lin or "
                         "'all'; add pol<angle> for a virtual linear "
                         "polarizer sweep frame")
    ap.add_argument("--overlay", choices=["direct", "luminance"],
                    help="polvis overlay mode")
    # a real positional list instead of parse_known_args: a misspelled
    # option now errors instead of being swallowed as an input image
    # (ADVICE r4 #3)
    args = ap.parse_args(argv)
    extra_files = args.extra_files

    if extra_files and not args.tonemap:
        ap.error(f"unrecognized arguments: {extra_files}")

    if args.tonemap:
        from .utils.polvis import tonemap_file
        files = ([args.scene] if args.scene else []) + extra_files
        for f in files:
            out = tonemap_file(f, scale=args.scale)
            print(f'wrote "{out}"')
        return 0

    if args.polvis:
        import os

        import numpy as np

        from .core.bitmap import write_image
        from .utils.polvis import apply_polarizer, load_stokes, polvis
        st = load_stokes(args.scene)
        base = os.path.splitext(args.scene)[0]
        modes = args.polvis.split(",")
        if "all" in modes:
            modes = ["intensity", "s1", "s2", "s3", "dop", "top", "lin"]
        vis = polvis(st, scale=args.scale, overlay=args.overlay)
        for mode in modes:
            if mode.startswith("pol"):
                ang = float(mode[3:])
                img = apply_polarizer(st, ang) * args.scale
                out = f"{base}_polarizer_{ang:.2f}.png"
            else:
                img = vis[mode]
                out = f"{base}_{mode}.png"
            write_image(out, np.clip(img, 0.0, 1.0))
            print(f'wrote "{out}"')
        return 0

    if args.quilt_gif:
        return _quilt_gif(args)

    if not args.scene:
        ap.print_usage()
        return 1

    import numpy as np

    import mitsuba3_amvpt_tpu as mt
    from .core.bitmap import write_image
    from .render.integrators.api import render as render_fn

    spp = args.spp or 16
    integrator = args.integrator or "path"

    # cooperative cancellation: register early so a SIGINT during scene
    # load / first compile is caught too (the reference registers its
    # handlers at startup, mitsuba_render.cpp:135-144).  Only installed
    # when the cooperative pass-by-pass branch below will actually run —
    # the mvpath/stokes/spectral drivers render in one shot and never
    # poll the flag, so swallowing SIGINT there would make the process
    # unkillable with Ctrl-C.
    cooperative = ((args.interruptible or args.timeout is not None)
                   and integrator not in ("mvpath", "stokes", "spectral"))
    _stop = {"flag": False}
    if cooperative:
        import signal as _signal

        def _early_int(signum, frame):
            print("[cli] cancel requested: stopping at the next pass "
                  "boundary", file=sys.stderr)
            _stop["flag"] = True
        _signal.signal(_signal.SIGINT, _early_int)
    elif args.interruptible or args.timeout is not None:
        print(f"[cli] note: -t/--interruptible have no effect with "
              f"{integrator} (single-dispatch driver)", file=sys.stderr)

    t0 = time.time()
    scene = mt.load_file(args.scene, params=_parse_defines(args.defines))
    print(f"[cli] scene loaded in {time.time() - t0:.2f}s", file=sys.stderr)
    kw = dict(spp=spp, seed=args.seed, max_depth=args.max_depth,
              spp_per_pass=args.spp_per_pass, raw=args.raw)

    t0 = time.time()
    if integrator == "mvpath":
        from .render.integrators.mvpath import render_mvpath
        img = render_mvpath(scene, spp=spp, seed=args.seed,
                            max_depth=args.max_depth)
    elif integrator == "stokes":
        from .render.integrators.stokes import render_stokes
        img = render_stokes(scene, spp=spp, seed=args.seed,
                            max_depth=args.max_depth)[..., 0]
    elif integrator == "spectral":
        from .render.integrators.spectral import render_spectral
        img = render_spectral(scene, spp=spp, seed=args.seed,
                              max_depth=args.max_depth)
    elif cooperative:
        # cooperative pass-by-pass loop: wall-clock budget
        # (Integrator::m_timeout, integrator.cpp:24,168-169), SIGINT
        # cancellation (Integrator::m_stop / should_stop()) and SIGHUP
        # partial-image dump (mitsuba_render.cpp:135-144
        # develop_callback writing the partially developed film)
        import signal

        import jax
        import jax.numpy as jnp
        import numpy as np
        from .core.bitmap import write_image as _wi
        from .render.film import film_develop, film_prepare
        from .render.integrators.api import render_pass
        spp_pp = args.spp_per_pass or max(1, min(spp, 16))
        acc = film_prepare(scene.film)
        state = {"acc": acc, "stop": False}

        def _on_hup(signum, frame):
            print("[cli] SIGHUP: writing partial image", file=sys.stderr)
            _wi(args.output, np.asarray(film_develop(state["acc"])))

        def _on_int(signum, frame):
            print("[cli] cancel requested: stopping at the next pass "
                  "boundary", file=sys.stderr)
            state["stop"] = True

        old_hup = None
        if hasattr(signal, "SIGHUP"):
            old_hup = signal.signal(signal.SIGHUP, _on_hup)
        signal.signal(signal.SIGINT, _on_int)
        state["stop"] = _stop["flag"]
        done = 0
        try:
            while done < spp and not state["stop"] and (
                    args.timeout is None
                    or (time.time() - t0) < args.timeout):
                sp = min(spp_pp, spp - done)
                acc = render_pass(scene, state["acc"],
                                  jnp.uint32(args.seed + done), sp,
                                  integrator, args.max_depth, 5)
                jax.block_until_ready(acc)
                state["acc"] = acc
                done += sp
        finally:
            if old_hup is not None:
                signal.signal(signal.SIGHUP, old_hup)
            signal.signal(signal.SIGINT, signal.SIG_DFL)
        print(f"[cli] {done}/{spp} spp within budget", file=sys.stderr)
        img = state["acc"] if args.raw else film_develop(state["acc"])
    else:
        img = render_fn(scene, integrator=integrator, **kw)

    import jax
    jax.block_until_ready(img)
    dt = time.time() - t0
    W, H = scene.sensor.film_resolution
    print(f"[cli] rendered {W}x{H} @ {spp}spp ({integrator}) "
          f"in {dt:.2f}s", file=sys.stderr)
    write_image(args.output, np.asarray(img))
    print(f"[cli] wrote {args.output}", file=sys.stderr)
    return 0


def _quilt_gif(args):
    """to_gif.py parity: quilt -> per-view frames -> animated gif."""
    import numpy as np
    from PIL import Image

    from .core.bitmap import read_image
    from .utils.quilt import quilt_slice

    cols, rows = (int(x) for x in args.grid.lower().split("x"))
    quilt = read_image(args.scene)
    views = quilt_slice(np.asarray(quilt), (cols, rows))
    frames = [
        Image.fromarray(
            (np.clip(v, 0, 1) ** (1 / 2.2) * 255).astype(np.uint8))
        for v in views]
    frames += frames[-2:0:-1]     # ping-pong loop like to_gif.py
    frames[0].save(args.quilt_gif, save_all=True,
                   append_images=frames[1:], duration=80, loop=0)
    print(f"[cli] wrote {args.quilt_gif} ({len(frames)} frames)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
