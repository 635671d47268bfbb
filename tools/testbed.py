#!/usr/bin/env python
"""Headless testbed driver — the Testbed/Framework/Main.cpp analog.

Steps any zoo scene and renders it: per-step SVG frames, a single
SMIL-animated SVG, or a live step-rate report. There is no GUI by design
(the engine is a library; see draw.py for the b2Draw analog) — this driver
is how a human inspects a scene without writing code:

    python tools/testbed.py pyramid --steps 240 --animate /tmp/pyramid.svg
    python tools/testbed.py car --args 'dict()' --frames /tmp/car_frames
    python tools/testbed.py tumbler --steps 600 --report

Scenes are the public functions in box2d_mt_tpu.models.scenes; positional
scene args go through --args (a Python literal tuple/dict).
"""

import argparse
import ast
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", help="scene function name in models/scenes.py")
    ap.add_argument("--args", default="()",
                    help="Python literal: positional args tuple, e.g. '(8,)'")
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--hz", type=float, default=60.0)
    ap.add_argument("--vel-iters", type=int, default=8)
    ap.add_argument("--pos-iters", type=int, default=3)
    ap.add_argument("--frames", default=None,
                    help="directory for per-step SVG frames")
    ap.add_argument("--every", type=int, default=4,
                    help="render every Nth step")
    ap.add_argument("--animate", default=None,
                    help="write ONE SMIL-animated SVG to this path")
    ap.add_argument("--report", action="store_true",
                    help="print steps/sec + body stats, render nothing")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--scale", type=float, default=10.0)
    args = ap.parse_args()

    import numpy as np
    from box2d_mt_tpu import world, draw
    from box2d_mt_tpu.models import scenes

    build = getattr(scenes, args.scene, None)
    if build is None:
        names = [n for n in dir(scenes)
                 if not n.startswith("_") and callable(getattr(scenes, n))]
        sys.exit(f"unknown scene '{args.scene}'; available: "
                 + ", ".join(sorted(names)))
    sargs = ast.literal_eval(args.args)
    if not isinstance(sargs, tuple):
        sargs = (sargs,)
    built = build(*sargs)
    st = built[0] if isinstance(built, tuple) else built
    aux = built[1] if isinstance(built, tuple) else None

    kinds = world.possible_kinds(st)
    dt = 1.0 / args.hz
    if args.frames:
        os.makedirs(args.frames, exist_ok=True)

    frames = []
    t0 = time.perf_counter()
    for i in range(args.steps):
        if aux is not None and "floater" in aux:
            st = scenes.floater_drive(st, aux, dt)
        st, ev = world.step(st, dt, velocity_iterations=args.vel_iters,
                            position_iterations=args.pos_iters, kinds=kinds)
        if args.report or i % args.every:
            continue
        svg = draw.draw_svg(st, width=args.width, height=args.height,
                            scale=args.scale)
        if args.frames:
            with open(os.path.join(args.frames, f"frame_{i:05d}.svg"),
                      "w") as f:
                f.write(svg)
        if args.animate:
            frames.append(svg)
    elapsed = time.perf_counter() - t0

    awake = int(np.asarray(st.bodies.awake
                           & (np.asarray(st.bodies.body_type) == 2)).sum())
    live = int((np.asarray(st.bodies.body_type) >= 0).sum())
    print(f"{args.scene}: {args.steps} steps in {elapsed:.2f}s "
          f"({args.steps / elapsed:.1f} steps/s incl. compile), "
          f"{live} bodies, {awake} awake at end")

    if args.animate and frames:
        # stack frames into one SMIL-animated SVG (each frame toggled by a
        # shared repeating timer)
        n = len(frames)
        period = n * args.every / args.hz
        parts = [f'<svg xmlns="http://www.w3.org/2000/svg" '
                 f'width="{args.width}" height="{args.height}">']
        for k, svg in enumerate(frames):
            inner = svg.split(">", 1)[1].rsplit("</svg>", 1)[0]
            t_on = k * args.every / args.hz
            parts.append(
                f'<g visibility="hidden">'
                f'<set attributeName="visibility" to="visible" '
                f'begin="anim.begin+{t_on:.3f}s" '
                f'dur="{args.every / args.hz:.3f}s"/>' + inner + "</g>")
        parts.insert(1, f'<rect width="0" height="0">'
                        f'<animate id="anim" attributeName="x" from="0" '
                        f'to="0" begin="0s;anim.end" dur="{period:.3f}s"/>'
                        f'</rect>')
        parts.append("</svg>")
        with open(args.animate, "w") as f:
            f.write("".join(parts))
        print(f"wrote {args.animate} ({n} frames, {period:.1f}s loop)")


if __name__ == "__main__":
    main()
