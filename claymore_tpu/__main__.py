"""Command-line scene runner.

TPU-native equivalent of the reference CLI (reference: Projects/GMPM/gmpm.cu
:168-210 — ``gmpm -f scenes/scene.json``): load a JSON scene, run the frame
loop, stream per-frame .bgeo particle dumps through the async IO thread.

    python -m claymore_tpu -f scene.json [-o outdir] [--frames N] [--profile]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser("claymore_tpu", description=__doc__)
    ap.add_argument("-f", "--file", default="scenes/scene.json",
                    help="scene configuration file")
    ap.add_argument("-o", "--out", default="output", help="output directory")
    ap.add_argument("--frames", type=int, default=None,
                    help="override frame count")
    ap.add_argument("--tile-chunk", type=int, default=64)
    ap.add_argument("--no-output", action="store_true",
                    help="simulate without writing .bgeo frames")
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="save a resumable checkpoint every N frames")
    ap.add_argument("--resume", default=None,
                    help="checkpoint file to resume from")
    ap.add_argument("--profile", action="store_true",
                    help="print per-stage timings at the end")
    args = ap.parse_args()

    from .io.scene import load_scene
    from .io import checkpoint as ckpt
    from .utils.timers import StageTimer
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"loading scene [{args.file}]")
    scene = load_scene(args.file, tile_chunk=args.tile_chunk)
    engine, state = scene.engine, scene.state
    frames = args.frames if args.frames is not None else scene.frames
    os.makedirs(args.out, exist_ok=True)

    if args.resume:
        state = ckpt.load_state(args.resume, state)
        print(f"resumed from {args.resume} at t={float(state.t):.6f} "
              f"step={int(state.step)}")

    timer = StageTimer(enabled=True)

    def dump(frame_idx, st):
        if not args.no_output:
            for mi in range(len(scene.materials)):
                path = os.path.join(args.out, f"model{mi}_frame{frame_idx:04d}.bgeo")
                ckpt.save_frame_bgeo(path, engine, st, mi)
        if args.checkpoint_every and (frame_idx + 1) % args.checkpoint_every == 0:
            ckpt.save_state(os.path.join(args.out, f"ckpt_{frame_idx:04d}.npz"), st)

    dump(-1, state)  # frame 0 state, reference writes the initial cloud too
    t_start = time.perf_counter()
    for f in range(frames):
        timer.tick()
        state = engine.run_frame(
            state, float(state.t) + scene.cfg.frame_dt()
        ) if hasattr(engine, "run_frame") else engine.run(state, 1)
        timer.tock(f"frame", state)
        d = engine.diagnostics(state)
        print(f"frame {f + 1}/{frames}: t={d['t']:.5f} steps={d.get('step', '?')} "
              f"dt={d['dt']:.3e} mass={d['grid_mass']:.6f}")
        dump(f, state)
    wall = time.perf_counter() - t_start

    ckpt.flush_io()
    print(f"done: {frames} frames in {wall:.2f}s")
    if args.profile:
        print(timer.report())


if __name__ == "__main__":
    main()
