"""Track a video clip / image dir and write MOTChallenge predictions.

Composes the new pieces end to end: VideoFrameSource (runtime/video.py)
-> deployed pipeline via the Executor with the multi-target tracker
(perception/tracking.MultiTargetTracker, the id'd extension of the
reference's single-target lock, IEExecutor.cs:561-651) -> standard
MOTChallenge rows (frame,id,left,top,w,h,conf,-1,-1,-1; pixel
coordinates, 1-based frames), directly scoreable by
`python -m xrseg_tpu.eval.mot --gt gt.txt --pred pred.txt` (or inline
via --gt here).

  python tools/track_video.py --video clip.y4m --out pred.txt \
      --sentis yolo11n-seg-sentis.sentis
  python tools/track_video.py --images frames/ --out pred.txt --gt gt.txt
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..")))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", help="clip (.y4m / MJPEG .avi)")
    ap.add_argument("--images", help="image dir (alternative to --video)")
    ap.add_argument("--out", required=True, help="MOTChallenge pred file")
    ap.add_argument("--gt", default=None,
                    help="MOTChallenge GT file: score inline (CLEAR-MOT "
                         "+ IDF1) after tracking")
    ap.add_argument("--scale", default="n", choices=list("nsmlx"))
    ap.add_argument("--arch", default="yolo11",
                    choices=["yolo11", "yolov8"])
    ap.add_argument("--ckpt", default=None,
                    help="weights (.sentis/.onnx/.pt/.npz/orbax)")
    ap.add_argument("--sentis", default=None,
                    help="alias for --ckpt (reference artifact)")
    ap.add_argument("--score-threshold", type=float, default=None)
    ap.add_argument("--max-frames", type=int, default=0,
                    help="stop after N frames (0 = all)")
    ap.add_argument("--motion", action="store_true",
                    help="Kalman motion model in the tracker")
    ap.add_argument("--byte-track", type=float, default=0.0,
                    metavar="HIGH",
                    help="ByteTrack two-stage association: HIGH is the "
                         "confident gate (e.g. 0.25); the pipeline gate "
                         "drops to 0.1 so low-score detections reach "
                         "the tracker's recovery stage")
    ap.add_argument("--save-video", default=None, metavar="OUT.AVI",
                    help="also write an annotated MJPEG clip (box "
                         "overlays, runtime/video.MJPEGWriter)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if not args.video and not args.images:
        ap.error("--video or --images required")

    import dataclasses

    import numpy as np

    import xrseg_tpu
    xrseg_tpu.enable_compile_cache()
    from xrseg_tpu.config import TEST_PRESET, ExecutorConfig, ModelConfig
    from xrseg_tpu.runtime.executor import Executor

    if args.video:
        from xrseg_tpu.runtime.video import VideoFrameSource
        src = VideoFrameSource(args.video)
    else:
        from xrseg_tpu.runtime.frame_source import FileFrameSource
        src = FileFrameSource(args.images, interval_s=0.0, loop=False)
    if not src.open():
        print("no frames found", file=sys.stderr)
        return 2

    params = None
    weights = args.ckpt or args.sentis
    if weights:
        from xrseg_tpu.io.weights import load_params_auto
        params, _ = load_params_auto(
            weights, ModelConfig(arch=args.arch, scale=args.scale))

    post = TEST_PRESET.post
    if args.score_threshold is not None:
        post = dataclasses.replace(post,
                                   score_threshold=args.score_threshold)
    if args.byte_track > 0:
        post = dataclasses.replace(
            post, score_threshold=min(post.score_threshold, 0.1))
    cfg = ExecutorConfig(model=ModelConfig(arch=args.arch,
                                           scale=args.scale),
                         post=post, multi_tracking=True,
                         motion_model=args.motion,
                         track_high_score=args.byte_track)

    first = next(src.frames())
    fh, fw = first.rgb.shape[:2]
    ex = Executor(cfg, params=params, frame_hw=(fh, fw))
    print(f"tracking {fw}x{fh} frames ({args.arch}-{args.scale})",
          flush=True)

    writer = None
    if args.save_video:
        from xrseg_tpu.runtime.video import MJPEGWriter
        fps = getattr(src, "fps", 0) or 25.0
        writer = MJPEGWriter(args.save_video, fps=fps)

    rows = []
    n = 0
    for fd in src.frames():
        if args.max_frames and n >= args.max_frames:
            break
        r = ex.run_sync(fd)
        if writer is not None:
            writer.add(ex.boxer.draw_boxes(fd.rgb, r.boxes))
        for t in (r.tracks or []):
            b = t.box
            # center-origin screen space (Y up) -> pixel left/top
            left = (b.center_x + fw / 2.0) - b.width / 2.0
            top = (fh / 2.0 - b.center_y) - b.height / 2.0
            rows.append(f"{n + 1},{t.track_id},{left:.2f},{top:.2f},"
                        f"{b.width:.2f},{b.height:.2f},{b.score:.4f},"
                        f"-1,-1,-1")
        n += 1
        if n % 25 == 0:
            print(f"  frame {n}: {len(rows)} rows so far", flush=True)
    src.close()
    if writer is not None:
        writer.close()
        print(f"annotated clip: {args.save_video} ({writer.n} frames)")

    with open(args.out, "w") as f:
        f.write("\n".join(rows) + ("\n" if rows else ""))
    print(f"{n} frames -> {len(rows)} track rows -> {args.out}")

    if args.gt:
        from xrseg_tpu.eval.mot import evaluate_mot, load_motchallenge
        gt = load_motchallenge(args.gt)
        pred = load_motchallenge(args.out)
        m = evaluate_mot(gt, pred)
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in m.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
