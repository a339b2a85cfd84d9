"""Dataset bootstrap: videos → frames → optical flow (reference data/process.py:9-30).

Run: ``python -m tennis_tpu.data.process --root data`` (the reference's version
is flagless and must be run from inside the dataset directory; the dir layout
``<root>/{videos,frames,flow}`` is unchanged).
"""
from __future__ import annotations

import argparse
import os

from tennis_tpu.data.video import video_to_frames

DEFAULT_VIDEOS = ("V006", "V007", "V008", "V009", "V010")


def vid2img(videos=DEFAULT_VIDEOS, videos_dir="videos", frames_dir="frames"):
    for video in videos:
        video_to_frames(
            video_path=os.path.join(videos_dir, video + ".mp4"),
            frames_dir=frames_dir,
            chunk_size=1000,
        )


def img2flw(frames_dir="frames", flow_dir="flow", params_path=None):
    from tennis_tpu.models.flownet_run import generate_flows

    generate_flows(image_dir=frames_dir, flow_dir=flow_dir,
                   params_path=params_path)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default=".",
                   help="dataset root holding videos/ (frames/ and flow/ are "
                        "created under it)")
    p.add_argument("--videos", nargs="*", default=list(DEFAULT_VIDEOS),
                   help="video ids to process")
    p.add_argument("--skip_flow", action="store_true",
                   help="stop after frame extraction")
    p.add_argument("--flownet_params", default=None,
                   help="converted FlowNet-S .npz (default: random init)")
    args = p.parse_args(argv)

    print("Video to Images")
    vid2img(videos=args.videos,
            videos_dir=os.path.join(args.root, "videos"),
            frames_dir=os.path.join(args.root, "frames"))
    if not args.skip_flow:
        print("Images to Flow")
        img2flw(frames_dir=os.path.join(args.root, "frames"),
                flow_dir=os.path.join(args.root, "flow"),
                params_path=args.flownet_params)


if __name__ == "__main__":
    main()
