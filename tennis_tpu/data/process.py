"""Dataset bootstrap: videos → frames → optical flow (reference data/process.py:9-30).

Run: ``python -m tennis_tpu.data.process --videos_dir data/videos ...``
"""
from __future__ import annotations

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
    print("Video to Images")
    vid2img()
    print("Images to Flow")
    img2flw()


if __name__ == "__main__":
    main()
