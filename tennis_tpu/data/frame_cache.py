"""One-time pre-resized frame cache (no reference counterpart).

The reference decodes the full-resolution 720p JPEG of every frame on every
epoch (reference train.py:132-147 feeds Resize(data_shape+32)+crop straight
from the raw frames tree; dataset.py:219-227 does the read). After the native
decoder, host JPEG decode is still the end-to-end bottleneck of the rebuilt
pipeline (~6.3 ms/frame/core, README) — and ~55% of the decoded pixels are
thrown away by the very first Resize. This tool resizes the frames tree ONCE
to that resize target (short side ``data_shape + 32``), so every subsequent
epoch decodes only the pixels it keeps.

The cache is an opt-in speed/fidelity trade (one JPEG re-encode at
``quality`` plus the resample moving from load time to build time; PARITY.md
D16) consumed via ``TennisSet(frames_cache=S)`` / driver ``--frames_cache S``.
Reads fall back to the original tree per file, so a partial cache is safe.

Build (same chunked process fan-out as frame extraction,
tennis_tpu.data.video):

    python -m tennis_tpu.data.frame_cache --root data --short 544
"""
from __future__ import annotations

import os
import shutil
from concurrent.futures import ProcessPoolExecutor, as_completed


def cache_dir(root: str, short: int) -> str:
    """``<root>/frames_s<short>`` — the cache mirror of ``<root>/frames``."""
    return os.path.join(root, f"frames_s{short}")


def _source_short_side(src: str):
    """True (undecoded) short side of ``src``, via the native header-only
    parse; None when it cannot be determined cheaply."""
    from tennis_tpu.native.jpeg import jpeg_dims_file

    dims = jpeg_dims_file(src)
    if dims is not None:
        return min(dims)
    import cv2  # no native decoder: a full decode still beats a re-encode

    img = cv2.imread(src)
    return None if img is None else min(img.shape[:2])


def resize_encode_one(src: str, dst: str, short: int, quality: int = 95) -> bool:
    """Write ``dst`` as ``src`` resized to short side ``short``; returns whether
    a write happened. Fresh destinations (mtime >= source's) are skipped.
    Sources whose short side is already <= the target are copied verbatim — no
    pointless re-encode generation loss.

    Writes land via a temp file + atomic ``os.replace``: the freshness check
    above trusts mtime, so a build killed mid-write must never leave a
    truncated-but-fresh ``dst`` that every later incremental re-run skips."""
    if os.path.exists(dst) and os.path.getmtime(dst) >= os.path.getmtime(src):
        return False
    import cv2

    from tennis_tpu.data.tennis_set import _read_image_rgb
    from tennis_tpu.data.transforms import resize_shorter

    img = _read_image_rgb(src, min_short=short)  # DCT prescale where >= 2x
    tmp = f"{dst}.tmp.{os.getpid()}.jpg"  # cv2 needs the extension
    try:
        # The prescaled decode's short side is >= `short` whenever a scale
        # engaged (native/jpeg.py tjp_dims contract), so a decode BELOW the
        # target proves the SOURCE is already small -> copy verbatim. AT the
        # target is ambiguous (exactly-sized source, or a /2^k prescale of a
        # larger one landing on it) -> disambiguate with a header-only parse
        # of the SOURCE dims and copy verbatim only when the source itself is
        # at the target; a possibly-full-res original must never be copied
        # into the cache. Without the native decoder no prescale can engage
        # (cv2 always decodes full-res), so the decoded shape IS the source
        # shape — don't pay _source_short_side's full-decode fallback for an
        # answer we already hold.
        from tennis_tpu.native.jpeg import HAVE_NATIVE_JPEG

        decoded_short = min(img.shape[:2])
        if decoded_short < short or (
                decoded_short == short and
                (not HAVE_NATIVE_JPEG or _source_short_side(src) == short)):
            shutil.copyfile(src, tmp)
        else:
            if min(img.shape[:2]) > short:
                img = resize_shorter(img, short)
            ok = cv2.imwrite(tmp, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                             [cv2.IMWRITE_JPEG_QUALITY, quality])
            if not ok:
                raise IOError(f"failed to write {dst}")
        os.replace(tmp, dst)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return True


def _build_chunk(src_chunk: str, dst_chunk: str, short: int, quality: int):
    os.makedirs(dst_chunk, exist_ok=True)
    written = skipped = 0
    for name in sorted(os.listdir(src_chunk)):
        if not name.endswith(".jpg"):
            continue
        if resize_encode_one(os.path.join(src_chunk, name),
                             os.path.join(dst_chunk, name), short, quality):
            written += 1
        else:
            skipped += 1
    return written, skipped


def build_frame_cache(root: str, short: int, quality: int = 95,
                      workers: int | None = None) -> tuple[int, int]:
    """Mirror ``<root>/frames`` into :func:`cache_dir` at short side ``short``.

    One process-pool task per chunk directory (the extraction fan-out shape,
    reference utils/video.py:139-145); re-runs are incremental — only stale or
    missing destinations are rewritten. Returns (written, skipped)."""
    src_root = os.path.join(root, "frames")
    dst_root = cache_dir(root, short)
    if not os.path.isdir(src_root):
        raise FileNotFoundError(f"no frames tree at {src_root}")

    chunks = []
    for video in sorted(os.listdir(src_root)):
        vdir = os.path.join(src_root, video)
        if not os.path.isdir(vdir):
            continue
        for chunk in sorted(os.listdir(vdir)):
            cdir = os.path.join(vdir, chunk)
            if os.path.isdir(cdir):
                chunks.append((cdir, os.path.join(dst_root, video, chunk)))

    written = skipped = 0
    workers = workers or os.cpu_count() or 8
    from tennis_tpu.utils import Progress

    progress = Progress(len(chunks), "frame cache chunks", unit="chunks")
    with ProcessPoolExecutor(max_workers=workers) as pool:
        futures = [pool.submit(_build_chunk, s, d, short, quality)
                   for s, d in chunks]
        for f in as_completed(futures):
            w, s = f.result()
            written += w
            skipped += s
            progress.update()
    progress.close()
    return written, skipped


def main(_argv=None):
    import sys

    from absl import flags

    fv = flags.FlagValues()
    flags.DEFINE_string("root", "data", "dataset root", flag_values=fv)
    flags.DEFINE_integer("short", 544, "cache short side (data_shape + 32)",
                         flag_values=fv)
    flags.DEFINE_integer("quality", 95, "JPEG re-encode quality", flag_values=fv)
    flags.DEFINE_integer("workers", 0, "process-pool size (0 = all cores)",
                         flag_values=fv)
    fv(["frame_cache"] + list(sys.argv[1:] if _argv is None else _argv))

    written, skipped = build_frame_cache(
        fv.root, fv.short, quality=fv.quality, workers=fv.workers or None
    )
    print(f"frame cache {cache_dir(fv.root, fv.short)}: "
          f"{written} written, {skipped} up to date")


if __name__ == "__main__":
    main()
