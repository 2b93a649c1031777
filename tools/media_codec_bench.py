"""Single-core throughput envelope for the pure-python media codecs.

The full pixel/PCM decoders (multimodal.decode_png_pixels /
decode_gif_pixels / decode_jpeg_pixels / decode_wav_samples) are
correctness-first python+stdlib code; inside mapInPandas they are the
CPU-bound inner loop of media_features/resize_media. This measures
decoded-payload MB/s per core so capacity planning is arithmetic, and
is the number MAX_DECODE_BYTES (the decode-bomb cap) is sized against:
cap / slowest-codec-MB/s = worst-case seconds one payload can pin a
core.

Usage: python tools/media_codec_bench.py [--json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from baker_spark.datapipe import multimodal as M  # noqa: E402


def _time_decode(name, payload, fn, min_sec=1.0):
    # warm once (imports, first-call dict builds), then run for >=min_sec
    assert fn(payload) is not None, f"{name}: payload does not decode"
    n, t0 = 0, time.perf_counter()
    while True:
        fn(payload)
        n += 1
        dt = time.perf_counter() - t0
        if dt >= min_sec:
            break
    mb = len(payload) / 1e6
    return {
        "codec": name,
        "payload_bytes": len(payload),
        "decodes_per_sec": round(n / dt, 2),
        "mb_per_sec_per_core": round(n * mb / dt, 3),
    }


def main() -> int:
    rows = [
        _time_decode("png-gray", M.png_pixel_bytes(256, 256, 1), M.decode_png_pixels),
        _time_decode("gif", M.gif_pixel_bytes(128, 128, 2), M.decode_gif_pixels),
        _time_decode("jpeg-baseline", M.jpeg_pixel_bytes(64, 64, 3), M.decode_jpeg_pixels),
        _time_decode("wav-pcm16", M.wav_pcm_bytes(16000, 64000, 4), M.decode_wav_samples),
    ]
    if "--json" in sys.argv:
        print(json.dumps(rows))
        return 0
    print(f"{'codec':<14} {'payload':>9} {'dec/s':>9} {'MB/s/core':>10}")
    for r in rows:
        print(
            f"{r['codec']:<14} {r['payload_bytes']:>9} "
            f"{r['decodes_per_sec']:>9} {r['mb_per_sec_per_core']:>10}"
        )
    slowest = min(rows, key=lambda r: r["mb_per_sec_per_core"])
    worst = M.MAX_DECODE_BYTES / 1e6 / slowest["mb_per_sec_per_core"]
    print(
        f"\nMAX_DECODE_BYTES={M.MAX_DECODE_BYTES} -> worst-case "
        f"{worst:.0f}s/core per payload via {slowest['codec']}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
