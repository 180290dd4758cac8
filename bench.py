#!/usr/bin/env python3
"""Decode benchmark: all-intra Main10 stream (BASELINE config 1 shape).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is fps / 60 (the real-time target anchor; the reference
publishes no in-repo numbers — see BASELINE.md).
"""

import json
import sys
import time


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/vvdec_jaxcache")

    from vvdec_tpu.decoder import decode_to_yuv
    from vvdec_tpu.testenc.encoder import generate_stream

    width, height, n_frames = 832, 480, 2
    stream, _ = generate_stream(width=width, height=height, ctu=64,
                                n_frames=n_frames, seed=1, qp=32,
                                dec_kw=dict(split_prob=0.35, density=0.1))
    # warmup (jit compile of device stages)
    decode_to_yuv(stream, use_jax=True)
    t0 = time.time()
    decode_to_yuv(stream, use_jax=True)
    dt = time.time() - t0
    fps = n_frames / dt
    print(json.dumps({
        "metric": f"all-intra {width}x{height} Main10 decode",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 5),
    }))


if __name__ == "__main__":
    main()
