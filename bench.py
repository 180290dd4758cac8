#!/usr/bin/env python3
"""Decode benchmark: all-intra Main10 stream (BASELINE config 1 shape).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is fps / 60 (the real-time target anchor; the reference
publishes no in-repo numbers — see BASELINE.md).

Measures the fastest correct configuration: the native host fast path,
GOP-parallel across worker processes when cores allow (the reference
likewise uses every core), Pallas/JAX device stages where they win.
"""

import json
import os
import time


def main() -> None:
    from vvdec_tpu.decoder import decode_to_yuv
    from vvdec_tpu.parallel import decode_annexb_parallel, make_worker_pool
    from vvdec_tpu.testenc.encoder import generate_stream

    width, height, n_frames = 832, 480, 8
    stream, _ = generate_stream(width=width, height=height, ctu=64,
                                n_frames=n_frames, seed=1, qp=32,
                                dec_kw=dict(split_prob=0.35, density=0.1))
    # warmup (native extension build, caches)
    warm, _ = generate_stream(width=width, height=height, ctu=64,
                              n_frames=1, seed=1, qp=32,
                              dec_kw=dict(split_prob=0.35, density=0.1))
    decode_to_yuv(warm)

    t0 = time.time()
    decode_to_yuv(stream)
    serial_fps = n_frames / (time.time() - t0)

    best = serial_fps
    workers = min(os.cpu_count() or 1, n_frames)
    if workers > 1:
        pool = make_worker_pool(workers)
        try:
            decode_annexb_parallel(stream, executor=pool)  # pool warm
            t0 = time.time()
            decode_annexb_parallel(stream, executor=pool)
            par_fps = n_frames / (time.time() - t0)
        finally:
            pool.shutdown()
        best = max(best, par_fps)

    print(json.dumps({
        "metric": f"all-intra {width}x{height} Main10 decode",
        "value": round(best, 4),
        "unit": "frames/s",
        "vs_baseline": round(best / 60.0, 5),
    }))


if __name__ == "__main__":
    main()
