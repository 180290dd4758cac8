"""Tracing / profiling / logging subsystem."""

import numpy as np


def test_profiler_stages(tmp_path):
    from vvdec_tpu.decoder import decode_annexb
    from vvdec_tpu.utils.trace import profiler
    from vvdec_tpu.testenc.encoder import generate_stream
    stream, _ = generate_stream(width=96, height=64, ctu=32, n_frames=2,
                                seed=1, qp=32,
                                dec_kw=dict(split_prob=0.3, density=0.1))
    profiler.reset()
    profiler.enabled = True
    try:
        decode_annexb(stream)
    finally:
        profiler.enabled = False
    rep = profiler.report()
    assert "parse" in rep and "recon" in rep and "deblock" in rep


def test_trace_rule_filtering(tmp_path):
    from vvdec_tpu.decoder import decode_annexb
    from vvdec_tpu.utils.trace import set_tracing
    from vvdec_tpu.testenc.encoder import generate_stream
    stream, _ = generate_stream(width=96, height=64, ctu=32, n_frames=3,
                                seed=1, qp=32,
                                dec_kw=dict(split_prob=0.3, density=0.1))
    path = tmp_path / "trace.txt"
    set_tracing(str(path), "D_PIC:poc==1")
    try:
        decode_annexb(stream)
    finally:
        set_tracing(None)
    lines = path.read_text().splitlines()
    assert lines == ["poc=1 type=IDR"]


def test_logging_callback():
    from vvdec_tpu.utils.trace import (msg, set_log_level,
                                       set_logging_callback, INFO)
    got = []
    set_logging_callback(lambda lvl, text: got.append((lvl, text)))
    set_log_level(INFO)
    try:
        msg(INFO, "hello")
    finally:
        set_logging_callback(None)
        set_log_level(2)
    assert got == [(INFO, "hello")]
