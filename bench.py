#!/usr/bin/env python3
"""Decode benchmark over the staged BASELINE configs.

Every config is measured BOTH with this decoder (fastest correct host
configuration) and with the reference binary (`vvdecapp`, built from
/root/reference) on the same stream, same host, same thread budget.
Prints ONE JSON line for the headline config (all-intra 832x480 Main10,
comparable across rounds) where `vs_baseline` = our fps / vvdecapp fps —
the ratio against the reference decoder itself.  The full per-config
table (ours, reference, ratio) goes to stderr and is recorded in
BASELINE.md.  If the reference binary is unavailable (`VVDEC_REF_BIN`,
default /tmp/vvdec_bin/vvdecapp), falls back to the historic 60-fps
real-time anchor and says so.

Each config measures: serial, recon-while-parse threading (threads=2),
GOP-parallel worker processes, and their combination.  The device (TPU)
pipeline is measured separately (BASELINE.md): on this environment's
~30 MB/s, ~25 ms-RTT tunneled chip the per-frame transfers bound any
device path below the host numbers (see BASELINE.md).
"""

import json
import os
import re
import subprocess
import sys
import tempfile
import time

REF_BIN = os.environ.get("VVDEC_REF_BIN", "/tmp/vvdec_bin/vvdecapp")


def _ref_fps(stream: bytes, loops: int = 3) -> float | None:
    """Run the reference vvdecapp on the same stream; return its fps."""
    if not os.path.exists(REF_BIN):
        return None
    with tempfile.NamedTemporaryFile(suffix=".266", delete=False) as f:
        f.write(stream)
        path = f.name
    try:
        r = subprocess.run(
            [REF_BIN, "-b", path, "-t", str(os.cpu_count() or 1),
             "-L", str(loops)],
            capture_output=True, text=True, timeout=600)
        if r.returncode != 0:
            return None
        out = r.stdout + r.stderr  # fps summary goes to stdout
        m = re.search(r"avg\. fps for \d+ loops: ([\d.]+) Hz", out)
        if m is not None:
            return float(m.group(1))
        # fallback: the LAST progress line (the final rate, not a warm-up
        # sample — stdout carries periodic "@ N fps" progress lines)
        all_m = re.findall(r"@ ([\d.]+) fps", out)
        return float(all_m[-1]) if all_m else None
    finally:
        os.unlink(path)


def _ld_stream(w, h, n, seed, dec_kw, sps_kw=None, sh_on=False):
    """IDR + low-delay P chain (refs: prev, prev2)."""
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.hls.params import P_SLICE
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import RandomDecisions
    from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps

    sps = E.make_sps(w, h, ctu=64, num_reorder_pics=[0], **(sps_kw or {}))
    pps = E.make_pps(sps)
    bw = BitWriter()
    write_sps(bw, sps)
    st = make_nal(NalUnitType.SPS, bw.bytes())
    bw = BitWriter()
    write_pps(bw, pps, sps)
    st += make_nal(NalUnitType.PPS, bw.bytes())
    sh_kw = dict(sao_enabled_luma=True, sao_enabled_chroma=True) \
        if sh_on else None
    for f in range(n):
        dec = RandomDecisions(seed=seed * 100 + f, **dec_kw)
        if f == 0:
            nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=0, idr=True,
                                    sh_kw=sh_kw)
        else:
            nal, _ = E.encode_frame(
                sps, pps, dec, qp=32, poc=f, idr=False,
                slice_type=P_SLICE,
                ref_deltas=((1, 2) if f >= 2 else (1,), ()),
                sh_kw=sh_kw)
        st += nal
    return st


def _intra_stream(w, h, n, seed, filters=False):
    from vvdec_tpu.testenc.encoder import generate_stream
    if not filters:
        s, _ = generate_stream(width=w, height=h, ctu=64, n_frames=n,
                               seed=seed, qp=32,
                               dec_kw=dict(split_prob=0.35, density=0.1))
        return s
    # full in-loop filter workload: SAO + ALF/CC-ALF with real APSs
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import RandomDecisions, make_alf_aps
    from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps
    sps = E.make_sps(w, h, ctu=64, sao_enabled=True, alf_enabled=True,
                     ccalf_enabled=True)
    pps = E.make_pps(sps)
    bw = BitWriter()
    write_sps(bw, sps)
    st = make_nal(NalUnitType.SPS, bw.bytes())
    bw = BitWriter()
    write_pps(bw, pps, sps)
    st += make_nal(NalUnitType.PPS, bw.bytes())
    apss = {}
    for i in range(2):
        aps, nal = make_alf_aps(seed * 10 + i, aps_id=i, cc=True)
        apss[i] = aps
        st += nal
    sh_kw = dict(sao_enabled_luma=True, sao_enabled_chroma=True,
                 alf_enabled=[True, True, True],
                 num_alf_aps_ids_luma=2, alf_aps_ids_luma=[0, 1],
                 alf_aps_id_chroma=0,
                 ccalf_cb_enabled=apss[0].cc_alf.new_filter[0],
                 ccalf_cb_aps_id=0,
                 ccalf_cr_enabled=apss[1].cc_alf.new_filter[1],
                 ccalf_cr_aps_id=1)
    for f in range(n):
        dec = RandomDecisions(seed=seed * 100 + f, split_prob=0.35,
                              density=0.1, sao_prob=0.5)
        nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=f, idr=True,
                                sh_kw=sh_kw, alf_apss=apss)
        st += nal
    return st


def _device_fps(stream, n_frames):
    """fps of the device (TPU) pipeline on this stream, plus the
    fallback census — measured and reported every round even when the
    host plane wins on this rig (the tunneled chip's ~30 MB/s link
    bounds any per-frame readback path; see BASELINE.md)."""
    if os.environ.get("VVDEC_BENCH_NO_DEVICE") == "1":
        return None, {}
    try:
        import jax
        try:  # persistent compile cache: cold bench runs reuse programs
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/jax_bench_cache")
        except Exception:
            pass
        from vvdec_tpu.api import Decoder, DecoderParams
        from vvdec_tpu.decoder import decode_annexb

        t_warm = time.time()
        decode_annexb(stream, use_jax=True)  # warm (compile)
        warm_s = time.time() - t_warm
        best = 0.0
        # budget guard: a cold compile sweep (uncached rig) can cost
        # minutes on the tunneled chip; one timed run then suffices
        for _ in range(1 if warm_s > 120 else 2):
            t0 = time.time()
            decode_annexb(stream, use_jax=True)
            best = max(best, n_frames / (time.time() - t0))
        d = Decoder(DecoderParams(use_device_pipeline=True))
        d.decode(stream)
        d.flush()
        return best, d.get_fallback_census()
    except Exception as e:  # never let the device row break the bench
        print(f"device path failed: {e!r}", file=sys.stderr)
        return None, {}


def _best_fps(stream, n_frames, pool):
    """Fastest correct configuration for one stream.

    Measures frame-object decode (planes out, no YUV byte packing) — the
    same work `vvdecapp` does when run without `-o` (zero-copy
    vvdecFrames, no file write), so the vs_reference ratio compares like
    for like."""
    from vvdec_tpu.decoder import decode_annexb
    from vvdec_tpu.parallel import decode_annexb_parallel

    results = {}

    def run(name, fn):
        fn()  # warm
        best = 0.0
        for _ in range(2):
            t0 = time.time()
            fn()
            best = max(best, n_frames / (time.time() - t0))
        results[name] = best

    run("serial", lambda: decode_annexb(stream))
    run("threads=2", lambda: decode_annexb(stream, threads=2))
    if pool is not None:
        run("pool", lambda: decode_annexb_parallel(stream, executor=pool))
        run("pool+threads",
            lambda: decode_annexb_parallel(stream, executor=pool,
                                           threads=2))
    best = max(results, key=results.get)
    return results[best], best, results


def main() -> None:
    from vvdec_tpu.decoder import decode_to_yuv
    from vvdec_tpu.parallel import make_worker_pool

    workers = min(os.cpu_count() or 1, 8)
    pool = make_worker_pool(workers) if workers > 1 else None
    inter_kw = dict(split_prob=0.35, inter_prob=0.85, skip_prob=0.3,
                    mv_range=32)

    from vvdec_tpu.testenc.encoder import generate_stream
    dense, _ = generate_stream(width=832, height=480, ctu=64, n_frames=8,
                               seed=3, qp=27,
                               dec_kw=dict(split_prob=0.35, density=0.5))

    # encoder-realistic intra toolset (MIP + CCLM + LFNST + explicit MTS):
    # what real encoders emit, exercising the full C intra tool set
    rich, _ = generate_stream(
        width=832, height=480, ctu=64, n_frames=8, seed=3, qp=30,
        sps_kw=dict(mip_enabled=True, cclm_enabled=True,
                    lfnst_enabled=True, mts_enabled=True,
                    explicit_mts_intra=True),
        dec_kw=dict(split_prob=0.35, density=0.3, mip_prob=0.25))

    # conformance-load analog (no JVET downloads in this environment):
    # maximum coefficient density at low QP, the heaviest residual
    # workload the constrained writer produces
    maxdense, _ = generate_stream(width=832, height=480, ctu=64,
                                  n_frames=6, seed=7, qp=22,
                                  dec_kw=dict(split_prob=0.4,
                                              density=0.85,
                                              max_level=120))

    configs = [
        ("all-intra 832x480", _intra_stream(832, 480, 8, 1), 8,
         832 * 480),
        ("all-intra dense q27 832x480", dense, 8, 832 * 480),
        ("max-density q22 832x480 (conformance-load analog)", maxdense,
         6, 832 * 480),
        ("tool-rich intra (MIP/CCLM/LFNST/MTS) 832x480", rich, 8,
         832 * 480),
        ("all-intra+SAO/ALF 832x480",
         _intra_stream(832, 480, 8, 1, filters=True), 8, 832 * 480),
        ("inter-LD 832x480",
         _ld_stream(832, 480, 12, 5, inter_kw), 12, 832 * 480),
        ("all-intra+SAO/ALF 1920x1080",
         _intra_stream(1920, 1080, 4, 1, filters=True), 4, 1920 * 1080),
        ("inter-LD 1920x1080",
         _ld_stream(1920, 1080, 6, 5, inter_kw), 6, 1920 * 1080),
    ]

    headline = headline_ref = None
    dev_fps = dev_census = None
    dev_inter_fps = None
    try:
        for ci, (name, stream, n, pels) in enumerate(configs):
            fps, cfg, all_r = _best_fps(stream, n, pool)
            ref = _ref_fps(stream)
            vs = f" ref={ref:.1f} vs_reference={fps / ref:.2f}" if ref \
                else ""
            dv = ""
            if ci == 0 or name.startswith("inter-LD 832"):
                # headline + inter-LD: measure the TPU pipeline fps too
                # (the persistent compile cache bounds the inter path's
                # MC shape-class compiles across runs)
                dfps, census = _device_fps(stream, n)
                if dfps is not None:
                    dv = f" device={dfps:.1f}"
                    if census:
                        dv += " device_fallbacks=" + ",".join(
                            f"{k}:{v}" for k, v in sorted(census.items()))
                if ci == 0:
                    dev_fps, dev_census = dfps, census
                elif dfps is not None:
                    dev_inter_fps = dfps
            print(f"{name}: {fps:.1f} fps ({fps * pels / 1e6:.1f} MP/s) "
                  f"best={cfg}{vs}{dv} " + " ".join(
                      f"{k}={v:.1f}" for k, v in all_r.items()),
                  file=sys.stderr)
            if headline is None:
                headline, headline_ref = fps, ref
    finally:
        if pool is not None:
            pool.shutdown()

    out = {
        "metric": "all-intra 832x480 Main10 decode",
        "value": round(headline, 4),
        "unit": "frames/s",
    }
    if dev_fps is not None:
        out["device_fps"] = round(dev_fps, 2)
        if dev_census:
            out["device_fallbacks"] = dict(dev_census)
    if dev_inter_fps is not None:
        out["device_inter_fps"] = round(dev_inter_fps, 2)
    if headline_ref:
        out["vs_baseline"] = round(headline / headline_ref, 5)
        out["reference_fps"] = round(headline_ref, 2)
        out["baseline"] = "vvdecapp (reference binary, same stream/host)"
    else:
        out["vs_baseline"] = round(headline / 60.0, 5)
        out["baseline"] = "60 fps real-time anchor (vvdecapp unavailable)"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
