"""Multi-host GOP-parallel decoding over jax.distributed.

The distributed form of the frame-level pipeline parallelism (BASELINE
config 5; SURVEY.md §5 "Distributed communication backend"): the stream
splits at IRAP boundaries into independently decodable segments
(parallel/gop.py — the same tune-in semantics as the reference's random
access, DecLibParser.cpp:658-684), segments round-robin across the
processes of a jax.distributed job (one process per TPU host), each
process decodes its share with the local device pipeline, and decoded
frames return to process 0 over the JAX fabric (ICI within a slice,
DCN across hosts) via `multihost_utils.broadcast_one_to_all` per
segment.

Within a segment the DPB never crosses hosts — IRAP splitting makes
reference exchange unnecessary (GOPs are the natural distribution grain
for decode; inside one host the device-resident DPB of
ops/frame_device.py applies).  The only cross-host traffic is the
decoded output itself.

Environment: call `ensure_distributed()` once per process; it runs
`jax.distributed.initialize()` when a coordinator is configured (TPU
pod env vars or JAX_COORDINATOR_ADDRESS).  Single-process jobs decode
everything locally through the same code path — that degenerate case is
what this environment can test; the broadcast path compiles against the
public multihost API and needs a real multi-host job to execute.
"""

from __future__ import annotations

import numpy as np


def _segment_payload(pics) -> tuple[np.ndarray, np.ndarray]:
    """(meta int64, payload uint16) for one decoded segment.

    meta = [n_frames, then per frame: poc, n_planes, h0, w0, h1, w1,
    h2, w2] (zeros for absent planes); payload = all planes raveled in
    order."""
    meta = [len(pics)]
    parts = []
    for pic in pics:
        planes = [np.asarray(p) for p in pic.planes]
        meta.append(pic.poc)
        meta.append(len(planes))
        for k in range(3):
            if k < len(planes):
                meta.append(planes[k].shape[0])
                meta.append(planes[k].shape[1])
                parts.append(planes[k].astype(np.uint16).ravel())
            else:
                meta.append(0)
                meta.append(0)
    payload = np.concatenate(parts) if parts \
        else np.zeros(0, dtype=np.uint16)
    return np.asarray(meta, dtype=np.int64), payload


def _unpack_payload(meta: np.ndarray, payload: np.ndarray) -> list:
    """Inverse of _segment_payload: [(poc, [planes])] in decode order."""
    out = []
    pos = 0
    mpos = 1
    for _ in range(int(meta[0])):
        poc = int(meta[mpos])
        n_pl = int(meta[mpos + 1])
        dims = meta[mpos + 2: mpos + 8].reshape(3, 2)
        mpos += 8
        planes = []
        for k in range(n_pl):
            h, w = int(dims[k, 0]), int(dims[k, 1])
            planes.append(payload[pos: pos + h * w].reshape(h, w))
            pos += h * w
        out.append((poc, planes))
    return out


def decode_annexb_multihost(data: bytes, use_jax: bool = True,
                            threads: int = 0) -> list:
    """Decode a stream GOP-parallel across the processes of a
    jax.distributed job.  Returns, on process 0, a list of
    (poc, [uint16 planes]) in output order; [] on other processes.
    Single-process jobs run the identical path minus the broadcasts."""
    import jax

    from vvdec_tpu.decoder import StreamDecoder
    from vvdec_tpu.parallel.gop import split_irap_segments

    n_proc = jax.process_count()
    pid = jax.process_index()
    segments = split_irap_segments(data)

    mine: dict[int, list] = {}
    for si, seg in enumerate(segments):
        if si % n_proc != pid:
            continue
        dec = StreamDecoder(use_jax=use_jax, threads=threads)
        pics = dec.push(seg)
        pics.extend(dec.flush())
        mine[si] = pics

    if n_proc == 1:
        out = []
        for si in range(len(segments)):
            for pic in mine.get(si, []):
                out.append((pic.poc,
                            [np.asarray(p) for p in pic.planes]))
        return out

    # cross-host output exchange: two broadcasts per segment (sizes are
    # owner-known only, so lengths travel first), riding ICI/DCN
    from jax.experimental import multihost_utils as mhu

    out = []
    for si in range(len(segments)):
        owner = si % n_proc
        if pid == owner:
            meta, payload = _segment_payload(mine[si])
        else:
            meta = np.zeros(1, dtype=np.int64)
            payload = np.zeros(0, dtype=np.uint16)
        sizes = mhu.broadcast_one_to_all(
            np.asarray([meta.size, payload.size], dtype=np.int64),
            is_source=pid == owner)
        msz, psz = int(sizes[0]), int(sizes[1])
        mbuf = np.zeros(msz, dtype=np.int64)
        pbuf = np.zeros(psz, dtype=np.uint16)
        mbuf[: min(meta.size, msz)] = meta[:msz]
        pbuf[: min(payload.size, psz)] = payload[:psz]
        mbuf = np.asarray(mhu.broadcast_one_to_all(
            mbuf, is_source=pid == owner))
        pbuf = np.asarray(mhu.broadcast_one_to_all(
            pbuf, is_source=pid == owner))
        if pid == 0:
            out.extend(_unpack_payload(mbuf, pbuf))
    return out


def ensure_distributed() -> int:
    """Initialize jax.distributed when a multi-host job is configured;
    returns the process count (1 when single-host)."""
    import os

    import jax

    if os.environ.get("JAX_COORDINATOR_ADDRESS") \
            or os.environ.get("COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
        except Exception:
            pass
    return jax.process_count()
