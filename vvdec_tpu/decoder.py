"""Top-level decode driver: Annex-B stream -> parsed frames -> device recon.

Host-plane orchestration, parity with vvdec DecLib/DecLibParser
(source/Lib/DecoderLib/DecLib.cpp:182 decode, DecLibParser.cpp:125 parse) —
re-designed: the parse stage emits whole-frame tensors that the JAX device
pipeline reconstructs per frame.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field

import numpy as np


from vvdec_tpu.bitstream.nal import NalUnitType, read_nal_units
from vvdec_tpu.bitstream.reader import BitReader
from vvdec_tpu.cabac.ctu_decoder import CtuDecoder
from vvdec_tpu.cabac.engine import CabacDecoder
from vvdec_tpu.frame.structure import CodingStructure
from vvdec_tpu.hls.reader import (
    ParameterSetManager,
    parse_picture_header,
    parse_pps,
    parse_slice_header,
    parse_sps,
)


def u16_view(p: np.ndarray) -> np.ndarray:
    """Zero-copy uint16 view of a clipped int32 plane: the 10-bit output
    path hands out (strided) views of the internal reconstruction planes
    instead of repacking (reference parity: vvdecimpl.cpp:953-1056 exposes
    internal 16-bit reco pointers directly)."""
    if p.dtype == np.uint16:
        return p
    if p.dtype == np.int32 and p.flags.c_contiguous \
            and sys.byteorder == "little":
        return p.view(np.uint16)[:, ::2]
    return p.astype(np.uint16)


@dataclass
class ParsedFrame:
    cs: CodingStructure
    poc: int = 0
    is_idr: bool = False
    nal_type: int = 0
    broken: bool = False     # parse error: conceal with grey fill
    sei: list = field(default_factory=list)
    walk_future: object = None  # in-flight CABAC walk (parse-ahead pool)


class FrameParser:
    """Stateful NAL-stream parser producing per-frame CodingStructures."""

    _GCI_NAL_RULES = (  # (gci flag, rejected NAL type) — DecLib.cpp:669-695
        ("no_trail", NalUnitType.TRAIL), ("no_stsa", NalUnitType.STSA),
        ("no_rasl", NalUnitType.RASL), ("no_radl", NalUnitType.RADL),
        ("no_idr", NalUnitType.IDR_W_RADL), ("no_idr", NalUnitType.IDR_N_LP),
        ("no_cra", NalUnitType.CRA), ("no_gdr", NalUnitType.GDR),
        ("no_aps", NalUnitType.PREFIX_APS),
        ("no_aps", NalUnitType.SUFFIX_APS),
    )

    def __init__(self) -> None:
        self.psman = ParameterSetManager()
        # optional executor for deferred picture walks: the CABAC decode
        # of whole (single-slice) pictures runs as parse-ahead tasks (the
        # reference's per-slice parse tasks, DecLibParser.cpp:948-1012);
        # the C walk releases the GIL, so tasks parallelize across
        # pictures.  Set by StreamDecoder(threads >= 3).
        self.walk_pool = None
        self.prev_tid0_poc = 0
        self.cur_ph = None
        self.active_sps = None
        self.last_bp = None  # last buffering period (HRD SEI context)
        self.pending_sei: list = []
        # in-progress multi-slice picture: (ParsedFrame, covered-CTU set,
        # total CTUs).  Pictures with the PH in the slice header always
        # consist of a single slice (the VVC constraint), so a picture is
        # open only between a PH NAL and full CTU coverage.
        self._pending: tuple | None = None

    def parse_stream(self, data: bytes) -> list[ParsedFrame]:
        frames: list[ParsedFrame] = []
        for nal in read_nal_units(data):
            frames.extend(self.feed_nal(nal, last_frame=frames[-1]
                                        if frames else None))
        self._flush_pending(frames)
        return frames

    def feed_nal(self, nal, last_frame: ParsedFrame | None = None
                 ) -> list[ParsedFrame]:
        """Process one NAL unit; returns completed pictures (0 or more)."""
        frames: list[ParsedFrame] = []
        full_rbsp = bytes([0, (int(nal.nal_type) << 3) | (nal.temporal_id + 1)]) \
            + nal.rbsp
        t = nal.nal_type
        self._check_nal_constraints(t)
        if t == NalUnitType.SPS:
            self.psman.store_sps(parse_sps(full_rbsp))
        elif t == NalUnitType.VPS:
            from vvdec_tpu.hls.reader import parse_vps
            self.psman.store_vps(parse_vps(full_rbsp))
        elif t == NalUnitType.DCI:
            from vvdec_tpu.hls.reader import parse_dci
            if nal.temporal_id != 0:
                raise ValueError("TemporalId of a DCI NAL unit must be 0")
            self.psman.store_dci(parse_dci(full_rbsp))
        elif t == NalUnitType.PPS:
            self.psman.store_pps(parse_pps(full_rbsp, self.psman.get_sps))
        elif t == NalUnitType.PH:
            self._flush_pending(frames)
            r = BitReader(full_rbsp, pos=16)
            self.cur_ph = parse_picture_header(r, self.psman)
        elif t in (NalUnitType.PREFIX_APS, NalUnitType.SUFFIX_APS):
            from vvdec_tpu.hls.reader import parse_aps
            self.psman.store_aps(parse_aps(full_rbsp))
        elif t in (NalUnitType.PREFIX_SEI, NalUnitType.SUFFIX_SEI):
            from vvdec_tpu.hls.sei import (SEI_BUFFERING_PERIOD,
                                           parse_buffering_period,
                                           parse_sei_nal)
            msgs = parse_sei_nal(full_rbsp, nal.temporal_id)
            # remember the active buffering period: picture-timing and
            # decoding-unit-info field lengths depend on it
            # (SEIread.cpp:226-248)
            for m in msgs:
                if m.payload_type == SEI_BUFFERING_PERIOD:
                    try:
                        self.last_bp = parse_buffering_period(m)
                    except (IndexError, ValueError):
                        pass
            if t == NalUnitType.PREFIX_SEI or last_frame is None:
                self.pending_sei.extend(msgs)
            else:
                last_frame.sei.extend(msgs)
        elif nal.is_vcl:
            done = self._parse_slice(full_rbsp, nal)
            if done is not None:
                frames.append(done)
                done.sei.extend(self.pending_sei)
                self.pending_sei = []
        # AUD / EOS / EOB / FD: ignored at this stage
        return frames

    def _flush_pending(self, frames: list) -> None:
        if self._pending is not None:
            pf, covered, total, _tasks = self._pending
            self._pending = None
            if len(covered) < total:
                raise ValueError(
                    f"picture POC {pf.poc} incomplete: {len(covered)}/{total}"
                    " CTUs covered by its slices")
            frames.append(pf)
            pf.sei.extend(self.pending_sei)
            self.pending_sei = []

    def _check_nal_constraints(self, t) -> None:
        """General-constraint-info NAL gating vs the active SPS
        (DecLib::xCheckNalUnitConstraintFlags, DecLib.cpp:669-695)."""
        sps = self.active_sps
        if sps is None or sps.ptl is None:
            return
        ci = sps.ptl.constraint_info
        if ci is None or not ci.gci_present_flag:
            return
        for flag, rejected in self._GCI_NAL_RULES:
            if t == rejected and ci.get(flag):
                raise ValueError(
                    f"non-conforming bitstream: {flag}_constraint_flag set "
                    f"but stream contains a {rejected.name} NAL unit")

    def _parse_slice(self, full_rbsp: bytes, nal) -> ParsedFrame | None:
        """Parse one slice; returns the ParsedFrame when its picture is
        complete (all CTUs covered), else None.

        Parity: DecLibParser::xDecodeSliceHead/xDecodeSliceMain
        (DecLibParser.cpp:401, :948) — slices accumulate into one
        CodingStructure until the picture is fully covered."""
        r = BitReader(full_rbsp, pos=16)
        sh, ph = parse_slice_header(r, self.psman, int(nal.nal_type),
                                    nal.temporal_id, self.prev_tid0_poc,
                                    self.cur_ph)
        if nal.temporal_id == 0 and t_is_ref(nal.nal_type):
            self.prev_tid0_poc = sh.poc
        if sh.picture_header_in_slice_header and self._pending is not None:
            raise ValueError("PH-in-SH slice while a picture is open")
        if self._pending is None:
            pps = self.psman.get_pps(ph.pps_id)
            sps = self.psman.get_sps(pps.sps_id)
            # VPS activation checks (DecLibParser.cpp:453-476): a non-zero
            # sps_video_parameter_set_id must resolve, and dependent layers
            # are not decodable
            if sps.vps_id > 0:
                vps = self.psman.get_vps(sps.vps_id)
                if vps is None:
                    raise ValueError(f"no VPS with id {sps.vps_id} "
                                     "for the active SPS")
                layer_idx = (vps.layer_id.index(nal.layer_id)
                             if nal.layer_id in vps.layer_id else 0)
                if not vps.independent_layer[layer_idx]:
                    raise ValueError(
                        "decoding of dependent layers not supported")
            self.active_sps = sps
            cs = CodingStructure(sps, pps, ph, sh)
            cs.scaling_list = None
            if sh.explicit_scaling_list_used:
                from vvdec_tpu.hls.params import SCALING_LIST_APS
                aps = self.psman.get_aps(SCALING_LIST_APS,
                                         ph.scaling_list_aps_id)
                if aps is None:
                    raise ValueError(
                        f"missing scaling-list APS {ph.scaling_list_aps_id}")
                cs.scaling_list = aps.scaling_list
            cs.lmcs_info = None
            if ph.lmcs_enabled:
                from vvdec_tpu.hls.params import LMCS_APS
                aps = self.psman.get_aps(LMCS_APS, ph.lmcs_aps_id)
                if aps is None:
                    raise ValueError(f"missing LMCS APS {ph.lmcs_aps_id}")
                cs.lmcs_info = aps.lmcs
            pf = ParsedFrame(cs=cs, poc=sh.poc, is_idr=nal.is_idr,
                             nal_type=int(nal.nal_type))
            total = pps.pic_width_in_ctu * pps.pic_height_in_ctu
            self._pending = (pf, set(), total, [])
            slice_idx = 0
        else:
            pf, covered0, total, _tasks = self._pending
            cs = pf.cs
            if sh.poc != pf.poc:
                raise ValueError("slice POC changed mid-picture "
                                 f"({sh.poc} vs {pf.poc})")
            slice_idx = len(cs.shs)
            cs.shs.append(sh)
            cs.sh = sh  # CtuDecoder snapshots the current slice header
        # per-slice ALF APS references
        if any(sh.alf_enabled) or sh.ccalf_cb_enabled or sh.ccalf_cr_enabled:
            from vvdec_tpu.hls.params import ALF_APS
            ids = set(sh.alf_aps_ids_luma if sh.alf_enabled[0] else [])
            if sh.alf_enabled[1] or sh.alf_enabled[2]:
                ids.add(sh.alf_aps_id_chroma)
            if sh.ccalf_cb_enabled:
                ids.add(sh.ccalf_cb_aps_id)
            if sh.ccalf_cr_enabled:
                ids.add(sh.ccalf_cr_aps_id)
            for i in ids:
                aps = self.psman.get_aps(ALF_APS, i)
                if aps is None:
                    raise ValueError(f"missing ALF APS {i}")
                cs.alf_apss[i] = aps
        start_byte = sh.data_offset_bits // 8
        from vvdec_tpu.cabac.engine import make_cabac_decoder
        dec = make_cabac_decoder(full_rbsp, start_byte)
        dec.reset(sh.qp_y, sh.slice_type)
        if self.walk_pool is not None and slice_idx == 0 \
                and len(sh.ctu_addrs) >= total:
            # single-slice picture: defer the whole CABAC walk to the
            # parse-ahead pool; the picture is "parsed" when the future
            # resolves (checked before reconstruction)
            coder = CtuDecoder(cs, dec=dec, slice_idx=slice_idx)
            pf.walk_future = self.walk_pool.submit(coder.decode_slice)
            self._pending = None
            return pf
        if self.walk_pool is not None and self._parallel_slice_ok(cs, dec):
            # multi-slice picture: ONE walk task per slice over a proxy
            # cs with private record buffers and maps; slices of the
            # same picture parse concurrently (DecLibParser.cpp:948) and
            # merge at join (ParsedFrame.walk_future)
            task = self._submit_slice_walk(cs, sh, dec, slice_idx)
            pf, covered, total, tasks = self._pending
            tasks.append(task)
            covered.update(sh.ctu_addrs)
            self._pending = (pf, covered, total, tasks)
            if len(covered) >= total:
                pf.walk_future = _MultiSliceWalk(cs, tasks)
                self._pending = None
                return pf
            return None
        coder = CtuDecoder(cs, dec=dec, slice_idx=slice_idx)
        coder.decode_slice()
        pf, covered, total, tasks = self._pending
        covered.update(sh.ctu_addrs)
        self._pending = (pf, covered, total, tasks)
        if len(covered) >= total:
            cs.sh = cs.shs[0]
            self._pending = None
            return pf
        return None

    @staticmethod
    def _parallel_slice_ok(cs, dec) -> bool:
        """Per-slice walk tasks need the native walk (the merge operates
        on its flat records); mirror native_walk_ok's gates."""
        import os
        if os.environ.get("VVDEC_TPU_PY_WALK") == "1":
            return False
        if cs.sps.act_enabled:
            return False
        return hasattr(dec, "_d") and hasattr(dec._d, "walk_begin")

    def _submit_slice_walk(self, cs, sh, dec, slice_idx):
        """Submit one slice's CABAC walk on a private proxy cs (fresh
        walk buffers + CU/QP/slice maps; coefficient planes and per-CTU
        parameter lists stay shared — slices write disjoint regions)."""
        import copy
        proxy = copy.copy(cs)
        proxy.__dict__.pop("_nw", None)
        proxy.__dict__.pop("_mctx", None)
        proxy.__dict__.pop("_mctx_side", None)
        proxy.cu_map = np.full_like(cs.cu_map, -1)
        proxy.cu_map_c = None if cs.cu_map_c is None \
            else np.full_like(cs.cu_map_c, -1)
        proxy.qp_map = np.zeros_like(cs.qp_map)
        proxy.slice_map = np.full_like(cs.slice_map, -1)
        proxy.sh = sh
        proxy.cus = []
        proxy.tus = []

        def run():
            coder = CtuDecoder(proxy, dec=dec, slice_idx=slice_idx)
            coder.decode_slice()
            return proxy

        return self.walk_pool.submit(run), proxy


class _MultiSliceWalk:
    """Joins the per-slice CABAC walk tasks of one picture and merges
    their private walk records/maps into the real CodingStructure (the
    reference's per-slice parse tasks, DecLibParser.cpp:948-1012, with
    context isolation per slice as DecSlice.cpp:133-167).  Each task
    parsed its slice into a proxy cs with private record buffers and
    CU/QP/slice maps; cross-slice neighbor lookups during the walk see
    -1 (unavailable), which matches the slice availability rule."""

    def __init__(self, cs, tasks) -> None:
        self.cs = cs
        self.tasks = tasks  # [(future, proxy)] in slice order
        self._done = False

    def result(self) -> None:
        if self._done:
            return
        self._done = True
        from vvdec_tpu.cabac.native_walk import (
            CU_F, LazyRecList, _materialize_cu, _materialize_tu)
        cs = self.cs
        proxies = []
        for fut, proxy in self.tasks:
            fut.result()  # re-raises slice parse errors
            proxies.append(proxy)
        first_tu_col = CU_F["first_tu"]
        cu_parts, tu_parts = [], []
        cu_base = tu_base = 0
        for p in proxies:
            nw = p._nw
            ncu, ntu = int(nw["counts"][0]), int(nw["counts"][1])
            cu_rec = nw["cu_rec"][:ncu].copy()
            tu_rec = nw["tu_rec"][:ntu].copy()
            cu_rec[:, first_tu_col] += tu_base
            tu_rec[:, 0] += cu_base
            cu_parts.append(cu_rec)
            tu_parts.append(tu_rec)
            m = p.cu_map >= 0
            cs.cu_map[m] = p.cu_map[m] + cu_base
            if cs.cu_map_c is not None:
                mc = p.cu_map_c >= 0
                cs.cu_map_c[mc] = p.cu_map_c[mc] + cu_base
            ms = p.slice_map >= 0
            cs.slice_map[ms] = p.slice_map[ms]
            cs.qp_map[ms] = p.qp_map[ms]
            cu_base += ncu
            tu_base += ntu
        nw = {
            "cu_rec": np.concatenate(cu_parts),
            "tu_rec": np.concatenate(tu_parts),
            "counts": np.asarray([cu_base, tu_base], dtype=np.int32),
        }
        cs._nw = nw
        cs.chroma_qp_adj = proxies[-1].chroma_qp_adj
        from vvdec_tpu.cabac import native_walk as _nwmod
        cs.cus = _nwmod.LazyRecList(
            lambda i: _materialize_cu(cs, nw, i))
        cs.tus = _nwmod.LazyRecList(
            lambda i: _materialize_tu(cs, nw, i))
        cs.cus.extend([None] * cu_base)
        cs.tus.extend([None] * tu_base)
        cs.sh = cs.shs[0]


class _DeferredFrame:
    """In-flight device-filtered frame: resolves to pixel planes on first
    use (as a reference or for output), running the deferred DPH check."""

    def __init__(self, dec, pending, sei, poc, bit_depth) -> None:
        self._dec = dec
        self._pending = pending
        self._sei = sei
        self._poc = poc
        self._bd = bit_depth
        self._planes32 = None
        self._u16 = None

    def resolve_int32(self) -> list:
        if self._planes32 is None:
            self._planes32 = self._pending.resolve()
            self._pending = None
            self._u16 = [u16_view(p) for p in self._planes32]
            self._dec._check_dph(self._sei, self._u16, self._bd,
                                 self._poc)
        return self._planes32

    def resolve_u16(self) -> list:
        self.resolve_int32()
        return self._u16


def t_is_ref(nal_type) -> bool:
    return True  # RASL/RADL handling arrives with inter support


def parse_annexb(data: bytes) -> list[ParsedFrame]:
    return FrameParser().parse_stream(data)


class StreamDecoder:
    """Streaming decoder: push Annex-B bytes in, pull pictures out in
    output (bumping) order.

    The vvdec_decode/vvdec_flush analog (vvdecimpl.cpp:271,:511): NAL
    dispatch to the parser, one-picture parse-ahead (a picture is
    reconstructed when the next one begins, so its suffix SEIs — notably
    the decoded-picture-hash — are attached first), reference management,
    and DPB output bumping."""

    def __init__(self, use_jax: bool = False, strict_hash: bool = True,
                 err_policy: str = "strict", threads: int = 0,
                 parse_delay: int | None = None):
        """err_policy: "strict" raises on broken streams; "conceal" follows
        the reference's fault tolerance — lost references are synthesized
        (closest picture or grey, DecLibParser::prepareUnavailablePicture,
        PicListManager::findClosestPic) and broken pictures are grey-filled
        and kept referenceable (DecLib::sanitizeBrokenPicture).

        threads >= 2 enables the recon-while-parse overlap (the reference's
        RECO_WHILE_PARSE, TypeDef.h:69 + parse-ahead, DecLib.cpp:128-133):
        a dedicated parse thread runs the CABAC walk (which releases the
        GIL inside the C loops) up to `parse_delay` pictures ahead while
        the calling thread reconstructs.  parse_delay defaults to
        min(1.5 * threads, 48), the reference's default."""
        from vvdec_tpu.dpb import PicListManager
        self.parser = FrameParser()
        self.plm = PicListManager()
        self.use_jax = use_jax
        if use_jax:
            # persistent compile cache: the device pipeline compiles one
            # program per (stage, shape class); on remote-compile rigs a
            # cold miss costs seconds, so cache across processes
            import os as _os

            import jax as _jax
            cache_dir = _os.environ.get("VVDEC_JAX_CACHE",
                                        "/tmp/jax_bench_cache")
            if cache_dir:  # "" disables (multi-virtual-device
                # executables can crash the cache serializer)
                try:
                    _jax.config.update("jax_compilation_cache_dir",
                                       cache_dir)
                except Exception:
                    pass
        self.strict_hash = strict_hash
        self.err_policy = err_policy
        self._parse_exec = None
        self._last_parsed: ParsedFrame | None = None
        if parse_delay is None:
            parse_delay = min(int(threads * 1.5), 48) if threads else 1
        self._parse_delay = max(1, parse_delay)
        if threads >= 2:
            from concurrent.futures import ThreadPoolExecutor
            self._parse_exec = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="vvdec-parse")
            if threads >= 3:
                # picture-walk tasks run threads-2 wide (the reference
                # spawns one parse task per slice, DecLibParser.cpp:990)
                self.parser.walk_pool = ThreadPoolExecutor(
                    max_workers=threads - 2,
                    thread_name_prefix="vvdec-walk")
        self.hash_errors = 0
        self.error_pictures = 0
        # per-frame fallback census: every silent host fallback of a
        # device or native-C stage is counted here with its reason
        # (exposed via Decoder.get_decoder_info)
        from collections import Counter
        self.fallback_census = Counter()
        self._refs: dict[int, list] = {}      # poc -> int planes (ref)
        self._refs_dev: dict[int, tuple] = {}  # poc -> device planes (DPB)
        self._ref_cols: dict[int, object] = {}  # poc -> ColMotion
        self._ref_pps: dict[int, object] = {}   # poc -> PPS (RPR scaling)
        self._pending: ParsedFrame | None = None
        self._num_reorder = 0
        # random-access tune-in state
        self._first_rap_poc: int | None = None   # first decoded RAP
        self._first_rap_cra = False
        self._last_irap_poc: int | None = None
        self._gdr_recovery_poc: int | None = None

    def push(self, data: bytes) -> list:
        """Feed a chunk of Annex-B bytes (one AU or more); returns the
        pictures that became ready for output, in output order."""
        if self._parse_exec is not None:
            return self._push_threaded(data)
        out = []
        from vvdec_tpu.utils.trace import profiler
        for nal in read_nal_units(data):
            try:
                with profiler.stage("parse"):
                    done = self.parser.feed_nal(
                        nal, last_frame=self._pending)
            except Exception:
                if self.err_policy != "conceal":
                    raise
                # parse error mid-picture: the open picture is broken —
                # grey-fill it and resynchronize (reference: parse-task
                # exception transport, DecLibParser.cpp:969-980)
                done = []
                if self.parser._pending is not None:
                    pf = self.parser._pending[0]
                    pf.broken = True
                    self.parser._pending = None
                    done = [pf]
            for f in done:
                if self._pending is not None:
                    self._reconstruct(self._pending)
                self._pending = f
            out.extend(self._bump())
        return out

    def _parse_one(self, nal) -> list:
        """Runs on the parse thread; serial, owns all parser state."""
        try:
            done = self.parser.feed_nal(nal, last_frame=self._last_parsed)
        except Exception:
            if self.err_policy != "conceal":
                raise
            done = []
            if self.parser._pending is not None:
                pf = self.parser._pending[0]
                pf.broken = True
                self.parser._pending = None
                done = [pf]
        if done:
            self._last_parsed = done[-1]
        return done

    def _push_threaded(self, data: bytes) -> list:
        """Recon-while-parse: the parse thread runs ahead up to the
        parse-delay while this thread reconstructs completed pictures.
        The CABAC walk and the C recon kernels both release the GIL, so
        the two stages genuinely overlap."""
        from collections import deque
        out = []
        futs: deque = deque()
        # NAL count bound approximating the picture-count parse delay
        bound = 4 + 2 * self._parse_delay

        def drain_one():
            done = futs.popleft().result()
            for f in done:
                if self._pending is not None:
                    self._reconstruct(self._pending)
                self._pending = f
            out.extend(self._bump())

        for nal in read_nal_units(data):
            futs.append(self._parse_exec.submit(self._parse_one, nal))
            while len(futs) > bound:
                drain_one()
        while futs:
            drain_one()
        return out

    def flush(self) -> list:
        """Drain all remaining pictures (vvdec_flush)."""
        tail: list[ParsedFrame] = []
        self.parser._flush_pending(tail)
        for f in tail:
            if self._pending is not None:
                self._reconstruct(self._pending)
            self._pending = f
        if self._pending is not None:
            self._reconstruct(self._pending)
            self._pending = None
        out = self.plm.drain(self._num_reorder)
        self.plm.reset()
        pool = self.parser.walk_pool
        self.parser = FrameParser()
        self.parser.walk_pool = pool
        return out

    def _bump(self) -> list:
        out = []
        while True:
            p = self.plm.get_next_output(self._num_reorder)
            if p is None:
                return out
            out.append(p)

    def _grey_planes(self, cs) -> list:
        """Mid-grey planes for concealment (Picture::fillGrey)."""
        grey = 1 << (cs.sps.bit_depth - 1)
        return [np.full((h, w), grey, dtype=np.int32)
                for (w, h) in cs.comp_size]

    def _ref_planes_of(self, poc: int) -> list:
        """Reference planes by POC, resolving in-flight device frames."""
        v = self._refs[poc]
        if isinstance(v, _DeferredFrame):
            v = v.resolve_int32()
            self._refs[poc] = v
        return v

    def _dev_ref(self, poc: int, comp: int):
        """Device-resident reference plane by POC (uploading a
        host-decoded reference once on first device use)."""
        t = self._refs_dev.get(poc)
        if t is None:
            import jax.numpy as jnp
            t = tuple(jnp.asarray(p)
                      for p in self._ref_planes_of(poc))
            self._refs_dev[poc] = t
        return t[comp]

    @staticmethod
    def _rpl_key(sh):
        """Hashable identity of a slice's RPLs + active counts (two
        slices with equal keys share one resolved reference set)."""
        out = [tuple(sh.num_ref_idx_active)]
        for lst in range(2):
            rpl = sh.rpl[lst]
            out.append(None if rpl is None else tuple(
                (e.is_long_term, e.value,
                 getattr(e, "delta_poc_msb_present", False),
                 getattr(e, "delta_poc_msb_cycle", 0))
                for e in rpl.entries))
        return tuple(out)

    def _build_ref_set(self, f, cs, sh_ref):
        """Resolve one slice's RPLs: (ref_pocs, ref_planes, ref_cols,
        ref_scaled, check_ldc), plus a missing-reference error flag
        (Slice::constructRefPicLists + scaleRefPicList)."""
        ref_pocs = [[], []]
        ref_planes = [[], []]
        ref_cols = [[], []]
        ref_scaled = [[], []]
        pic_error = False
        for lst in range(2):
            rpl = sh_ref.rpl[lst]
            if rpl is None:
                continue
            for e in rpl.entries:
                if e.is_long_term:
                    # long-term reference: match by POC LSB, or by full
                    # POC when the MSB cycle is signalled
                    # (Slice::constructRefPicLists + xGetLongTermRefPic)
                    max_lsb = cs.sps.max_poc_lsb
                    if e.delta_poc_msb_present:
                        ref_poc = (e.value + f.poc
                                   - e.delta_poc_msb_cycle * max_lsb
                                   - (f.poc & (max_lsb - 1)))
                    else:
                        ref_poc = next(
                            (p for p in sorted(self._refs, reverse=True)
                             if (p & (max_lsb - 1)) == e.value),
                            e.value)
                else:
                    ref_poc = f.poc + e.value
                ref_pocs[lst].append(ref_poc)
                if ref_poc not in self._refs:
                    if self.err_policy != "conceal":
                        raise ValueError(
                            f"missing reference POC {ref_poc}")
                    planes_c, col_c = self._substitute_ref(ref_poc, cs)
                    self._refs[ref_poc] = planes_c
                    self._ref_cols[ref_poc] = col_c
                    pic_error = True
                ref_planes[lst].append(self._ref_planes_of(ref_poc))
                ref_cols[lst].append(self._ref_cols[ref_poc])
                # RPR: record per-ref scaling when the reference uses a
                # different size/scaling window (Slice::scaleRefPicList)
                from vvdec_tpu.frame import rpr_np
                ref_pps = self._ref_pps.get(ref_poc, cs.pps)
                if rpr_np.is_ref_scaled(cs.pps, ref_pps):
                    ref_scaled[lst].append(
                        (rpr_np.get_rpr_scaling(cs.sps, cs.pps,
                                                ref_pps), ref_pps))
                else:
                    ref_scaled[lst].append(None)
        # low-delay check: every active reference precedes this picture
        check_ldc = all(
            p <= f.poc
            for lst in range(2)
            for p in ref_pocs[lst][: sh_ref.num_ref_idx_active[lst]])
        return (ref_pocs, ref_planes, ref_cols, ref_scaled,
                check_ldc), pic_error

    def _substitute_ref(self, poc: int, cs):
        """Lost reference: the closest decoded picture, or a grey frame
        (DecLibParser::prepareUnavailablePicture + findClosestPic)."""
        self.error_pictures += 1
        if self._refs:
            best = min(self._refs, key=lambda p: (abs(p - poc), p))
            return self._ref_planes_of(best), self._ref_cols[best]
        from vvdec_tpu.frame.inter_np import ColMotion
        planes = self._grey_planes(cs)
        return planes, ColMotion(cs, poc)

    def _random_access_skip(self, f: ParsedFrame) -> bool:
        """RASL pictures associated with the RAP we tuned in at are not
        decodable (DecLibParser::isRandomAccessSkipPicture)."""
        t = NalUnitType(f.nal_type)
        if t in (NalUnitType.IDR_W_RADL, NalUnitType.IDR_N_LP,
                 NalUnitType.CRA, NalUnitType.GDR):
            self._last_irap_poc = f.poc
            if self._first_rap_poc is None:
                self._first_rap_poc = f.poc
                self._first_rap_cra = t == NalUnitType.CRA
                if t == NalUnitType.GDR:
                    self._gdr_recovery_poc = \
                        f.poc + f.cs.ph.recovery_poc_cnt
            return False
        if t == NalUnitType.RASL and self._first_rap_cra \
                and self._last_irap_poc == self._first_rap_poc:
            return True
        return False

    def _reconstruct(self, f: ParsedFrame) -> None:
        if self._random_access_skip(f):
            return
        try:
            if f.broken:
                raise RuntimeError("picture broken during parse")
            self._reconstruct_inner(f)
        except Exception:
            if self.err_policy != "conceal":
                raise
            # broken picture: grey-fill, keep referenceable, mark error
            # (DecLib::sanitizeBrokenPicture, Picture::ensureUsableAsRef)
            from vvdec_tpu.dpb import DecodedPicture
            from vvdec_tpu.frame.inter_np import ColMotion
            cs = f.cs
            self.error_pictures += 1
            planes = self._grey_planes(cs)
            self._refs[f.poc] = planes
            self._ref_cols[f.poc] = ColMotion(cs, f.poc)
            self._ref_pps[f.poc] = cs.pps
            self.plm.add(DecodedPicture(
                poc=f.poc, planes=[u16_view(p) for p in planes],
                bit_depth=cs.sps.bit_depth, is_idr=f.is_idr, sei=f.sei,
                width=cs.w, height=cs.h,
                chroma_format_idc=cs.sps.chroma_format_idc, error=True,
                vui=cs.sps.vui, hrd=cs.sps.hrd_params))

    def _reconstruct_inner(self, f: ParsedFrame) -> None:
        if f.walk_future is not None:
            fut, f.walk_future = f.walk_future, None
            fut.result()  # join the picture's CABAC walk (re-raises)
        from vvdec_tpu.dpb import DecodedPicture
        from vvdec_tpu.frame.deblock_np import deblock_frame
        from vvdec_tpu.frame.recon_np import IntraReconstructor

        cs = f.cs
        if f.is_idr:
            # previous pictures can no longer be referenced (NoOutputOfPrior
            # handling is trivial here: they remain output-marked)
            self.plm.unmark_all_references()
            self._refs.clear()
            self._refs_dev.clear()
            self._ref_cols.clear()
            self._ref_pps.clear()
        self._num_reorder = cs.sps.num_reorder_pics[-1]
        # resolve reference picture lists per slice (the reference
        # constructs RPLs per slice, Slice::constructRefPicLists); the
        # shared cs.ref_* come from the first inter slice, and when
        # slices disagree cs.per_slice_rpl routes ref accesses through
        # cs.slice_ref_sets (swapped per CU in the recon loop)
        sh_ref = next((s for s in cs.shs if not s.is_intra), cs.sh)
        cs.ref_pocs = [[], []]
        cs.ref_planes = [[], []]
        cs.ref_cols = [[], []]
        cs.ref_scaled = [[], []]  # (scaling, ref_pps) or None per ref (RPR)
        cs.per_slice_rpl = False
        cs.slice_ref_sets = [None] * len(cs.shs)
        pic_error = False
        if not sh_ref.is_intra:
            sets_by_key: dict = {}
            first_key = None
            for si, s in enumerate(cs.shs):
                if s.is_intra:
                    continue
                key = self._rpl_key(s)
                if key not in sets_by_key:
                    st, err = self._build_ref_set(f, cs, s)
                    sets_by_key[key] = st
                    pic_error = pic_error or err
                cs.slice_ref_sets[si] = sets_by_key[key]
                if first_key is None:
                    first_key = key
            cs.per_slice_rpl = len(sets_by_key) > 1
            (cs.ref_pocs, cs.ref_planes, cs.ref_cols, cs.ref_scaled,
             cs.check_ldc) = sets_by_key[first_key]
        from vvdec_tpu.utils.trace import msg, profiler, trace, INFO
        t_pic = time.monotonic()
        use_dev = False
        deferred = None
        planes = None
        if self.use_jax:
            # full device pipeline: ITX + intra chain + filters + packing
            # in one device-resident flow (ops/frame_device.py); pictures
            # using tools outside its set fall back to host recon with
            # the device filter chain (and failing that, host filters)
            from vvdec_tpu.ops.frame_device import (
                plan_frame_device, reconstruct_frame_device)
            desc, dev_reason = plan_frame_device(cs)
            if desc is not None:
                def get_ref(lst, ref_idx, comp):
                    return self._dev_ref(cs.ref_pocs[lst][ref_idx], comp)

                with profiler.stage("recon+filter(device)"):
                    pending = reconstruct_frame_device(cs, desc, get_ref)
                # device-resident DPB entry: later device frames gather
                # their MC references without any host round-trip
                self._refs_dev[f.poc] = tuple(pending.planes_dev)
                deferred = _DeferredFrame(self, pending, f.sei, f.poc,
                                          cs.sps.bit_depth)
                use_dev = True
            else:
                self.fallback_census[f"device_recon:{dev_reason}"] += 1
                from vvdec_tpu.ops.device_pipeline import (
                    device_filter_reject_reason, filter_frame_device)
                reason = device_filter_reject_reason(cs)
                use_dev = reason is None
                if reason is not None:
                    self.fallback_census[f"device_filter:{reason}"] += 1
        if deferred is None:
            with profiler.stage("recon"):
                planes = IntraReconstructor(
                    cs, census=self.fallback_census).run()
        if use_dev and deferred is None:
            # whole in-loop filter chain + output packing on device, one
            # async dispatch; deblock strength derivation (host C) runs
            # inside — before the DMVR MV fixups below, same as the host
            # path (TaskFinishMotionInfo ordering)
            from vvdec_tpu.ops.device_pipeline import filter_frame_device
            with profiler.stage("filter(submit)"):
                pending = filter_frame_device(cs, planes)
            deferred = _DeferredFrame(self, pending, f.sei, f.poc,
                                      cs.sps.bit_depth)
        elif not use_dev:
            with profiler.stage("deblock"):
                deblock_frame(cs, planes)
            with profiler.stage("sao"):
                from vvdec_tpu.frame.sao_np import sao_frame
                sao_frame(cs, planes)
            with profiler.stage("alf"):
                from vvdec_tpu.frame.alf_np import alf_frame_vec
                planes = alf_frame_vec(cs, planes)
        # DMVR-refined MVs enter the motion field only after deblocking
        # strength derivation (TaskFinishMotionInfo, DecCu.cpp:161-213)
        for x2, y2, mv0, mv1 in getattr(cs, "dmvr_fixups", ()):
            cs.mi_mv[y2 >> 2, x2 >> 2, 0] = mv0
            cs.mi_mv[y2 >> 2, x2 >> 2, 1] = mv1
        self._refs[f.poc] = deferred if use_dev else planes
        self._ref_pps[f.poc] = cs.pps
        from vvdec_tpu.frame.inter_np import ColMotion
        self._ref_cols[f.poc] = ColMotion(cs, f.poc)
        if not use_dev:
            out_planes = [u16_view(p) for p in planes]
            self._check_dph(f.sei, out_planes, cs.sps.bit_depth, f.poc,
                            cs=cs)
        # per-POC decode log + trace (reference per-picture log line,
        # DecLib.cpp:395-438; D_PIC trace channel)
        st = "IDR" if f.is_idr else ("I" if cs.sh.is_intra else
                                     ("B" if cs.sh.is_b else "P"))
        msg(INFO, f"POC {f.poc:4d} [{st}] QP {cs.sh.qp_y} "
                  f"[DT {time.monotonic() - t_pic:.3f}]")
        trace("D_PIC", f"poc={f.poc} type={st}\n", poc=f.poc)
        # GDR tune-in: suppress output until the recovery point
        # (DecLibParser GDR tracking, :658-684)
        needed = True
        if self._gdr_recovery_poc is not None:
            if f.poc >= self._gdr_recovery_poc:
                self._gdr_recovery_poc = None
            else:
                needed = False
        self.plm.add(DecodedPicture(
            poc=f.poc,
            planes=None if use_dev else out_planes,
            pending=deferred,
            bit_depth=cs.sps.bit_depth,
            is_idr=f.is_idr, sei=f.sei, width=cs.w, height=cs.h,
            chroma_format_idc=cs.sps.chroma_format_idc, error=pic_error,
            needed_for_output=needed, vui=cs.sps.vui,
            hrd=cs.sps.hrd_params))

    def _check_dph(self, sei, out_planes, bit_depth, poc,
                   cs=None) -> None:
        # decoded-picture-hash verification (DecLib::checkPictureHashSEI,
        # DecLib.cpp:480); per-subpicture hashes arrive nested in
        # subpic-flagged scalable-nesting SEIs (DecLib.cpp:518-569)
        from vvdec_tpu.hls.sei import (
            SEI_DECODED_PICTURE_HASH, SEI_SCALABLE_NESTING,
            calc_picture_hash, parse_dph, parse_scalable_nesting,
        )
        for m in sei:
            if m.payload_type == SEI_DECODED_PICTURE_HASH:
                dph = parse_dph(m)
                got = calc_picture_hash(out_planes, bit_depth, dph.method)
                if got != dph.digest:
                    self.hash_errors += 1
                    if self.strict_hash:
                        raise ValueError(
                            f"decoded picture hash mismatch at POC {poc}: "
                            f"{got.hex()} != {dph.digest.hex()}")
                return
        if cs is None or not cs.subpics:
            return
        ids = cs.pps.subpic_ids if cs.pps.subpic_ids else cs.sps.subpic_ids
        sx, sy = cs.sub_w - 1, cs.sub_h - 1
        for m in sei:
            if m.payload_type != SEI_SCALABLE_NESTING:
                continue
            try:
                nest = parse_scalable_nesting(m)
            except (IndexError, ValueError):
                continue
            if not nest.subpic_flag:
                continue
            dphs = [n for n in nest.messages
                    if n.payload_type == SEI_DECODED_PICTURE_HASH]
            if not dphs:
                continue
            dph = parse_dph(dphs[0])
            for sid in nest.subpic_ids:
                if sid not in ids:
                    continue
                idx = ids.index(sid)
                x0, y0, x1, y1 = cs.subpics[idx][:4]
                views = [out_planes[0][y0:y1, x0:x1]]
                for c in range(1, len(out_planes)):
                    views.append(out_planes[c][y0 >> sy: y1 >> sy,
                                               x0 >> sx: x1 >> sx])
                got = calc_picture_hash(views, bit_depth, dph.method)
                if got != dph.digest:
                    self.hash_errors += 1
                    if self.strict_hash:
                        raise ValueError(
                            f"subpicture {sid} hash mismatch at POC "
                            f"{poc}: {got.hex()} != {dph.digest.hex()}")


def decode_annexb(data: bytes, use_jax: bool = False,
                  threads: int = 0) -> list[list[np.ndarray]]:
    """Full decode: Annex-B stream -> list of frames in output order, each a
    list of uint16 planes (Y, Cb, Cr).  The numpy golden path; `use_jax=True`
    routes the reconstruction through the JAX device pipeline."""
    dec = StreamDecoder(use_jax=use_jax, threads=threads)
    pics = dec.push(data)
    pics.extend(dec.flush())
    return [p.planes for p in pics]


def decode_to_yuv(data: bytes, use_jax: bool = False,
                  threads: int = 0) -> bytes:
    """Decode to the vvdecapp YUV output format: planar LE, one byte per
    sample for 8-bit streams, two bytes otherwise (vvdecHelper.h
    writeYUVToFile sample packing)."""
    from vvdec_tpu.hls.reader import ParameterSetManager
    # sniff the stream bit depth from the first SPS
    bd = 10
    from vvdec_tpu.bitstream.nal import NalUnitType, read_nal_units
    from vvdec_tpu.hls.reader import parse_sps
    for nal in read_nal_units(data):
        if nal.nal_type == NalUnitType.SPS:
            full = bytes([0, (int(nal.nal_type) << 3) | 1]) + nal.rbsp
            bd = parse_sps(full).bit_depth
            break
    parts = []
    for planes in decode_annexb(data, use_jax=use_jax, threads=threads):
        for p in planes:
            parts.append(p.astype("u1" if bd == 8 else "<u2",
                                  copy=False).tobytes())
    return b"".join(parts)


def main(argv: list[str] | None = None) -> int:
    """CLI decoder: the vvdecapp equivalent (vvdecapp.cpp:main).

    Usage: python -m vvdec_tpu.decoder BITSTREAM [OUT.yuv] [--jax]
    Prints per-stream summary; OUT.yuv is 16-bit LE planar (vvdecapp format).
    """
    import argparse
    import sys
    import time

    ap = argparse.ArgumentParser(prog="vvdec_tpu",
                                 description="TPU-native VVC decoder")
    ap.add_argument("bitstream", help="Annex-B .266 input")
    ap.add_argument("output", nargs="?", help="YUV output (16-bit LE planar)")
    ap.add_argument("--jax", action="store_true",
                    help="run the device (JAX) reconstruction pipeline")
    args = ap.parse_args(argv)

    data = open(args.bitstream, "rb").read()
    t0 = time.monotonic()
    yuv = decode_to_yuv(data, use_jax=args.jax)
    dt = time.monotonic() - t0
    if args.output:
        with open(args.output, "wb") as f:
            f.write(yuv)
    n = sum(1 for _ in parse_annexb(data))
    print(f"vvdec_tpu: {n} frames decoded in {dt:.3f}s "
          f"({n / dt:.2f} fps)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
