"""Decoded picture buffer: output reordering ("bumping"), frame locking.

Behavioral parity with the reference DPB (PicListManager::getNextOutputPic,
source/Lib/CommonLib/PicListManager.cpp:285-409): output range up to the
first unfinished picture or next IDR, tune-in delay, auto-flush before an
IDR, lowest-POC bumping gated on the number of not-yet-displayed pictures
vs. the stream's num_reorder_pics, MAX_OUT_OF_ORDER_PICS slack before the
first output, and application-side frame locking (vvdec_frame_unref).
"""

from __future__ import annotations

from dataclasses import dataclass, field

MAX_OUT_OF_ORDER_PICS = 3  # TypeDef.h:72


@dataclass
class DecodedPicture:
    """A reconstructed picture held in the DPB."""

    poc: int
    planes: list                       # uint16 numpy planes (Y, Cb, Cr)
    bit_depth: int = 10
    is_idr: bool = False
    sei: list = field(default_factory=list)
    needed_for_output: bool = True
    reference_mark: bool = True        # still usable as a reference
    finished: bool = True              # recon done (synchronous decode)
    locked_by_application: bool = False
    # source geometry for the output view (conformance window applied)
    width: int = 0
    height: int = 0
    chroma_format_idc: int = 1
    error: bool = False                # concealed / partly broken picture
    vui: dict | None = None            # parsed SPS VUI (picAttributes->vui)
    hrd: dict | None = None            # parsed SPS HRD (picAttributes->hrd)


class PicListManager:
    """Decode-order picture list with vvdec-parity output bumping."""

    def __init__(self, parallel_instances: int = 0) -> None:
        self._pics: list[DecodedPicture] = []
        self._tune_in_delay = 0
        self._first_output = True
        self._parallel = parallel_instances

    def reset(self) -> None:
        self._pics.clear()
        self._tune_in_delay = 0
        self._first_output = True

    def add(self, pic: DecodedPicture) -> None:
        self._pics.append(pic)

    def pictures(self) -> list[DecodedPicture]:
        return list(self._pics)

    def unmark_all_references(self) -> None:
        """IDR: previous pictures can no longer be referenced."""
        for p in self._pics:
            p.reference_mark = False
        self._prune()

    def release(self, pic: DecodedPicture) -> None:
        """vvdec_frame_unref analog: the app is done with this picture."""
        pic.locked_by_application = False
        self._prune()

    def _prune(self) -> None:
        self._pics = [
            p for p in self._pics
            if p.needed_for_output or p.reference_mark
            or p.locked_by_application
        ]

    def get_next_output(self, num_reorder: int,
                        flush: bool = False) -> DecodedPicture | None:
        """Port of PicListManager::getNextOutputPic (see module docstring)."""
        pics = self._pics
        if not pics:
            return None

        # find the picture range up to the first unfinished pic / next IDR
        seq_start, seq_end = 0, len(pics)
        found_output_pic = False
        for i, p in enumerate(pics):
            if not p.needed_for_output and p.finished:
                continue
            if not p.finished:
                seq_end = i
                break
            if p.is_idr:
                if not found_output_pic:
                    seq_start = i
                else:
                    seq_end = i
                    break
            found_output_pic |= p.needed_for_output
            if not found_output_pic and not p.reference_mark:
                seq_start = i
        if not found_output_pic:
            return None

        rng = pics[seq_start:seq_end]

        if self._tune_in_delay <= num_reorder + self._parallel + 1 \
                and not flush:
            self._tune_in_delay += 1
            return None

        # an IDR coming up flushes everything before it
        if seq_end < len(pics) and pics[seq_end].is_idr:
            flush = True

        if not flush:
            not_displayed = sum(1 for p in rng
                                if p.needed_for_output and p.finished)
            slack = MAX_OUT_OF_ORDER_PICS if self._first_output else 0
            if not_displayed <= num_reorder + slack:
                return None

        lowest: DecodedPicture | None = None
        for p in rng:
            if p.needed_for_output and p.finished \
                    and (lowest is None or p.poc < lowest.poc):
                lowest = p
        if lowest is not None:
            self._first_output = False
            lowest.locked_by_application = True
            lowest.needed_for_output = False
        return lowest

    def drain(self, num_reorder: int) -> list[DecodedPicture]:
        """Flush every remaining output picture in bumping order."""
        out = []
        while True:
            p = self.get_next_output(num_reorder, flush=True)
            if p is None:
                return out
            out.append(p)
