"""Public decoder API (placeholder during bring-up; mirrors vvdec's C API shape:
vvdec_decoder_open / vvdec_decode / vvdec_flush, include/vvdec/vvdec.h.in:558-712)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class DecoderParams:
    threads: int = 0
    parse_delay: int = -1
    verify_picture_hash: bool = False
    film_grain_synthesis: bool = False
    log_level: int = 2


@dataclass
class Frame:
    planes: list = field(default_factory=list)  # numpy arrays, 16-bit samples
    width: int = 0
    height: int = 0
    bit_depth: int = 10
    poc: int = 0
    cts: int = 0


class Decoder:
    def __init__(self, params: DecoderParams | None = None):
        self.params = params or DecoderParams()

    def decode(self, au: bytes) -> Frame | None:
        raise NotImplementedError

    def flush(self) -> Frame | None:
        raise NotImplementedError
