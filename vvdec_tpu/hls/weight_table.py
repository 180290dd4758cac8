"""Explicit weighted-prediction table parsing (pred_weight_table()).

Parity: vvdec HLSyntaxReader::parsePredWeightTable (HLSyntaxReader.cpp:4359).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from vvdec_tpu.bitstream.reader import BitReader
from vvdec_tpu.hls.params import CHROMA_400


@dataclass
class WeightEntry:
    luma_weight_flag: bool = False
    chroma_weight_flag: bool = False
    luma_weight: int = 0  # delta from (1 << luma_log2_denom)
    luma_offset: int = 0
    chroma_weight: list[int] = field(default_factory=lambda: [0, 0])
    chroma_offset: list[int] = field(default_factory=lambda: [0, 0])


@dataclass
class PredWeightTable:
    luma_log2_denom: int = 0
    chroma_log2_denom: int = 0
    num_weights: list[int] = field(default_factory=lambda: [0, 0])
    entries: list[list[WeightEntry]] = field(default_factory=lambda: [[], []])


def parse_pred_weight_table(r: BitReader, sps, pps, num_ref_idx_active, ph) -> PredWeightTable:
    """Parse pred_weight_table().  When called from a picture header
    (num_ref_idx_active is None), the weight counts are explicit syntax
    elements; from a slice header they equal the active ref counts."""
    wt = PredWeightTable()
    chroma = sps.chroma_format_idc != CHROMA_400
    wt.luma_log2_denom = r.ue()
    if chroma:
        wt.chroma_log2_denom = wt.luma_log2_denom + r.se()

    if num_ref_idx_active is None:
        n0 = r.ue()  # num_l0_weights
    else:
        n0 = num_ref_idx_active[0]
    wt.num_weights[0] = n0
    _parse_list(r, wt, 0, n0, chroma)

    if pps.weighted_bipred:
        if num_ref_idx_active is None:
            n1 = r.ue()
        else:
            n1 = num_ref_idx_active[1] if num_ref_idx_active[1] else 0
        wt.num_weights[1] = n1
        _parse_list(r, wt, 1, n1, chroma)
    return wt


def _parse_list(r: BitReader, wt: PredWeightTable, lst: int, n: int, chroma: bool) -> None:
    entries = [WeightEntry() for _ in range(n)]
    for e in entries:
        e.luma_weight_flag = r.flag()
    if chroma:
        for e in entries:
            e.chroma_weight_flag = r.flag()
    for e in entries:
        if e.luma_weight_flag:
            e.luma_weight = r.se()
            e.luma_offset = r.se()
        if e.chroma_weight_flag:
            for c in range(2):
                e.chroma_weight[c] = r.se()
                e.chroma_offset[c] = r.se()
    wt.entries[lst] = entries
