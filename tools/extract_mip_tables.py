#!/usr/bin/env python3
"""Dev-time extraction of the MIP weight matrices (ITU-T H.266 clause
8.4.5.2.2 / JVET affine-linear weights).  These are standard numeric
constants; parsed out of the reference decoder's data file rather than
hand-transcribed.  Only numeric data is extracted — no code.
Run: python tools/extract_mip_tables.py"""

import re

import numpy as np

SRC = "/root/reference/source/Lib/CommonLib/MipData.h"
DST = "vvdec_tpu/ops/tables_mip.npz"


def main() -> None:
    text = open(SRC).read()
    out = {}
    for name, shape in (("mipMatrix4x4", (16, 16, 4)),
                        ("mipMatrix8x8", (8, 16, 8)),
                        ("mipMatrix16x16", (6, 64, 7))):
        m = re.search(re.escape(name) + r"\[[\d\]\[]*\]\s*\)\s*=\s*(.*?);",
                      text, re.S)
        nums = [int(v) for v in re.findall(r"\d+", m.group(1))]
        arr = np.array(nums, dtype=np.uint8).reshape(shape)
        out["MIP" + name[9:]] = arr
        print(name, arr.shape, "sum", int(arr.sum(dtype=np.int64)))
    np.savez_compressed(DST, **out)
    print("wrote", DST)


if __name__ == "__main__":
    main()
