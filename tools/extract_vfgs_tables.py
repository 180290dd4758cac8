#!/usr/bin/env python3
"""Extract the VFGS constant tables (Gaussian noise LUT, seed LUT) from the
reference FilmGrain.cpp into ops/tables_vfgs.npz.

These are fixed constants of the public VFGS film-grain hardware model
(InterDigital VersatileFilmGrain; RDD-5), analogous to the ROM tables
extracted by the other tools/extract_* scripts.
"""

import os
import re

import numpy as np

SRC = "/root/reference/source/Lib/FilmGrain/FilmGrain.cpp"
OUT = os.path.join(os.path.dirname(__file__), "..", "vvdec_tpu", "ops",
                   "tables_vfgs.npz")


def extract_array(text: str, name: str) -> list[int]:
    m = re.search(name + r"\s*\[\s*\d*\s*\]\s*=\s*\{(.*?)\};", text,
                  re.DOTALL)
    assert m, name
    vals = [int(v) for v in re.findall(r"-?\d+", m.group(1))]
    return vals


def main() -> None:
    text = open(SRC).read()
    gauss = extract_array(text, "Gaussian_LUT")
    assert len(gauss) == 2048, len(gauss)
    seed = extract_array(text, "Seed_LUT")
    assert len(seed) == 256, len(seed)
    np.savez(OUT,
             GAUSSIAN_LUT=np.asarray(gauss, dtype=np.int8),
             SEED_LUT=np.asarray(seed, dtype=np.uint32))
    print(f"wrote {OUT}: Gaussian_LUT[2048], Seed_LUT[256]")


if __name__ == "__main__":
    main()
