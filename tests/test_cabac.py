"""CABAC engine round-trip tests: encoder output must decode bit-exactly."""

import random

import pytest

from vvdec_tpu.cabac.engine import CabacDecoder, CabacEncoder, NUM_CTX


def roundtrip(ops, qp=32, init_id=2):
    """ops: list of ('ctx', bin, ctx_id) | ('ep', bin) | ('eps', value, n)
    | ('rem', value, rice, cutoff, maxlog2).  Terminates with trm(1)."""
    enc = CabacEncoder()
    enc.reset(qp, init_id)
    for op in ops:
        if op[0] == "ctx":
            enc.encode_bin(op[1], op[2])
        elif op[0] == "ep":
            enc.encode_bin_ep(op[1])
        elif op[0] == "eps":
            enc.encode_bins_ep(op[1], op[2])
        elif op[0] == "rem":
            enc.encode_rem_abs_ep(op[1], op[2], op[3], op[4])
        elif op[0] == "trm":
            enc.encode_bin_trm(op[1])
    data = enc.finish()
    # append stop bit + alignment like the slice writer does
    tail_val, tail_n = enc.tail_bits
    acc = (tail_val << 1) | 1
    nbits = tail_n + 1
    pad = (-nbits) % 8
    acc <<= pad
    nbits += pad
    data = data + acc.to_bytes(nbits // 8, "big")

    dec = CabacDecoder(data)
    dec.reset(qp, init_id)
    out = []
    for op in ops:
        if op[0] == "ctx":
            out.append(("ctx", dec.decode_bin(op[2]), op[2]))
        elif op[0] == "ep":
            out.append(("ep", dec.decode_bin_ep()))
        elif op[0] == "eps":
            out.append(("eps", dec.decode_bins_ep(op[2]), op[2]))
        elif op[0] == "rem":
            out.append(("rem", dec.decode_rem_abs_ep(op[2], op[3], op[4]),
                        op[2], op[3], op[4]))
        elif op[0] == "trm":
            out.append(("trm", dec.decode_bin_trm()))
    assert out == ops, "CABAC round-trip mismatch"
    assert dec.finish_ok(), "stop pattern check failed"


class TestCabacRoundTrip:
    def test_ctx_bins_simple(self):
        ops = [("ctx", b, 0) for b in (1, 0, 1, 1, 0, 0, 0, 1, 1, 1)]
        ops.append(("trm", 1))
        roundtrip(ops)

    def test_ep_bins(self):
        ops = [("ep", b) for b in (1, 0, 1, 1, 0, 1, 0, 0)]
        ops += [("eps", 0x2A, 6), ("eps", 0x155, 9), ("eps", 0, 4)]
        ops.append(("trm", 1))
        roundtrip(ops)

    @pytest.mark.parametrize("seed", range(8))
    def test_random_mix(self, seed):
        rnd = random.Random(seed)
        ops = []
        for _ in range(rnd.randrange(50, 800)):
            k = rnd.random()
            if k < 0.55:
                ops.append(("ctx", rnd.getrandbits(1), rnd.randrange(NUM_CTX)))
            elif k < 0.75:
                ops.append(("ep", rnd.getrandbits(1)))
            elif k < 0.9:
                n = rnd.randrange(1, 16)
                ops.append(("eps", rnd.getrandbits(n), n))
            else:
                rice = rnd.randrange(0, 4)
                val = rnd.randrange(0, 1 << rnd.randrange(1, 14))
                ops.append(("rem", val, rice, 5, 15))
        ops.append(("trm", 1))
        roundtrip(ops, qp=rnd.randrange(0, 64), init_id=rnd.randrange(3))

    def test_trm_zero_then_more(self):
        ops = []
        for i in range(20):
            ops.append(("ctx", i & 1, 5))
            ops.append(("trm", 0))
        ops.append(("trm", 1))
        roundtrip(ops)

    def test_skewed_contexts(self):
        # long runs of the same bin drive probabilities to extremes
        ops = [("ctx", 1, 7)] * 200 + [("ctx", 0, 7)] * 200 + [("trm", 1)]
        roundtrip(ops)

    @pytest.mark.parametrize("qp,init_id", [(0, 0), (63, 1), (22, 2), (51, 0)])
    def test_qp_inits(self, qp, init_id):
        rnd = random.Random(qp * 7 + init_id)
        ops = [("ctx", rnd.getrandbits(1), rnd.randrange(NUM_CTX)) for _ in range(300)]
        ops.append(("trm", 1))
        roundtrip(ops, qp=qp, init_id=init_id)


class TestRemAbs:
    @pytest.mark.parametrize("rice", [0, 1, 2, 3])
    def test_rem_abs_values(self, rice):
        for val in list(range(0, 40)) + [100, 500, 5000, 32767]:
            ops = [("rem", val, rice, 5, 15), ("trm", 1)]
            roundtrip(ops)
