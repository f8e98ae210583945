"""Bit writer, Exp-Golomb, NAL escaping and header syntax tests."""

import numpy as np

from h264lab_tpu.bitstream import BitWriter, escape_rbsp, unescape_rbsp
from h264lab_tpu.bitstream.nal import annexb_nal, split_annexb
from h264lab_tpu.bitstream import headers


def test_fixed_bits():
    bw = BitWriter()
    bw.u(3, 0b101)
    bw.u(5, 0b00111)
    assert bw.to_bytes() == bytes([0b10100111])


def test_exp_golomb_known_codes():
    # spec 9.1: codeNum 0..8 -> 1, 010, 011, 00100, 00101, 00110, 00111,
    # 0001000, 0001001
    bw = BitWriter()
    for v in range(4):
        bw.ue(v)
    # 1 010 011 00100 -> 1010 0110 0100 pad
    bw.byte_align()
    assert bw.to_bytes() == bytes([0b10100110, 0b01000000])


def test_signed_golomb():
    # se(v): 1->ue(1), -1->ue(2), 2->ue(3), -2->ue(4)
    bw = BitWriter()
    bw.se(1)
    bw.se(-1)
    assert bw.to_bits().tolist() == [0, 1, 0, 0, 1, 1]


def test_escape_rbsp():
    raw = b"\x00\x00\x00\x00\x01\x02\x00\x00\x02"
    esc = escape_rbsp(raw)
    assert b"\x00\x00\x00" not in esc
    assert b"\x00\x00\x01" not in esc
    assert b"\x00\x00\x02" not in esc
    assert unescape_rbsp(esc) == raw


def test_escape_roundtrip_random():
    rng = np.random.default_rng(0)
    for _ in range(20):
        raw = rng.integers(0, 4, size=200).astype(np.uint8).tobytes()
        assert unescape_rbsp(escape_rbsp(raw)) == raw


def test_annexb_split():
    n1 = annexb_nal(3, 7, b"\x42\x00\x0a")
    n2 = annexb_nal(3, 8, b"\xde\xad")
    units = split_annexb(n1 + n2)
    assert len(units) == 2
    assert units[0][0] == 0x67
    assert units[1][0] == 0x68


def test_sps_pps_sizes():
    p = headers.SpsParams(width=352, height=288, mb_width=22, mb_height=18)
    sps = headers.sps_nal(p)
    assert sps[:4] == b"\x00\x00\x00\x01"
    assert sps[4] == 0x67
    assert 8 <= len(sps) <= 32
    pps = headers.pps_nal(0, 0, 33)
    assert pps[4] == 0x68


def test_slice_header_emits():
    bw = BitWriter()
    p = headers.SliceHeaderParams(
        slice_type=headers.SLICE_TYPE_I, is_idr=True, frame_num=0,
        slice_qp=30, pic_init_qp=33)
    headers.write_slice_header_rbsp(bw, p)
    assert bw.bit_length > 10


def test_cropping_sps():
    p = headers.SpsParams(width=350, height=282, mb_width=22, mb_height=18)
    assert p.cropping
    sps = headers.sps_nal(p)
    assert len(sps) > 8
