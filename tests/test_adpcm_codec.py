"""IMA ADPCM codec (core/adpcm.py) — hand-packed vectors, round
trips, container integration, hostile-input discipline. The driver
row mm_adpcm_stats additionally pins the decoder against an
independent recursive-CTE SQL implementation of the state machine."""

import math
import struct

import pytest

from amazon_textract_enhancer_spark.core.adpcm import (
    decode_adpcm_data,
    decode_nibble,
    encode_adpcm_data,
    encode_nibble,
    encode_wav_adpcm,
)
from amazon_textract_enhancer_spark.core.wav import decode_wav


def test_hand_packed_block_vector():
    # nibbles [3, 11, 4, 15] from state (pred=0, idx=0), packed low
    # nibble first: bytes B3 F4. Expected samples worked through the
    # spec recurrence by hand with step(0)=7:
    #   n=3:  diff = 0+1+3 = 4 (step>>3 + step>>1·1 + step>>2·1),
    #         pred 0+4=4, idx clamp(0-1)=0
    #   n=11: sign bit set, magnitude 3 → diff 4, pred 4-4=0, idx 0
    #   n=4:  diff = 0+7 = 7, pred 7, idx 0+2=2 (step(2)=9)
    #   n=15: sign, magnitude 7 → diff 9>>3+9+4+2 = 16, pred -9
    block = struct.pack("<hBB", 0, 0, 0) + bytes([0xB3, 0xF4])
    assert decode_adpcm_data(block, len(block)) == [0, 4, 0, 7, -9]


def test_decode_nibble_matches_encode_nibble_lockstep():
    # encoder quantization followed by the shared state step must keep
    # reconstruction within one adaptive step of the target
    pred, idx = 0, 0
    for target in [100, 250, -400, 1200, -90, 0, 7000, -7000]:
        n = encode_nibble(pred, idx, target)
        new_pred, new_idx = decode_nibble(pred, idx, n)
        # moved toward the target (or stayed for tiny deltas)
        assert abs(new_pred - target) <= abs(pred - target) + 1
        pred, idx = new_pred, new_idx


def test_round_trip_snr_smooth_signal():
    n = 4000
    sam = [int(8000 * math.sin(2 * math.pi * i / 200)) for i in range(n)]
    data, ba = encode_adpcm_data(sam, samples_per_block=505)
    dec = decode_adpcm_data(data, ba)[:n]
    noise = sum((a - b) ** 2 for a, b in zip(sam, dec))
    signal = sum(a * a for a in sam)
    snr_db = 10 * math.log10(signal / max(noise, 1))
    assert snr_db > 25, f"ADPCM SNR {snr_db:.1f} dB too low"


def test_wav_container_round_trip_and_fact_truncation():
    sam = [((7 * i + 13) % 2048) - 1024 for i in range(777)]
    payload = encode_wav_adpcm(11025, sam, samples_per_block=101)
    sr, ch, dec = decode_wav(payload)
    assert (sr, ch) == (11025, 1)
    # fact chunk must truncate the final block's padding: exactly the
    # source length comes back, not a multiple of samples_per_block
    assert len(dec) == 777
    # every block's header sample is exact (it is stored verbatim)
    assert dec[0] == sam[0]
    assert dec[101] == max(-32768, min(32767, sam[101]))


def test_multi_block_state_reset():
    # each block restarts from its own header, so decoding blocks
    # independently equals decoding the stream
    sam = [((31 * i) % 3000) - 1500 for i in range(300)]
    data, ba = encode_adpcm_data(sam, samples_per_block=101)
    whole = decode_adpcm_data(data, ba)
    per_block = []
    for off in range(0, len(data), ba):
        per_block += decode_adpcm_data(data[off:off + ba], ba)
    assert whole == per_block


def test_hostile_payloads_raise_value_error():
    with pytest.raises(ValueError):  # step index > 88
        decode_adpcm_data(struct.pack("<hBB", 0, 89, 0) + b"\x00", 5)
    with pytest.raises(ValueError):  # partial trailing block
        decode_adpcm_data(b"\x00" * 7, 5)
    with pytest.raises(ValueError):  # block_align below header size
        decode_adpcm_data(b"\x00" * 4, 4)
    with pytest.raises(ValueError):  # fact count > stored samples
        decode_adpcm_data(struct.pack("<hBB", 0, 0, 0) + b"\x00",
                          5, n_samples=99)
    # stereo ADPCM is rejected at the container level
    payload = bytearray(encode_wav_adpcm(8000, [0] * 10))
    i = payload.index(b"fmt ") + 8
    payload[i + 2:i + 4] = struct.pack("<H", 2)  # channels := 2
    with pytest.raises(ValueError):
        decode_wav(bytes(payload))
    with pytest.raises(ValueError):  # encoder: even samples_per_block
        encode_adpcm_data([0, 1, 2], samples_per_block=4)
